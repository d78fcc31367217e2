package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Deterministic on-disk locations for materialized derived artifacts
  * (ANN indexes, bucketed table copies): keyed by source dir + params
  * + a CONTENT stamp of the source dataset, so a regenerated corpus at
  * the same path rebuilds instead of silently serving a stale
  * artifact, while repeat queries over unchanged data reuse it. This
  * is the 100 TB shape — index/bucket builds are amortized, not
  * per-query work; on a real lakehouse the stamp is the table's
  * snapshot/commit id.
  */
object ArtifactCache {

  /** Cache path for `kind` derived from dataset `src` under `params`.
    *
    * The content stamp is computed over the LISTED DATA FILES (count +
    * total size + max mtime): a parquet dataset path can be a
    * directory, whose own size/mtime say nothing about content. A
    * missing/unreadable source is a CACHE MISS (unique stamp), never a
    * stable key that would reuse a stale artifact. Cold sibling
    * entries of the same kind (>24 h untouched) are pruned so
    * param/corpus churn cannot accumulate unbounded under tmpdir.
    */
  def path(kind: String, src: Path, params: String): String = {
    val stamp =
      try {
        val files: Seq[Path] =
          if (Files.isDirectory(src))
            Files.list(src).iterator.asScala.filter(Files.isRegularFile(_)).toSeq
          else if (Files.isRegularFile(src)) Seq(src)
          else Seq.empty
        if (files.isEmpty) s"miss-${java.util.UUID.randomUUID()}"
        else {
          val sizes = files.map(Files.size)
          val mtimes = files.map(Files.getLastModifiedTime(_).toMillis)
          s"${files.size}-${sizes.sum}-${mtimes.max}"
        }
      } catch { case _: java.io.IOException => s"miss-${java.util.UUID.randomUUID()}" }
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$src|$params|$stamp".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val root = Paths.get(s"${sys.props("java.io.tmpdir")}/graft-indexes")
    try {
      if (Files.isDirectory(root)) {
        val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
        Files.list(root).iterator.asScala
          .filter(p => p.getFileName.toString.startsWith(s"$kind-") &&
            !p.getFileName.toString.endsWith(digest) &&
            Files.getLastModifiedTime(p).toMillis < cutoff)
          .foreach(deleteRecursively)
      }
    } catch { case _: java.io.IOException => () }  // pruning is best-effort
    s"$root/$kind-$digest"
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p))
        Files.list(p).iterator.asScala.foreach(deleteRecursively)
      Files.deleteIfExists(p)
    } catch { case _: java.io.IOException => () }
  }
}
