package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {

  test("plannedFiles: ceil division, floor of one") {
    assert(Compact.plannedFiles(100, 30) === 4)
    assert(Compact.plannedFiles(90, 30) === 3)
    assert(Compact.plannedFiles(1, 1000) === 1)
    assert(Compact.plannedFiles(0, 1000) === 1)
  }

  test("40 tiny files compact to few, rows and values intact") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-tiny").toString
    val dest = Files.createTempDirectory("graft-compacted").resolve("out").toString
    val df = (0 until 4000).map(i => (i.toLong, s"payload_$i")).toDF("id", "s")
    df.repartition(40).write.mode("overwrite").parquet(src)
    assert(spark.read.parquet(src).inputFiles.length === 40)

    val before = spark.read.parquet(src)
    val totalBytes = before.inputFiles.map(f =>
      Files.size(java.nio.file.Paths.get(new java.net.URI(f).getPath))).sum
    val nOut = Compact.compactDir(spark, src, dest, targetBytes = totalBytes / 4)
    assert(nOut <= 5, s"still $nOut files")

    val after = spark.read.parquet(dest)
    assert(after.count() === 4000)
    assert(after.agg(sum($"id")).head.getLong(0) ===
      before.agg(sum($"id")).head.getLong(0))
  }

  test("idempotent: a re-run reuses the marker, not a rewrite") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-tiny2").toString
    val dest = Files.createTempDirectory("graft-compacted2").resolve("out").toString
    (0 until 100).map(i => (i, i)).toDF("a", "b")
      .repartition(10).write.mode("overwrite").parquet(src)
    Compact.compactDir(spark, src, dest, targetBytes = Long.MaxValue)
    val stamp = Files.getLastModifiedTime(java.nio.file.Paths.get(dest, "_SUCCESS"))
    Compact.compactDir(spark, src, dest, targetBytes = Long.MaxValue)
    assert(Files.getLastModifiedTime(java.nio.file.Paths.get(dest, "_SUCCESS")) === stamp)
  }
}
