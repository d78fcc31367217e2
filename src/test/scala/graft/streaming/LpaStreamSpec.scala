package graft.streaming

import graft.SparkSpec
import graft.operators.GraphOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming LPA communities (streaming.LpaStream): stream ≡ batch
  * `GraphOps.labelPropagation` bit-for-bit at every growth stage
  * (pure integer recurrence — no quantization argument needed),
  * idempotent re-delivery, whole-component LRU eviction with
  * type-visible None tombstones, and the evict-before-recurrence
  * guarantee — the PageRankStream spec contract applied to q198's
  * community detection.
  */
class LpaStreamSpec extends SparkSpec {
  import LpaStream.{Edge, LabelRow}

  /** The id-keyed upsert sink contract: `community = None` is a
    * type-visible tombstone — the row is dropped. */
  private def upsert(rows: Seq[LabelRow]): Map[Long, Long] =
    rows.foldLeft(Map.empty[Long, Long]) {
      case (acc, r) => r.community.fold(acc - r.id)(l => acc + (r.id -> l))
    }

  private def batchLpa(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.labelPropagation(edges.toDF("u", "v"), "u", "v", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def drive(chunks: Seq[Seq[(Long, Long)]],
      maxNodes: Int = 1 << 20): Seq[LabelRow] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"lpa_out_${System.nanoTime()}"
    val mem = MemoryStream[Edge]
    val q = LpaStream.communityAssignments(mem.toDS(), iterations = 3,
        maxNodes = maxNodes)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk.map { case (u, v) => Edge(u, v) })
        q.processAllAvailable()
      }
      spark.table(name).as[LabelRow].collect().toSeq
    } finally q.stop()
  }

  test("cross-batch growth: communities track the batch operator " +
    "bit-for-bit at every stage") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val path = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    assert(upsert(drive(Seq(k4))) === batchLpa(k4))
    assert(upsert(drive(Seq(k4, path))) === batchLpa(k4 ++ path))
    assert(upsert(drive(Seq(k4, path, Seq((7L, 1L))))) ===
      batchLpa(k4 ++ path :+ (7L, 1L)))
  }

  test("random edge stream over random batch splits ≡ batch LPA, " +
    "with duplicated delivery and self-loops dropped") {
    val rnd = new scala.util.Random(47)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val clean = edges.filter(e => e._1 != e._2)
    val withDups = edges ++ edges.take(edges.size / 3)
    var rest = withDups
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(9)
      chunks += rest.take(n); rest = rest.drop(n)
    }
    assert(upsert(drive(chunks.toSeq)) === batchLpa(clean))
  }

  test("replayed batch emits nothing: unchanged labels produce an " +
    "empty delta set") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val first = drive(Seq(tri))
    val replayed = drive(Seq(tri, tri))
    assert(replayed === first,
      "second delivery of the same edges must add zero emissions")
  }

  test("batch Dataset works through the same call (state starts empty, one pass)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val got = LpaStream.communityAssignments(
        edges.map { case (u, v) => Edge(u, v) }.toDS(), iterations = 3)
      .collect().map(r => r.id -> r.community.get).toMap
    assert(got === batchLpa(edges))
  }

  test("cap evicts whole least-recently-touched components with None " +
    "tombstones; retained labels stay exact (evict-before-recurrence)") {
    val t1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val t2 = Seq((11L, 12L), (12L, 13L), (11L, 13L))
    // no third batch: the eviction batch itself must already hold
    // batch(t2) — labels computed over the SURVIVING graph only
    val rows = drive(Seq(t1, t2), maxNodes = 3)
    val finalLabels = upsert(rows)
    val expected = batchLpa(t2)
    assert(finalLabels === expected,
      "sink must hold exactly the tracked graph's communities after eviction")
    assert(rows.exists(r => r.community.isEmpty && Set(1L, 2L, 3L).contains(r.id)),
      "evicted previously-emitted ids must get None tombstone rows")
  }
}
