package graft.streaming

import graft.SparkSpec
import graft.operators.GraphOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream ≡ batch parity for [[PageRankStream]] against
  * `GraphOps.pageRank` (the q99 batch operator): any split/order of
  * the edge stream, folded through an id-keyed upsert, must converge
  * BIT-FOR-BIT to the batch ranks — the quantized integer contribution
  * sums make the recurrence order-free, so the doubles are exactly
  * reproducible, not approximately.
  */
class PageRankStreamSpec extends SparkSpec {
  import PageRankStream.{Edge, RankRow}

  /** The id-keyed upsert sink contract: `pr = None` is a type-visible
    * tombstone — the row is dropped, so evicted nodes never linger as
    * stale ranks. */
  private def upsert(rows: Seq[RankRow]): Map[Long, Double] =
    rows.foldLeft(Map.empty[Long, Double]) {
      case (acc, r) => r.pr.fold(acc - r.id)(p => acc + (r.id -> p))
    }

  private def batchRanks(edges: Seq[(Long, Long)]): Map[Long, Double] = {
    import spark.implicits._
    GraphOps.pageRank(edges.toDF("u", "v"), "u", "v", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  private def drive(chunks: Seq[Seq[(Long, Long)]],
      maxNodes: Int = 1 << 20): Seq[RankRow] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"pr_out_${System.nanoTime()}"
    val mem = MemoryStream[Edge]
    val q = PageRankStream.rankAssignments(mem.toDS(), iterations = 5,
        maxNodes = maxNodes)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk.map { case (u, v) => Edge(u, v) })
        q.processAllAvailable()
      }
      spark.table(name).as[RankRow].collect().toSeq
    } finally q.stop()
  }

  test("cross-batch growth: ranks track the batch operator bit-for-bit " +
    "at every stage") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val path = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    assert(upsert(drive(Seq(k4))) === batchRanks(k4))
    assert(upsert(drive(Seq(k4, path))) === batchRanks(k4 ++ path))
    assert(upsert(drive(Seq(k4, path, Seq((7L, 1L))))) ===
      batchRanks(k4 ++ path :+ (7L, 1L)))
  }

  test("random edge stream over random batch splits ≡ batch pageRank, " +
    "with duplicated delivery") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(150)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2)
    val withDups = edges ++ edges.take(edges.size / 3)
    var rest = withDups
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(9)
      chunks += rest.take(n); rest = rest.drop(n)
    }
    assert(upsert(drive(chunks.toSeq)) === batchRanks(edges))
  }

  test("replayed batch emits nothing: unchanged doubles reproduce " +
    "identically, so the delta set is empty") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val first = drive(Seq(tri))
    val replayed = drive(Seq(tri, tri))
    assert(replayed === first,
      "second delivery of the same edges must add zero emissions")
  }

  test("batch Dataset works through the same call (state starts empty, one pass)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val got = PageRankStream.rankAssignments(
        edges.map { case (u, v) => Edge(u, v) }.toDS(), iterations = 5)
      .collect().map(r => r.id -> r.pr.get).toMap
    assert(got === batchRanks(edges))
  }

  test("cap evicts whole least-recently-touched components; retained " +
    "ranks stay exact for the tracked graph") {
    // two disjoint triangles; the second arrives later; cap of 3
    // nodes forces the first (older) triangle out — remaining ranks
    // must equal batch pageRank over ONLY the second triangle
    val t1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val t2 = Seq((11L, 12L), (12L, 13L), (11L, 13L))
    val rows = drive(Seq(t1, t2, Seq((11L, 12L))), maxNodes = 3)
    val finalRanks = upsert(rows)
    val expected = batchRanks(t2)
    expected.foreach { case (id, p) =>
      assert(finalRanks.get(id).contains(p), s"node $id drifted after eviction")
    }
    // tombstones retracted every evicted id: after the upsert fold the
    // sink holds EXACTLY the tracked graph — no stale rows for 1/2/3
    assert(finalRanks.keySet === expected.keySet,
      "sink must hold only the tracked graph's nodes after eviction")
    assert(rows.exists(r => r.pr.isEmpty && Set(1L, 2L, 3L).contains(r.id)),
      "evicted previously-emitted ids must get None tombstone rows")
  }

  test("eviction batch emits ranks computed over the SURVIVING graph " +
    "(evict-before-recurrence): exact for the tracked graph immediately") {
    val t1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val t2 = Seq((11L, 12L), (12L, 13L), (11L, 13L))
    // no third batch: the eviction batch itself must already hold
    // batch(t2), not ranks diluted by the evicted component's n
    val finalRanks = upsert(drive(Seq(t1, t2), maxNodes = 3))
    assert(finalRanks === batchRanks(t2))
  }
}
