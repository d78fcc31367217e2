package graft.streaming

import graft.SparkSpec
import graft.operators.GraphOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream ≡ batch parity for [[CentralityStream]] against
  * `GraphOps.eigenvectorCentrality` (q319) and `GraphOps.hits` (q210):
  * any split/order of the edge stream, folded through an id-keyed
  * upsert, must converge BIT-FOR-BIT to the batch outputs — the
  * quantized integer sums make both recurrences order-free, so the
  * doubles are exactly reproducible, not approximately (the
  * PageRankStreamSpec discipline).
  */
class CentralityStreamSpec extends SparkSpec {
  import CentralityStream.{Arc, Edge, EigRow, HitsRow}

  // ---------- eigenvector ----------

  private def upsertEig(rows: Seq[EigRow]): Map[Long, Double] =
    rows.foldLeft(Map.empty[Long, Double]) {
      case (acc, r) => r.eig.fold(acc - r.id)(p => acc + (r.id -> p))
    }

  private def batchEig(edges: Seq[(Long, Long)]): Map[Long, Double] = {
    import spark.implicits._
    GraphOps.eigenvectorCentrality(edges.toDF("u", "v"), "u", "v", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  private def driveEig(chunks: Seq[Seq[(Long, Long)]],
      maxNodes: Int = 1 << 20): Seq[EigRow] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"eig_out_${System.nanoTime()}"
    val mem = MemoryStream[Edge]
    val q = CentralityStream.eigenAssignments(mem.toDS(), iterations = 4,
        maxNodes = maxNodes)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk.map { case (u, v) => Edge(u, v) })
        q.processAllAvailable()
      }
      spark.table(name).as[EigRow].collect().toSeq
    } finally q.stop()
  }

  test("eigenvector: cross-batch growth tracks the batch operator bit-for-bit") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val path = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    assert(upsertEig(driveEig(Seq(k4))) === batchEig(k4))
    assert(upsertEig(driveEig(Seq(k4, path))) === batchEig(k4 ++ path))
  }

  test("eigenvector: random splits with duplicated/self-loop delivery ≡ batch") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val clean = edges.filter(e => e._1 != e._2)
    val withNoise = edges ++ clean.take(clean.size / 3) // dups + self-loops
    var rest = withNoise
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(9)
      chunks += rest.take(n); rest = rest.drop(n)
    }
    assert(upsertEig(driveEig(chunks.toSeq)) === batchEig(clean))
  }

  test("eigenvector: replayed batch emits nothing") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(driveEig(Seq(tri, tri)) === driveEig(Seq(tri)))
  }

  test("eigenvector: cap evicts whole LRU components; tombstones retract; " +
    "survivors exact for the tracked graph") {
    val t1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val t2 = Seq((11L, 12L), (12L, 13L), (11L, 13L))
    val rows = driveEig(Seq(t1, t2), maxNodes = 3)
    val finalEigs = upsertEig(rows)
    val expected = batchEig(t2)
    assert(finalEigs === expected,
      "sink must hold exactly the tracked graph's batch eigs after eviction")
    assert(rows.exists(r => r.eig.isEmpty && Set(1L, 2L, 3L).contains(r.id)),
      "evicted previously-emitted ids must get None tombstone rows")
  }

  // ---------- Katz ----------

  private def upsertKatz(rows: Seq[CentralityStream.KatzRow]): Map[Long, Double] =
    rows.foldLeft(Map.empty[Long, Double]) {
      case (acc, r) => r.katz.fold(acc - r.id)(p => acc + (r.id -> p))
    }

  private def batchKatz(edges: Seq[(Long, Long)]): Map[Long, Double] = {
    import spark.implicits._
    GraphOps.katz(edges.toDF("u", "v"), "u", "v", iterations = 4, alpha = 0.01)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  private def driveKatz(chunks: Seq[Seq[(Long, Long)]],
      maxNodes: Int = 1 << 20): Seq[CentralityStream.KatzRow] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"katz_out_${System.nanoTime()}"
    val mem = MemoryStream[Edge]
    val q = CentralityStream.katzAssignments(mem.toDS(), iterations = 4,
        alpha = 0.01, maxNodes = maxNodes)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk.map { case (u, v) => Edge(u, v) })
        q.processAllAvailable()
      }
      spark.table(name).as[CentralityStream.KatzRow].collect().toSeq
    } finally q.stop()
  }

  test("katz: random splits with duplicated delivery ≡ batch bit-for-bit") {
    val rnd = new scala.util.Random(29)
    val edges = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val withDups = edges ++ edges.take(edges.size / 3)
    var rest = withDups
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(9)
      chunks += rest.take(n); rest = rest.drop(n)
    }
    assert(upsertKatz(driveKatz(chunks.toSeq)) === batchKatz(edges))
  }

  test("katz: replay emits nothing; cap evicts with tombstones; survivors exact") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(driveKatz(Seq(tri, tri)) === driveKatz(Seq(tri)))
    val t2 = Seq((11L, 12L), (12L, 13L), (11L, 13L))
    val rows = driveKatz(Seq(tri, t2), maxNodes = 3)
    assert(upsertKatz(rows) === batchKatz(t2))
    assert(rows.exists(r => r.katz.isEmpty && Set(1L, 2L, 3L).contains(r.id)))
  }

  // ---------- HITS ----------

  private def upsertHits(rows: Seq[HitsRow]): Map[(String, Long), Double] =
    rows.foldLeft(Map.empty[(String, Long), Double]) {
      case (acc, r) =>
        r.v.fold(acc - ((r.side, r.id)))(p => acc + ((r.side, r.id) -> p))
    }

  private def batchHits(arcs: Seq[(Long, Long)]): Map[(String, Long), Double] = {
    import spark.implicits._
    GraphOps.hits(arcs.toDF("src", "dst"), "src", "dst", iterations = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  private def driveHits(chunks: Seq[Seq[(Long, Long)]],
      maxNodes: Int = 1 << 20): Seq[HitsRow] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"hits_out_${System.nanoTime()}"
    val mem = MemoryStream[Arc]
    val q = CentralityStream.hitsAssignments(mem.toDS(), iterations = 5,
        maxNodes = maxNodes)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk.map { case (s, d) => Arc(s, d) })
        q.processAllAvailable()
      }
      spark.table(name).as[HitsRow].collect().toSeq
    } finally q.stop()
  }

  test("hits: cross-batch growth tracks the batch operator bit-for-bit " +
    "(directed, self-loop kept)") {
    val g1 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 3L)) // incl. self-loop
    val g2 = Seq((4L, 2L), (3L, 4L))
    assert(upsertHits(driveHits(Seq(g1))) === batchHits(g1))
    assert(upsertHits(driveHits(Seq(g1, g2))) === batchHits(g1 ++ g2))
  }

  test("hits: random splits with duplicated delivery ≡ batch") {
    val rnd = new scala.util.Random(47)
    val arcs = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val withDups = arcs ++ arcs.take(arcs.size / 3)
    var rest = withDups
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(9)
      chunks += rest.take(n); rest = rest.drop(n)
    }
    assert(upsertHits(driveHits(chunks.toSeq)) === batchHits(arcs))
  }

  test("hits: replayed batch emits nothing") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(driveHits(Seq(g, g)) === driveHits(Seq(g)))
  }

  test("hits: cap evicts whole LRU components; tombstones retract both sides; " +
    "survivors exact for the tracked graph") {
    val c1 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val c2 = Seq((11L, 12L), (12L, 13L), (13L, 11L))
    val rows = driveHits(Seq(c1, c2), maxNodes = 3)
    val finalVals = upsertHits(rows)
    val expected = batchHits(c2)
    assert(finalVals === expected,
      "sink must hold exactly the tracked graph's batch hubs/auths after eviction")
    assert(rows.exists(r => r.v.isEmpty && r.side == "hub" &&
      Set(1L, 2L, 3L).contains(r.id)))
    assert(rows.exists(r => r.v.isEmpty && r.side == "auth" &&
      Set(1L, 2L, 3L).contains(r.id)))
  }
}
