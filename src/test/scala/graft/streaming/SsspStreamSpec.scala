package graft.streaming

import graft.SparkSpec
import graft.operators.GraphOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream ≡ batch parity for [[SsspStream]] against
  * `GraphOps.bellmanFord` (q292's batch operator): any split/order of
  * the weighted arc stream, folded through an id-keyed upsert, must
  * equal the batch distances bit-for-bit — the relaxation is pure
  * Long arithmetic, so there is no tolerance anywhere.
  */
class SsspStreamSpec extends SparkSpec {
  import SsspStream.{DistRow, WArc}

  private val SeedMod = 5L
  private val Rounds = 4

  private def upsert(rows: Seq[DistRow]): Map[Long, Long] =
    rows.foldLeft(Map.empty[Long, Long]) {
      case (acc, r) =>
        if (r.distQ == SsspStream.Tombstone) acc - r.id else acc + (r.id -> r.distQ)
    }

  private def batchDists(arcs: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    // min cost per directed arc — the stream's fold rule, applied here
    // so both sides relax the identical graph
    val dirW = arcs.toDF("src", "dst", "cost")
      .groupBy($"src", $"dst")
      .agg(org.apache.spark.sql.functions.min($"cost").as("cost"))
    val seeds = dirW.select(col("src").cast("long").as("v"))
      .distinct().filter(col("v") % lit(SeedMod) === 0)
    GraphOps.bellmanFord(dirW, seeds, rounds = Rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def drive(chunks: Seq[Seq[(Long, Long, Long)]],
      maxNodes: Int = 1 << 20): Seq[DistRow] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"sssp_out_${System.nanoTime()}"
    val mem = MemoryStream[WArc]
    val q = SsspStream.distanceAssignments(mem.toDS(), seedMod = SeedMod,
        rounds = Rounds, maxNodes = maxNodes)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk.map { case (s, d, c) => WArc(s, d, c) })
        q.processAllAvailable()
      }
      spark.table(name).as[DistRow].collect().toSeq
    } finally q.stop()
  }

  test("random weighted arcs over random splits ≡ batch bellmanFord, with " +
    "duplicated and cost-improving re-delivery") {
    val rnd = new scala.util.Random(41)
    val arcs = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong,
      (1 + rnd.nextInt(100)).toLong * 100L))
    // re-deliver a third verbatim (idempotent) and re-deliver a few
    // with LOWER costs (min-cost fold must re-relax)
    val cheaper = arcs.take(10).map { case (s, d, c) => (s, d, c / 2) }
    val all = arcs ++ arcs.take(arcs.size / 3) ++ cheaper
    var rest = all
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Long)]]
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(9)
      chunks += rest.take(n); rest = rest.drop(n)
    }
    assert(upsert(drive(chunks.toSeq)) === batchDists(arcs ++ cheaper))
  }

  test("replayed batch emits nothing") {
    val g = Seq((0L, 1L, 10L), (1L, 2L, 20L), (0L, 2L, 50L))
    assert(drive(Seq(g, g)) === drive(Seq(g)))
  }

  test("a cheaper arc arriving later shortens downstream distances") {
    val g1 = Seq((0L, 1L, 100L), (1L, 2L, 100L))
    val g2 = Seq((0L, 1L, 10L))
    val finalDists = upsert(drive(Seq(g1, g2)))
    assert(finalDists === batchDists(g1 ++ g2))
    assert(finalDists(2L) === 110L)
  }

  test("cap evicts whole LRU components; tombstones retract; survivors exact") {
    val c1 = Seq((0L, 1L, 10L), (1L, 2L, 10L))             // seed 0
    val c2 = Seq((10L, 11L, 10L), (11L, 12L, 10L))         // seed 10
    val rows = drive(Seq(c1, c2), maxNodes = 3)
    assert(upsert(rows) === batchDists(c2))
    assert(rows.exists(r => r.distQ == SsspStream.Tombstone &&
      Set(0L, 1L, 2L).contains(r.id)))
  }

  test("BFS layers (q238's unweighted shape): stream ≡ batch unit-cost " +
    "bellmanFord ≡ a hand-rolled layered BFS") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(61)
    val und = Seq.fill(50)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
    val arcs = (und ++ und.map(_.swap)).distinct
    // hand-rolled 4-round layered BFS from seeds (v % 5 == 0 among srcs)
    val adj = arcs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = adj.keySet.filter(_ % SeedMod == 0)
    var layer = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (r <- 1 to Rounds) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(layer.contains)
      layer = layer ++ next.map(_ -> r.toLong)
      frontier = next
    }
    val name = s"bfs_out_${System.nanoTime()}"
    val mem = MemoryStream[SsspStream.Arc]
    val q = SsspStream.bfsLayerAssignments(mem.toDS(), seedMod = SeedMod,
        rounds = Rounds)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.ProcessingTime(0)).start()
    val got = try {
      mem.addData(arcs.map { case (s, d) => SsspStream.Arc(s, d) })
      q.processAllAvailable()
      spark.table(name).as[DistRow].collect().toSeq
    } finally q.stop()
    assert(upsert(got) === layer)
    assert(upsert(got) === batchDists(arcs.map { case (s, d) => (s, d, 1L) }))
  }

  test("q292's exact shape: co-purchase costs, mod seeds — stream ≡ batch") {
    val rnd = new scala.util.Random(53)
    // weighted bidirectional arcs like q292's dirW (cost = 1e6 DIV w)
    val und = Seq.fill(60)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong,
      1000000L / (1 + rnd.nextInt(5))))
      .filter(e => e._1 != e._2)
    val arcs = und ++ und.map { case (a, b, c) => (b, a, c) }
    assert(upsert(drive(Seq(arcs))) === batchDists(arcs))
  }
}
