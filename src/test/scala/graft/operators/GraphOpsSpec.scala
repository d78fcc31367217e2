package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  private def stats(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = GraphOps.triangleStats(edges.toDF("u", "v"), "u", "v").head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("a 4-clique has 4 triangles and clustering 1") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(stats(k4) === ((4L, 6L, 4L, 1.0)))
  }

  test("a path has none; closing it makes exactly one") {
    assert(stats(Seq((1L, 2L), (2L, 3L)))._3 === 0L)
    assert(stats(Seq((1L, 2L), (2L, 3L), (1L, 3L)))._3 === 1L)
  }

  test("orientation dedups reversed/duplicate edges and drops self-loops") {
    // same triangle given with mixed directions, a repeat, and a loop
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 3L))
    val (n, e, t, _) = stats(messy)
    assert((n, e, t) === ((3L, 3L, 1L)))
  }

  test("empty graph reports zeros, not nulls") {
    assert(stats(Seq.empty) === ((0L, 0L, 0L, 0.0)))
  }

  test("degree orientation collapses hub wedge candidates (skewed graph)") {
    import spark.implicits._
    // mid-id hub 500 joined to 0..999 (so ids straddle it), plus rim
    // edges closing 100 triangles through the hub
    val star = (0L until 1000L).filter(_ != 500L).map(v => (500L, v))
    val rim = (0L until 100L).map(i => (2 * i, 2 * i + 1))
    val edges = (star ++ rim).toDF("u", "v")

    def wedgeCandidates(dirE: org.apache.spark.sql.DataFrame): Long =
      dirE.as("e1").join(dirE.as("e2"), col("e1.w") === col("e2.u")).count()

    // id orientation: the hub keeps in- AND out-edges → in×out ≈ deg²/4
    val byId = GraphOps.orient(edges, "u", "v")
      .select(col("a").as("u"), col("b").as("w"))
    // degree orientation: every hub edge points INTO it → no hub wedge
    val byDeg = GraphOps.orientByDegree(edges, "u", "v")
    val (cid, cdeg) = (wedgeCandidates(byId), wedgeCandidates(byDeg))
    assert(cid > 100000L, s"skew fixture lost its hub blowup (id-oriented: $cid)")
    assert(cdeg < cid / 100, s"degree orientation: $cdeg vs id: $cid")

    // and the count itself is unchanged by the orientation swap
    val t = GraphOps.triangleStats(edges, "u", "v").head.getLong(2)
    assert(t === 100L)
  }

  test("pageRank: ranks sum to 1 and order follows centrality") {
    import spark.implicits._
    // star graph: hub 1 connected to 2..6, plus a detached edge 7–8
    val edges = ((2L to 6L).map(v => (1L, v)) :+ (7L, 8L)).toDF("u", "v")
    val pr = GraphOps.pageRank(edges, "u", "v", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)       // conserved mass
    assert(pr(1L) > pr(2L), "hub outranks leaves")
    assert((2L to 6L).map(pr).distinct.size === 1, "leaves tie by symmetry")
    assert(math.abs(pr(7L) - pr(8L)) < 1e-15, "detached pair ties")
    assert(pr(1L) > pr(7L))
  }

  test("pageRank matches a driver-side replay of the quantized recurrence bit-for-bit") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L), (5L, 6L))
    val got = GraphOps.pageRank(und.toDF("u", "v"), "u", "v", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // replay the EXACT op sequence (floor(c·2^40) per edge, exact long
    // sum, /2^40, (1−d)/n + d·mass) in plain Scala — === below is
    // bit-equality on doubles, proving the RDD loop didn't change the
    // arithmetic the q99 oracle replays
    val dir = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = dir.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val n = deg.size
    val Q = 1099511627776L
    val base = (1.0 - 0.85) / n
    var pr = deg.map { case (v, _) => v -> 1.0 / n }
    for (_ <- 1 to 5) {
      val mass = dir.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => math.floor(pr(s) / deg(s) * Q).toLong }.sum }
      pr = deg.map { case (v, _) =>
        v -> (base + 0.85 * (mass.getOrElse(v, 0L).toDouble / Q)) }
    }
    assert(got.size === pr.size)
    pr.foreach { case (v, p) => assert(got(v) === p, s"node $v") }
  }

  test("pageRank per-iteration shuffle is node-sized, never edge-sized (scale pin)") {
    // Guard against the regression this rewrite removed (per-iteration
    // node-sized broadcast / edge reshuffle) with an EXECUTION-level
    // measurement — the returned frame is a bare RDD scan, so plan
    // inspection is blind here. pageRank is eager, so a listener
    // around the call captures all its jobs. Fixture: dense graph
    // (200 nodes, ~10k edges, 50× more edge rows than nodes) —
    // if iterations re-shuffled edges, 9 extra iterations would add
    // ≥ 9 edge-sized shuffles ≈ 10× the 1-iteration volume; node-
    // sized per-iteration traffic adds only a few percent each.
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val edges = Seq.fill(10000)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(p => p._1 != p._2).toDF("u", "v")
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val tasksSeen = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasksSeen.incrementAndGet()
        val m = te.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    // listener delivery is async: barrier with a one-task no-op job
    // and wait for its task-end (the Bench.settleListener pattern)
    def settle(): Unit = {
      val before = tasksSeen.get()
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 5_000_000_000L
      while (tasksSeen.get() <= before && System.nanoTime() < deadline)
        Thread.sleep(10)
    }
    def measure(iters: Int): Long = {
      spark.sparkContext.addSparkListener(listener)
      try {
        settle()
        bytes.set(0)
        GraphOps.pageRank(edges, "u", "v", iterations = iters)
        settle()
        bytes.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val one = measure(1)
    val ten = measure(10)
    assert(one > 0, "listener captured nothing — measurement broken")
    assert(ten < one * 3,
      s"9 extra iterations grew shuffle $one -> $ten bytes: per-iteration " +
        "traffic is edge-scale, the co-partitioned loop regressed")
  }

  test("pageRank on a cycle is uniform") {
    import spark.implicits._
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    val pr = GraphOps.pageRank(cyc, "u", "v", iterations = 3)
      .collect().map(_.getDouble(1))
    assert(pr.forall(p => math.abs(p - 0.25) < 1e-12))
  }

  test("labelPropagation: two bridged cliques resolve to two communities") {
    import spark.implicits._
    // K4 on {1..4} and K4 on {11..14}, one bridge 4–11: LPA must keep
    // the cliques in separate communities labeled by a member id
    def k4(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (k4(1L to 4L) ++ k4(11L to 14L) :+ (4L, 11L)).toDF("u", "v")
    val got = GraphOps.labelPropagation(edges, "u", "v", iterations = 3)
      .as[(Long, Long)].collect().toMap
    val left = (1L to 4L).map(got)
    val right = (11L to 14L).map(got)
    assert(left.distinct.size === 1, s"left clique split: $got")
    assert(right.distinct.size === 1, s"right clique split: $got")
    assert(left.head !== right.head, s"cliques merged: $got")
  }

  test("labelPropagation is layout invariant and tie-break deterministic") {
    import spark.implicits._
    // an even cycle is the adversarial case (synchronous LPA can
    // 2-cycle); fixed iterations + min-label tie-break must still be
    // a pure function of the graph across partition layouts
    val cyc = (0L until 8L).map(i => (i, (i + 1) % 8)).toDF("u", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphOps.labelPropagation(df, "u", "v", iterations = 3)
        .as[(Long, Long)].collect().toSeq.sorted
    assert(run(cyc.repartition(1)) === run(cyc.repartition(7)))
  }

  test("labelPropagation convergence diagnostic: q198's fixture graph settles in 3 rounds") {
    import spark.implicits._
    // q198 runs a FIXED 3 rounds for unrolled-CTE replayability;
    // synchronous LPA can 2-cycle, so community quality must be
    // measured, not assumed: run a 4th round and count labels still
    // moving. On the sf0.001 co-purchase fixture the labels have
    // settled (0 changes) — if the driver regenerates a fixture where
    // they oscillate, this reports the fraction instead of silently
    // shipping unconverged communities.
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_partkey")
    val e = GraphOps.coOccurrencePairs(li, "l_orderkey", "l_partkey")
      .localCheckpoint(true)
    val l3 = GraphOps.labelPropagation(e, "pa", "pb", iterations = 3)
    val l4 = GraphOps.labelPropagation(e, "pa", "pb", iterations = 4)
    val n = l3.count()
    val changed = l3.as("a")
      .join(l4.as("b"), $"a.id" === $"b.id")
      .filter($"a.community" =!= $"b.community").count()
    info(s"labels still changing after round 3: $changed of $n")
    assert(changed === 0L,
      s"q198's 3-round LPA has not converged: $changed/$n labels still moving")
  }

  test("kCore: pendant chain peels away, clique survives with in-core degrees") {
    import spark.implicits._
    // K4 on {1..4} with a chain 4–5–6–7 hanging off: the 2-core is
    // exactly the clique (the chain peels end-first over 3 rounds),
    // and each survivor reports its degree INSIDE the core (3, not
    // 4's raw degree 4)
    def k4(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (k4(1L to 4L) ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))).toDF("u", "v")
    val got = GraphOps.kCore(edges, "u", "v", k = 2, rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore peel is idempotent at fixpoint: extra rounds change nothing") {
    import spark.implicits._
    def k4(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (k4(1L to 4L) ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    def run(r: Int) = GraphOps.kCore(edges, "u", "v", k = 2, rounds = r)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(run(3) === run(12))   // the oracle-unroll-margin contract
  }

  test("kCore k=1 drops nothing on a connected graph; large k empties it") {
    import spark.implicits._
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(GraphOps.kCore(tri, "u", "v", k = 1, rounds = 4).count() === 3)
    assert(GraphOps.kCore(tri, "u", "v", k = 3, rounds = 4).count() === 0)
  }

  test("corenessSpectrum: nested seeded peels equal independent kCore " +
    "per k at fixpoint") {
    import spark.implicits._
    // K5 on {1..5} (4-core) with a triangle 5-6-7 grafted on (2-core
    // members) and a pendant 7-8: degeneracy layers at k=2,3,4 differ,
    // so the nesting actually exercises the seeding
    def kn(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (kn(1L to 5L) ++ Seq((5L, 6L), (6L, 7L), (5L, 7L), (7L, 8L)))
      .toDF("u", "v")
    val spectrum = GraphOps.corenessSpectrum(edges, "u", "v", 1, 5, rounds = 8)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val independent = (1 to 5).flatMap { k =>
      GraphOps.kCore(edges, "u", "v", k, rounds = 8)
        .as[(Long, Long)].collect().toSeq
        .map { case (id, deg) => (k.toLong, id, deg) }
    }.sorted
    assert(spectrum === independent)
    // and the k=5 layer is empty (K5 max core is 4)
    assert(!spectrum.exists(_._1 == 5L))
  }

  test("katz: one iteration on a path gives 1 + alpha*deg exactly") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val got = GraphOps.katz(path, "u", "v", iterations = 1, alpha = 0.5)
      .as[(Long, Double)].collect().toMap
    // x0 = 1 everywhere; deg(2) = 2, deg(1) = deg(3) = 1; the 2^-40
    // quantization is exact on x = 1.0
    assert(got === Map(1L -> 1.5, 2L -> 2.0, 3L -> 1.5))
  }

  test("personalizedPageRank: mass stays seed-local and sums near 1") {
    import spark.implicits._
    // two disjoint triangles; seeds only in the first — the second
    // component must receive ZERO rows (the sparsity contract)
    val t1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val t2 = Seq((11L, 12L), (12L, 13L), (11L, 13L))
    val seeds = Seq(1L).toDF("v")
    val got = GraphOps.personalizedPageRank(
        (t1 ++ t2).toDF("u", "v"), "u", "v", seeds, iterations = 4)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(math.abs(got.values.sum - 1.0) < 1e-6, s"got $got")
    assert(got(1L) > got(2L) && got(2L) === got(3L))
  }

  test("bellmanFord: weighted distances with hop bound; extra rounds " +
    "are a fixpoint no-op") {
    import spark.implicits._
    // directed path 1->2 (5), 2->3 (7), plus a shortcut 1->3 (20):
    // dist(3) must take the 12 path, not the 20 edge
    val w = Seq((1L, 2L, 5L), (2L, 3L, 7L), (1L, 3L, 20L))
      .toDF("src", "dst", "cost")
    val seeds = Seq(1L).toDF("v")
    def run(r: Int) = GraphOps.bellmanFord(w, seeds, rounds = r)
      .as[(Long, Long)].collect().toMap
    assert(run(2) === Map(1L -> 0L, 2L -> 5L, 3L -> 12L))
    assert(run(6) === run(2))
    // hop bound honesty: one round can't see the 2-edge path yet
    assert(run(1) === Map(1L -> 0L, 2L -> 5L, 3L -> 20L))
  }

  test("hits: star graph concentrates authority on the hub's targets") {
    import spark.implicits._
    // one hub 1 → {10, 11, 12}, a second hub 2 → {10}: authority of
    // 10 must strictly exceed 11/12 (two endorsers vs one), and hubs
    // normalize to L1 = 1 per side
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L)).toDF("s", "t")
    val got = GraphOps.hits(e, "s", "t", iterations = 3)
      .as[(String, Long, Double)].collect()
    val auth = got.filter(_._1 == "auth").map(r => r._2 -> r._3).toMap
    val hub = got.filter(_._1 == "hub").map(r => r._2 -> r._3).toMap
    assert(auth(10L) > auth(11L) && auth(11L) === auth(12L))
    assert(hub(1L) > hub(2L))   // endorses three vs one
    assert(math.abs(auth.values.sum - 1.0) < 1e-9)
    assert(math.abs(hub.values.sum - 1.0) < 1e-9)
  }

  test("hits is layout invariant (quantized order-free sums)") {
    import spark.implicits._
    val e = (for { s <- 1L to 5L; t <- 10L to (10L + s) } yield (s, t)).toDF("s", "t")
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphOps.hits(df, "s", "t", iterations = 3)
        .as[(String, Long, Double)].collect().toSeq.sorted
    assert(run(e.repartition(1)) === run(e.repartition(13)))
  }

  test("truncatedBetweenness: path graph accumulates 3e6/2e6/1e6") {
    import spark.implicits._
    // 0-1-2-3-4 with seed 0 (mod rule): δ(3)=1e6, δ(2)=2e6, δ(1)=3e6
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("pa", "pb")
    val out = GraphOps.truncatedBetweenness(e, "pa", "pb")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3000000L), (2L, 2000000L), (3L, 1000000L)),
      s"got $out")
  }

  test("truncatedBetweenness: diamond splits dependency by path count") {
    import spark.implicits._
    // 0→{1,2}→3: σ(3)=2, so each middle node carries fdiv(1e6,2)
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)).toDF("pa", "pb")
    val out = GraphOps.truncatedBetweenness(e, "pa", "pb")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 500000L), (2L, 500000L)), s"got $out")
  }

  test("truncatedBetweenness is layout invariant") {
    import spark.implicits._
    val e = (for { s <- 0L to 6L; t <- (s + 1) to 6L if (s + t) % 3 != 0 }
      yield (s * 97L, t * 97L)).toDF("pa", "pb")
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphOps.truncatedBetweenness(df, "pa", "pb")
        .as[(Long, Long)].collect().toSeq
    assert(run(e.repartition(1)) === run(e.repartition(13)))
  }
}
