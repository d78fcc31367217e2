package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph statistics over an edge list — the analytics a near-dup
  * graph gets queried for once components exist: triangle count and
  * the global clustering coefficient ("are duplicates cliquey or
  * chained?" — cliques mean template families, chains mean drifting
  * near-copies, and the two need different curation responses).
  *
  * Triangles via the DEGREE-ORIENTED edge join (each undirected edge
  * directed from its lower-(degree, id) endpoint): a triangle
  * {x≺y≺z} is counted exactly once as the path x→y→z closed by
  * x→z — no ×6 overcount, no post-dedup. Scale shape: two equi-joins
  * on node keys; the orientation caps every out-degree at O(√m), so
  * wedge candidates stay O(m^1.5) on ANY degree distribution — a
  * power-law hub never pivots a wedge (see orientByDegree).
  */
object GraphOps {

  /** Oriented co-occurrence pairs: one row per (pa < pb) item pair
    * sharing a group value — the basket/co-purchase edge builder
    * shared by PageRank (q99) and association rules (q111). The
    * strict `<` both orients the pair and drops self-pairs; pass a
    * DISTINCT (group, item) frame when multiplicity must not inflate
    * pair counts. One row PER co-occurrence — `.distinct()` or a
    * count aggregate downstream chooses multigraph vs simple-graph
    * semantics.
    */
  def coOccurrencePairs(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    df.as("a").join(df.as("b"),
        col(s"a.$groupCol") === col(s"b.$groupCol") &&
          col(s"a.$itemCol") < col(s"b.$itemCol"))
      .select(col(s"a.$itemCol").as("pa"), col(s"b.$itemCol").as("pb"))

  /** Undirected edges normalized to one row per edge, endpoints
    * ordered (a < b), self-loops dropped.
    */
  def orient(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()

  /** Undirected degrees of the ORIENTED edge frame (one row per edge,
    * endpoints in `a`/`b`). */
  private def degrees(oriented: DataFrame): DataFrame =
    oriented.select(col("a").as("v")).unionAll(oriented.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))

  /** Each undirected edge directed from its LOWER-(degree, id)
    * endpoint (u → w): the Chiba–Nishizeki / Latapy orientation. The
    * out-degree of every vertex is then O(√m), so the wedge-candidate
    * volume Σ_v d_in(v)·d_out(v) of the triangle join is O(m^1.5)
    * REGARDLESS of degree skew — a hub's edges all point INTO it
    * (its neighbors have lower degree), so no wedge ever pivots on
    * the hub. Orientation by id alone leaves a mid-id hub with in×out
    * ≈ deg²/4 candidates (measured in GraphOpsSpec). Triangle
    * {x≺y≺z} under the (degree, id) total order appears exactly once
    * as x→y, y→z closed by x→z — same single-count contract as the
    * id orientation, so q77's output is invariant.
    */
  def orientByDegree(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = orient(edges, srcCol, dstCol)
    val deg = degrees(e)
    val sa = struct(col("da").as("d"), col("a").as("n"))
    val sb = struct(col("db").as("d"), col("b").as("n"))
    e.join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        least(sa, sb).getField("n").as("u"),
        greatest(sa, sb).getField("n").as("w"))
  }

  /** One row: (n_nodes, n_edges, n_triangles, global_clustering).
    * Global clustering = 3·triangles / wedges, where wedges =
    * Σ deg·(deg−1)/2 over undirected degrees; 0 when the graph has no
    * wedge at all.
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // reused by the degree pass, the degree-orientation joins, and the
    // edge count; storage released by the caller's clearCache — the
    // caller-owned cache-release contract documented once in
    // ARCHITECTURE.md ("Scale design" §), shared with
    // ImageDedup.nearDupPairs
    val e = orient(edges, srcCol, dstCol).cache()
    val deg = degrees(e)
    val sa = struct(col("da").as("d"), col("a").as("n"))
    val sb = struct(col("db").as("d"), col("b").as("n"))
    val dirE = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        least(sa, sb).getField("n").as("u"),
        greatest(sa, sb).getField("n").as("w"))
      .cache()                      // three self-join sides
    val tri = dirE.as("e1")
      .join(dirE.as("e2"), col("e1.w") === col("e2.u"))
      .join(dirE.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.w") === col("e3.w"))
      .select(count(lit(1)).as("n_triangles"))
    // coalesce: SUM over zero rows is NULL, and NULL n_wedges would
    // slip past the ===0 guard below into a NULL clustering — the
    // empty graph must report the documented 0.0
    val wedge = deg.select(
      count(lit(1)).as("n_nodes"),
      coalesce((sum(col("d") * (col("d") - 1)) / 2).cast("long"), lit(0L))
        .as("n_wedges"))
    val nEdges = e.select(count(lit(1)).as("n_edges"))
    val out = nEdges.crossJoin(wedge).crossJoin(tri)
      .select(
        col("n_nodes"), col("n_edges"), col("n_triangles"),
        graft.functions.TextFunctions.r4(
          when(col("n_wedges") === 0, lit(0.0))
            .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges")))
          .as("global_clustering"))
    out
  }

  /** PageRank over an UNDIRECTED edge list (each edge used in both
    * directions), fixed `iterations` of the power method with
    * damping `d`:  pr(v) ← (1−d)/N + d·Σ_{u∈N(v)} pr(u)/deg(u).
    * Nodes are the edge endpoints (isolated nodes don't participate);
    * a symmetric graph has no dangling mass, so no residual
    * redistribution term is needed. Fixed iteration count (not
    * convergence-tested) keeps the result exactly reproducible by any
    * other engine running the same recurrence.
    *
    * Scale shape — a CO-PARTITIONED RDD loop, the genuine per-
    * partition imperative case (like Bpe.train): the directed edge
    * list is hash-partitioned by `src` ONCE and persisted; ranks and
    * degrees live under the SAME partitioner, so the per-iteration
    * rank-by-degree join and the edge-contribution join are both
    * zero-shuffle (co-partitioned narrow joins). The only recurring
    * shuffle is the contribution reduceByKey — map-side combined, so
    * at most (distinct dst per partition) rows move, node-sized, never
    * edge-sized. Nothing node-sized is ever broadcast or collected:
    * the earlier DataFrame formulation broadcast the rank frame every
    * iteration, which caps out near ~100M nodes (8 GB broadcast
    * ceiling); this loop's per-iteration traffic is one node-sized
    * shuffle regardless of node count, so it survives a 100× scale-up.
    * RDD lineage grows by a constant number of stages per iteration
    * (shuffle files are natural recompute barriers), so no per-round
    * checkpoint is needed — unlike the Catalyst plan, which doubled.
    *
    * Contributions are QUANTIZED to integer multiples of 2^-40 before
    * summation: an integer sum is exact and ORDER-FREE, so the
    * aggregate is bit-identical across partition layouts, retries,
    * and engines — a raw double sum drifts with accumulation order,
    * and over 5 iterations that drift would make the r7-rounded
    * oracle comparison flaky. Truncation loses < |E|·2^-40 total
    * mass per iteration (~1e-11 on a 10M-edge graph) —
    * deterministically, on both sides of the comparison. Every
    * floating-point step (floor(c·2^40), long sum, /2^40, (1−d)/N +
    * d·mass) is the same IEEE op sequence the DuckDB oracle CTEs
    * replay, so the swap from DataFrame to RDD left q99's hash
    * unchanged.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations >= 1")
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val spark = edges.sparkSession
    val und = orient(edges, srcCol, dstCol)
    val dirDf = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
    val vType = dirDf.schema("src").dataType
    // Partitioner sized by DATA, not by the static conf: AQE has
    // already coalesced `dirDf`'s post-shuffle output to ~advisory-
    // sized partitions, so its partition count is an edge-volume
    // signal that costs nothing extra (the RDD conversion runs the
    // edge-build stages we need anyway). A sf0.1 graph then runs the
    // 5-iteration loop on a handful of partitions instead of 32 —
    // the cold-run spread the r8 judge measured was pure tiny-task
    // scheduling (5 iterations × 4 stages × 32 near-empty tasks) —
    // while a 100× graph grows to the conf cap. Result hash is
    // layout-independent (quantized order-free integer sums), so the
    // partition count cannot change values.
    val raw = dirDf.rdd
    val part = new HashPartitioner(
      math.max(1, math.min(spark.sessionState.conf.numShufflePartitions,
        raw.getNumPartitions)))
    // one edge shuffle, ever: hash-partition by src and persist; every
    // iteration's joins reuse this layout narrowly
    val dir = raw.map(r => (r.get(0), r.get(1)))
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    // same partitioner ⇒ reduceByKey shuffles nothing (already clustered)
    val deg = dir.mapValues(_ => 1L).reduceByKey(part, _ + _)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()             // driver scalar: node count, bounded
    val base = (1.0 - damping) / n
    val Q = 1099511627776L          // 2^40
    var pr = deg.mapValues(_ => 1.0 / n)
    for (_ <- 1 to iterations) {
      val c = deg.join(pr, part)    // co-partitioned: narrow
        .mapValues { case (d, p) => p / d }
      val contrib = dir.join(c, part) // co-partitioned on src: narrow
        .map { case (_, (dst, cv)) => (dst, math.floor(cv * Q).toLong) }
        .reduceByKey(part, _ + _)   // THE per-iteration shuffle: node-sized, map-side combined
      pr = deg.leftOuterJoin(contrib, part) // co-partitioned: narrow
        .mapValues { case (_, in) =>
          base + damping * in.map(_.toDouble / Q).getOrElse(0.0) }
    }
    // Persist lifecycle: catalog.clearCache() (the repo's DataFrame
    // release convention) does NOT reach raw RDD persists, so holding
    // the edge-sized `dir` until a driver GC happens to run the
    // ContextCleaner would stack edge-sized generations across a
    // long-lived session. The loop is therefore driven EAGERLY (the
    // function already bears an action for n): materialize the final
    // node-sized ranks, then release both loop-support persists
    // before returning — the caller's frame reads only the small
    // persisted result, which the cleaner reclaims with the RDD
    // reference.
    val ranks = pr.persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    dir.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    val out = ranks.map { case (v, p) => Row(v, p) }
    spark.createDataFrame(out, StructType(Seq(
      StructField("v", vType), StructField("pr", DoubleType))))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) with a
    * DETERMINISTIC tie-break — community detection next to
    * [[pageRank]] (centrality) and [[triangleStats]] (cohesion).
    * Every node starts labeled with its own id; each of the fixed
    * `iterations` rounds relabels every node with the most frequent
    * label among its neighbors, ties broken by MIN label. Classical
    * async LPA is scan-order dependent; the synchronous rule + min
    * tie-break makes the result a pure function of the graph, so any
    * engine replaying the recurrence (the q99 unrolled-CTE oracle
    * discipline) hash-matches. Fixed iterations, not convergence:
    * synchronous LPA can 2-cycle on bipartite-ish regions, and a
    * data-dependent stop would break replayability.
    *
    * Scale shape: per iteration one edge-keyed join (labels onto the
    * symmetric adjacency, shuffle keyed by src) and one map-side-
    * combined (dst, label) count — edge-sized but banded by the
    * groupBy partials — then a node-sized argmax. Each round ends in
    * an eager localCheckpoint, so the Catalyst plan stays
    * iteration-constant instead of doubling (the q99 lesson).
    * Returns (id, community) — community = the converged label.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "iterations >= 1")
    // hash-partition the symmetric edge list by src ONCE (persisted,
    // sorted — see Iterate.symmetricBySrc for why persist, not
    // localCheckpoint): every round's labels-onto-adjacency join then
    // shuffles only the NODE-sized label frame, never the edges (the
    // pageRank partition-once discipline, kept in DataFrame form —
    // without this the r9 bench showed each round re-shuffling the
    // edge frame, 16.8 s at sf0.1; with it 3 rounds ride one edge
    // layout)
    val dir = Iterate.symmetricBySrc(edges, srcCol, dstCol)
    var lbl = dir.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    for (_ <- 1 to iterations) {
      // One shuffle for BOTH aggregations (r19): repartition the join
      // output by id before the (id, lbl) count — HashPartitioning(id)
      // satisfies the (id, lbl) clustering, so the count AND the argmax
      // run exchange-free on it. The old groupBy(id, lbl) then
      // groupBy(id) shape paid two near-edge-sized exchanges per round
      // (in round 1 every neighbor label is distinct, so the map-side
      // partial aggregation reduced nothing).
      val counts = dir
        .join(lbl.select(col("id").as("src"), col("lbl")), "src")
        .select(col("dst").as("id"), col("lbl"))
        .repartition(col("id"))
        .groupBy(col("id"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      // argmax by (count, then MIN label): lexicographic max over
      // (c, −label) — deterministic, layout-independent
      lbl = Iterate.truncate(counts
        .groupBy(col("id"))
        .agg(max(struct(col("c"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("id"), (-col("m.neg")).as("lbl")))
    }
    lbl.select(col("id"), col("lbl").as("community"))
  }

  /** k-core decomposition membership (Seidman 1983): iteratively peel
    * every node whose degree in the surviving subgraph is < k, until
    * fixpoint. Returns (id, core_deg) — the nodes of the k-core with
    * their degree INSIDE the core. Fixed `rounds` rather than a
    * convergence test: the peel is idempotent once converged (a round
    * at fixpoint removes nothing), so a generous bound replays
    * identically in an unrolled SQL CTE chain (the q99/q198
    * replayability discipline) while a data-dependent stop would not.
    *
    * Scale shape: the symmetric edge list is hash-partitioned by src
    * once and checkpointed. Each round is (1) a src-keyed join of the
    * node-sized survivor set onto the edges — edges stay put, only
    * the survivor frame shuffles; (2) a groupBy(dst) degree count —
    * map-side partials, so the shuffle is node-sized, never
    * edge-sized (deg(v) over src∈surv grouped by dst equals the
    * survivor-subgraph degree by symmetry); (3) a node∩node join
    * applying the dst-membership filter. Per-round traffic is
    * node-sized regardless of |E|, so the loop survives a 100×
    * scale-up; the survivor set only shrinks.
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int = 12): DataFrame = {
    require(k >= 1, "k >= 1")
    require(rounds >= 1, "rounds >= 1")
    val dir = Iterate.symmetricBySrc(edges, srcCol, dstCol)
    // degree of dst over surviving src, membership-filtered on both
    // endpoints; symmetric graph ⇒ this IS the induced-subgraph degree
    def coreDeg(surv: DataFrame): DataFrame = dir
      .join(surv.select(col("v").as("src")), "src")
      .groupBy(col("dst").as("v"))
      .agg(count(lit(1)).as("deg"))
      .join(surv, "v")
    var surv = Iterate.truncate(dir.select(col("src").as("v")).distinct())
    // EXACT early stop (r19): the peel is MONOTONE (surv only ever
    // shrinks) and idempotent at fixpoint, so an unchanged survivor
    // COUNT proves an unchanged survivor SET — every remaining round
    // of the fixed unroll would be a no-op. Output is therefore
    // bit-identical to running all `rounds` (the oracle's full CTE
    // unroll), while the loop stops paying for rounds past fixpoint
    // (at sf0.1 fixpoint lands in 2-4 of the 12 budgeted rounds). The
    // count reads the just-truncated node-sized frame — one cheap job.
    var nSurv = surv.count()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      surv = Iterate.truncate(coreDeg(surv).filter(col("deg") >= k)
        .select(col("v")))
      val n = surv.count()
      converged = n == nSurv
      nSurv = n
      r += 1
    }
    // final deg >= k guard: if `rounds` stopped short of fixpoint (a
    // pendant chain longer than the unroll), the projection must still
    // never emit a row violating the core_deg >= k invariant — the
    // output may be a superset of the true k-core, but every reported
    // degree honors the contract. Converged inputs are unaffected (the
    // filter is then an idempotent no-op, mirrored in the q209 oracle).
    coreDeg(surv).filter(col("deg") >= k)
      .select(col("v").as("id"), col("deg").as("core_deg"))
  }

  /** Coreness spectrum: k-core node sets for k = kMin..kMax in one
    * pass, exploiting the nesting k-core ⊆ (k−1)-core — peel k is
    * SEEDED with peel (k−1)'s emitted core instead of the full node
    * set, so each successive k does strictly less work than a
    * from-scratch [[kCore]] (the r10 q244 shape: four independent
    * 8-round peels off one edge list). One edge shuffle ever;
    * per-round traffic node-sized (the [[kCore]] scale argument).
    *
    * Contract: when each peel reaches fixpoint within `rounds`, the
    * per-k output is exactly [[kCore]]'s; otherwise it is a superset
    * of the true k-core whose every reported degree still honors
    * core_deg >= k (the same rounds-bounded guard), and the superset
    * remains a valid seed for k+1 since true (k+1)-core ⊆ true
    * k-core ⊆ emitted core. Returns (k, id, core_deg); empty cores
    * contribute no rows.
    */
  def corenessSpectrum(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      kMin: Int,
      kMax: Int,
      rounds: Int = 12): DataFrame = {
    require(kMin >= 1 && kMax >= kMin, "1 <= kMin <= kMax")
    require(rounds >= 1, "rounds >= 1")
    val dir = Iterate.symmetricBySrc(edges, srcCol, dstCol)
    def coreDeg(surv: DataFrame): DataFrame = dir
      .join(surv.select(col("v").as("src")), "src")
      .groupBy(col("dst").as("v"))
      .agg(count(lit(1)).as("deg"))
      .join(surv, "v")
    var seed = Iterate.truncate(dir.select(col("src").as("v")).distinct())
    var nSeed = seed.count()
    (kMin to kMax).map { k =>
      var surv = seed
      // the kCore exact early stop (monotone peel: equal count ⇒ equal
      // set ⇒ every further round is a no-op; output identical to the
      // full unroll the oracle replays)
      var nSurv = nSeed
      var r = 0
      var converged = false
      while (r < rounds && !converged) {
        surv = Iterate.truncate(coreDeg(surv).filter(col("deg") >= k)
          .select(col("v")))
        val n = surv.count()
        converged = n == nSurv
        nSurv = n
        r += 1
      }
      val core = Iterate.truncate(coreDeg(surv).filter(col("deg") >= k)
        .select(col("v").as("id"), col("deg").as("core_deg")))
      // at fixpoint the final guard is a no-op, so |core| == |surv|;
      // only the rounds-exhausted regime needs the explicit count
      nSeed = if (converged) nSurv else core.count()
      seed = core.select(col("id").as("v"))
      core.select(lit(k.toLong).as("k"), col("id"), col("core_deg"))
    }.reduce(_ unionAll _)
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a DIRECTED edge
    * list, fixed `iterations` of the mutual-reinforcement recurrence
    * with L1 normalization each half-step:
    *   auth(v) ← Σ_{u→v} hub(u) / ‖·‖₁ ;  hub(u) ← Σ_{u→v} auth(v) / ‖·‖₁.
    * Every cross-node sum (both the per-node edge sums and the global
    * normalizers) is QUANTIZED to integer multiples of 2^-40 exactly
    * like [[pageRank]], so the result is order-free, layout-
    * independent, and bit-replayable by an unrolled SQL CTE chain.
    * Returns (side ∈ {hub, auth}, id, val) with val L1-normalized.
    *
    * Scale shape: TWO checkpointed edge layouts — hash-partitioned by
    * src and by dst, one shuffle each, ever. The auth half-step joins
    * the node-sized hub frame onto the src layout (edges stay put)
    * and aggregates groupBy(dst) with map-side partials; the hub
    * half-step mirrors it on the dst layout. Per-iteration shuffle
    * traffic is node-sized; the normalizer is a 1-row aggregate
    * cross-joined back (never collected, never node-sized broadcast).
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, "iterations >= 1")
    val Q = 1099511627776L          // 2^40
    val dirS = Iterate.directedBy(edges, "src", srcCol, dstCol)
    val dirD = Iterate.directedBy(edges, "dst", srcCol, dstCol)
    // quantized order-free sum of a double column (the q99 contract)
    def qsum(c: org.apache.spark.sql.Column) =
      sum(floor(c * Q)).cast("double") / Q
    // raw feeds BOTH the normalizer aggregate and the per-node
    // quotient: truncate it first so each half-step's edge join+agg
    // runs once, not once per consumer (r19: the duplicated subtree
    // also raced the lazy edge-cache build, 6 copies in one job)
    def normalized(raw0: DataFrame): DataFrame = {
      val raw = Iterate.truncate(raw0)
      val s = raw.agg(qsum(col("raw")).as("s"))
      raw.crossJoin(s).select(col("id"), (col("raw") / col("s")).as("val"))
    }
    // init hub = 1/|hubs| (not 1): keeps every quantized partial sum
    // ≤ ~avg-degree·2^40 regardless of |E|, so the order-free long
    // sums can't overflow on a 100× graph (Σ over edges of hub(u) is
    // ≈ avg out-degree, not |E|)
    val hubIds = Iterate.truncate(dirS.select(col("src").as("id")).distinct())
    var hub = hubIds.crossJoin(hubIds.agg(count(lit(1)).as("h")))
      .select(col("id"), (lit(1.0) / col("h")).as("val"))
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      auth = normalized(dirS
        .join(hub.select(col("id").as("src"), col("val")), "src")
        .groupBy(col("dst").as("id"))
        .agg(qsum(col("val")).as("raw")))
      hub = normalized(dirD
        .join(auth.select(col("id").as("dst"), col("val")), "dst")
        .groupBy(col("src").as("id"))
        .agg(qsum(col("val")).as("raw")))
    }
    hub.select(lit("hub").as("side"), col("id"), col("val"))
      .unionAll(auth.select(lit("auth").as("side"), col("id"), col("val")))
  }

  /** Hop-bounded Brandes betweenness (Brandes 2001; the k-bounded-
    * distance variant) from sampled seed sources — the shortest-path
    * brokerage centrality a 100 TB graph actually computes: exact
    * all-pairs Brandes is O(V·E), so production systems sample
    * sources (seed mod rule) and bound the horizon (`hops`), both of
    * which this does explicitly.
    *
    * Forward: per-seed BFS with PATH COUNTS — σ_s(w) = Σ_pred σ_s(v),
    * an exact integer sum per layer. Backward: dependency
    * accumulation δ_s(v) = Σ_{succ w} σ_v/σ_w·(1 + δ_s(w)) from the
    * deepest layer in; each term is fdiv(σ_v·(1e6 + δ_w), σ_w) —
    * exact micro-quantized integer algebra, order-free sums, fully
    * oracle-replayable. bc(v) = Σ_s δ_s(v), endpoints excluded by
    * construction (layer ≥ 1).
    *
    * Scale shape: one edge layout partitioned by src and checkpointed
    * (the q99/q198 discipline); per-round traffic is frontier-sized ×
    * seed multiplicity, never graph-quadratic; the backward phase
    * joins layer frames (seeds×reach-bounded) onto the stationary
    * layout. Fixed `hops` unroll keeps the plan replayable.
    */
  def truncatedBetweenness(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      seedMod: Long = 97L,
      hops: Int = 4): DataFrame = {
    require(hops >= 2)
    val spark = edges.sparkSession
    import spark.implicits._
    // multiplicity-preserving symmetrization (σ counts walk edges, so
    // no dedup here): stationary persisted layout, the Iterate shape
    val dir = edges.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .unionAll(edges.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .persist()
    // one checkpoint PER LAYER, never of the growing union — the
    // union-per-round form holds O(rounds) copies of the whole reach
    // set in block storage and OOM'd the full-suite bench at sf0.1
    val layers = scala.collection.mutable.ArrayBuffer(
      Iterate.truncate(dir.select(col("src").as("v")).distinct()
        .filter(col("v") % seedMod === 0)
        .select(col("v").as("sd"), col("v"), lit(0L).as("dist"),
          lit(1L).as("sigma"))))
    for (i <- 1 to hops) {
      val seen = layers.map(_.select(col("sd"), col("v")))
        .reduce(_ unionAll _)
      val next = dir
        .join(layers.last.select(col("sd"), col("v").as("src"),
          col("sigma")), "src")
        .groupBy(col("sd"), col("dst").cast("long").as("v"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(seen, Seq("sd", "v"), "left_anti")
        .select(col("sd"), col("v"), lit(i.toLong).as("dist"), col("sigma"))
      layers += Iterate.truncate(next)
    }
    // backward dependency accumulation, deepest layer first
    var delta = Iterate.truncate(layers(hops)
      .select(col("sd"), col("v"), lit(0L).as("dq")))
    val deps = Seq.newBuilder[DataFrame]
    for (l <- (hops - 1) to 1 by -1) {
      val lower = layers(l)
        .select(col("sd"), col("v"), col("sigma"))
      val upper = layers(l + 1)
        .select(col("sd"), col("v").as("w"), col("sigma").as("sw"))
      val dl = lower
        .join(dir.select(col("src").cast("long").as("v"),
          col("dst").cast("long").as("w")), Seq("v"))
        .join(upper, Seq("sd", "w"))
        .join(delta.select(col("sd"), col("v").as("w"), col("dq")),
          Seq("sd", "w"), "left")
        .withColumn("dqw", coalesce(col("dq"), lit(0L)))
        .groupBy(col("sd"), col("v"))
        .agg(sum(floor(
            (col("sigma") * (lit(1000000L) + col("dqw"))).cast("double")
              / col("sw").cast("double")).cast("long"))
          .as("dq"))
      delta = Iterate.truncate(dl)
      deps += delta
    }
    deps.result().reduce(_ unionAll _)
      .groupBy(col("v"))
      .agg(sum(col("dq")).as("bc_micro"))
      .orderBy(col("bc_micro").desc, col("v"))
      .limit(50)
  }

  /** Katz centrality (Katz 1953) over the UNDIRECTED edge list: fixed
    * `iterations` of x ← 1 + α·A·x from x₀ = 1, every cross-node sum
    * quantized to integer multiples of 2⁻⁴⁰ (the [[pageRank]]
    * discipline) so the result is order-free, layout-independent, and
    * replayable by an unrolled CTE chain. α must sit below 1/λ_max
    * for the infinite series to converge; with a fixed unroll the
    * output is well-defined (and oracle-identical) regardless.
    * Returns (id, katz) with katz ≥ 1.
    *
    * Degree-free recurrence (vs [[pageRank]]'s p/deg contributions):
    * Katz rewards VOLUME of walks, so a hub's mass is not split
    * among its neighbors — the complementary centrality axis.
    *
    * Scale shape: one symmetric edge shuffle ever (checkpointed);
    * per-iteration traffic is node-sized with map-side partials; the
    * survivor frame never grows past the node set.
    */
  def katz(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 4,
      alpha: Double = 0.01): DataFrame = {
    require(iterations >= 1, "iterations >= 1")
    val Q = 1099511627776L           // 2^40
    val dir = Iterate.symmetricBySrc(edges, srcCol, dstCol)
    var x = Iterate.truncate(dir.select(col("src").as("v")).distinct()
      .withColumn("x", lit(1.0).cast("double")))
    for (_ <- 1 to iterations) {
      // symmetric graph ⇒ every node is some edge's dst: the groupBy
      // covers the full node set, no left join needed
      x = Iterate.truncate(dir.join(x.select(col("x"), col("v").as("src")), "src")
        .groupBy(col("dst").as("v"))
        .agg(sum(floor(col("x") * Q).cast("long")).as("c"))
        .select(col("v"),
          (lit(1.0) + lit(alpha) * (col("c").cast("double") / Q)).as("x")))
    }
    x.select(col("v").as("id"), col("x").as("katz"))
  }

  /** Eigenvector centrality by the normalized power method over the
    * UNDIRECTED edge list: `iterations` of x ← A·x followed by an
    * L1 renormalization to mean 1 (x·N/Σx — sum-norm, so no sqrt and
    * no libm anywhere). The PRESTIGE axis next to [[katz]] (which
    * adds the +1 volume floor and never normalizes): a node is
    * central here exactly when its neighbors are.
    *
    * Determinism: cross-node sums quantize to integer multiples of
    * 2⁻³⁰ — coarser than [[pageRank]]'s 2⁻⁴⁰ deliberately, because
    * the UNNORMALIZED global sum Σc reaches Q·2|E| and must stay
    * below 2⁶³ for the HUGEINT→DOUBLE cast to be exact on both
    * engines (the q267 headroom discipline: 2³⁰·2|E| < 2⁶³ holds to
    * ~4e9 edges). Both the per-node quotient and the node-count
    * factor are ONE identical IEEE chain per round, replayable as
    * unrolled CTEs. Returns (id, eig) with mean(eig) = 1.
    *
    * Scale shape: one symmetric edge shuffle ever (checkpointed);
    * per-round traffic node-sized with map-side partials; the
    * normalizer is a 1-row aggregate cross-joined back (never a
    * driver round-trip inside the loop).
    */
  def eigenvectorCentrality(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 4): DataFrame = {
    require(iterations >= 1, "iterations >= 1")
    val Q = 1073741824L              // 2^30
    val dir = Iterate.symmetricBySrc(edges, srcCol, dstCol)
    val nodes = dir.select(col("src").as("v")).distinct()
    val nCnt = Iterate.truncate(nodes.agg(count(lit(1)).as("nn")))
      // 1 row, re-read every round
    var x = Iterate.truncate(nodes.withColumn("x", lit(1.0).cast("double")))
    for (_ <- 1 to iterations) {
      // the contribution aggregate feeds both the normalizer and the
      // per-node quotient: truncate it once so the join+aggregate runs
      // once per round, not once per consumer
      val c = Iterate.truncate(
        dir.join(x.select(col("x"), col("v").as("src")), "src")
          .groupBy(col("dst").as("v"))
          .agg(sum(floor(col("x") * Q).cast("long")).as("c")))
      val sTot = c.agg(sum(col("c").cast("decimal(38,0)")).as("s"))
      x = c.crossJoin(sTot).crossJoin(nCnt)
        .select(col("v"),
          (col("c").cast("double") / col("s").cast("double")
            * col("nn").cast("double")).as("x"))
    }
    x.select(col("v").as("id"), col("x").as("eig"))
  }

  /** Per-node local clustering coefficient over the UNDIRECTED edge
    * list: cc(v) = 2·T(v)/(deg(v)·(deg(v)−1)), with T(v) counted by
    * the wedge-closure join (each unordered neighbor pair (x<y) of v
    * checked against the normalized edge set once — orientation-free,
    * so the oracle replays the identical enumeration). The per-node
    * refinement of [[triangleStats]]'s single global coefficient.
    * cc is an EXACT integer ppm division (2·T·1e6 DIV deg·(deg−1),
    * positives only), NULL for deg < 2. Returns
    * (id, deg, n_tri, cc_ppm).
    *
    * Scale shape: the wedge join is Σ deg² pairs — on the support-
    * thinned graphs this library feeds it (the q209/q77 convention)
    * that is near-linear; the closure probe joins against the
    * normalized edge list, shuffle-keyed, never collected.
    */
  def localClustering(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    // persist + eager count, not localCheckpoint: same multi-consumer
    // reuse, but the cached plan keeps its partitioning metadata,
    // storage is released by the catalog-clearCache contract, and the
    // frame stays recomputable on a cluster (Iterate scaladoc); eager
    // because the wedge join references `dir` twice in one job
    // (Iterate.materialized rationale)
    val e0 = orient(edges, srcCol, dstCol).persist()
    val dir = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
      .persist()                     // degree pass + two wedge sides
    dir.count()                      // materializes e0's cache too
    val deg = dir.groupBy(col("src").cast("long").as("v"))
      .agg(count(lit(1)).as("deg"))
    val tri = dir.as("n1")
      .join(dir.as("n2"),
        col("n1.src") === col("n2.src") && col("n1.dst") < col("n2.dst"))
      .join(e0.as("t"),
        col("t.a") === col("n1.dst") && col("t.b") === col("n2.dst"))
      .groupBy(col("n1.src").cast("long").as("v"))
      .agg(count(lit(1)).as("n_tri"))
    deg.join(tri, Seq("v"), "left")
      .select(col("v").as("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") < 2, lit(null).cast("long"))
          .otherwise(expr(
            "2 * coalesce(n_tri, 0) * 1000000 DIV (deg * (deg - 1))"))
          .as("cc_ppm"))
  }

  /** Personalized PageRank (random walk with restart) over the
    * UNDIRECTED edge list: the teleport mass lands ONLY on `seeds`
    * (uniformly), so ranks measure proximity TO THE SEED SET rather
    * than global prominence — the "related items" / local-relevance
    * member next to the global [[pageRank]]. Fixed `iterations` of
    *   p ← (1−d)·1_seed/|S| + d · A^T (p/deg),
    * contributions quantized to 2⁻⁴⁰ exactly as [[pageRank]], so the
    * doubles replay in an unrolled CTE chain. Returns (id, ppr) for
    * nodes with ppr > 0 — sparse by construction (seeds ∪ nodes
    * within `iterations` hops), which IS the 100 TB shape: a
    * walk-with-restart frontier is seed-local, never graph-sized.
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,            // one column `v`
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations >= 1")
    val Q = 1099511627776L
    val dir = Iterate.symmetricBySrc(edges, srcCol, dstCol)
    // groupBy(src) rides dir's cached src-partitioning: no exchange
    val deg = Iterate.truncate(dir.groupBy(col("src").as("v"))
      .agg(count(lit(1)).as("deg")))
    val seeded = Iterate.truncate(
      deg.join(seeds.select(col("v").cast("long").as("v")), "v"))
    val ns = seeded.count()          // driver scalar: seed count, bounded
    require(ns > 0, "no seeds present in the graph")
    val base = (1.0 - damping) / ns
    var pr = Iterate.truncate(seeded.select(col("v"), col("deg"),
      (lit(1.0) / ns).as("pr")))
    for (_ <- 1 to iterations) {
      val m = dir
        .join(pr.select(col("v").as("src"),
          floor(col("pr") / col("deg") * Q).cast("long").as("cq")), "src")
        .groupBy(col("dst").as("v"))
        .agg(sum(col("cq")).as("cq"))
        .select(col("v"), (col("cq").cast("double") / Q).as("m"))
      // all nodes carrying mass this round: seeds (base term) ∪ m
      pr = Iterate.truncate(deg
        .join(m, Seq("v"), "left")
        .join(seeded.select(col("v"), lit(1).as("isSeed")), Seq("v"), "left")
        .select(col("v"), col("deg"),
          (when(col("isSeed").isNotNull, lit(base)).otherwise(lit(0.0)) +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
        .filter(col("pr") > 0.0))
    }
    pr.select(col("v").as("id"), col("pr").as("ppr"))
  }

  /** Hop-bounded Bellman–Ford single-source-set shortest paths over a
    * WEIGHTED directed edge list (`src`, `dst`, integer `cost` ≥ 0):
    * dist after round t = exact min-cost over paths of ≤ t edges from
    * the seed set — all-integer algebra, so the frame replays in an
    * unrolled min-aggregation CTE chain. Frontier-pruned: each round
    * relaxes only edges out of nodes whose distance CHANGED last
    * round (identical dist_t to full relaxation — an unchanged node
    * re-offers candidates already folded in), so per-round traffic is
    * frontier-sized, the weighted-graph shape [[truncatedBetweenness]]
    * documents for hop counts. Returns (id, dist_q) for reached nodes.
    */
  def bellmanFord(
      weighted: DataFrame,           // src, dst, cost (BIGINT ≥ 0)
      seeds: DataFrame,              // one column `v`
      rounds: Int = 6): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    // weighted (multi-)edge list: stationary persisted src layout, no
    // dedup (parallel edges legitimately offer separate costs)
    val dir = weighted.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("cost").cast("long").as("cost"))
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .persist()
    var dist = Iterate.truncate(seeds.select(col("v").cast("long").as("v"))
      .distinct()
      .withColumn("dist", lit(0L)))
    var frontier = dist
    for (_ <- 1 to rounds) {
      val cand = dir
        .join(frontier.select(col("v").as("src"), col("dist")), "src")
        .groupBy(col("dst").as("v"))
        .agg(min(col("dist") + col("cost")).as("cand"))
      val joined = Iterate.truncate(dist.join(cand, Seq("v"), "full_outer")
        .select(col("v"), col("dist"), col("cand")))
      frontier = joined
        .filter(col("dist").isNull || col("cand") < col("dist"))
        .select(col("v"), col("cand").as("dist"))
      dist = joined
        .select(col("v"),
          least(coalesce(col("dist"), col("cand")),
            coalesce(col("cand"), col("dist"))).as("dist"))
    }
    dist.select(col("v").as("id"), col("dist").as("dist_q"))
  }
}
