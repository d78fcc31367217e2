package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared machinery for the iterative (fixed-unroll) graph loops.
  *
  * Two r19 findings drive this object:
  *
  *  1. With AQE on, `localCheckpoint(true)` materializes through an
  *     `AdaptiveSparkPlan` whose output partitioning is not resolvable
  *     at capture time, so the checkpointed frame comes back as
  *     `Scan ExistingRDD ... UnknownPartitioning` — every loop that
  *     "hash-partitioned the edges by src ONCE" was in fact paying a
  *     fresh edge-sized Exchange + Sort in EVERY round's join (r19
  *     plan audit on artifact:lpa). A persisted (cached) frame does
  *     NOT have this problem: `InMemoryTableScan` preserves the cached
  *     plan's partitioning and ordering (Spark pins it via
  *     spark.sql.optimizer.canChangeCachedPlanOutputPartitioning =
  *     false), so a `repartition(src).sortWithinPartitions(src)
  *     .persist()` edge frame joins with ZERO per-round work on the
  *     edge side. Storage lifecycle is also better: `persist()` is
  *     released by `spark.catalog.clearCache()` (the repo-wide release
  *     convention), where localCheckpoint blocks needed the RDD-level
  *     sweep Bench/Verify carry.
  *
  *  2. `localCheckpoint` truncates lineage into BLOCK STORAGE ONLY —
  *     on a real cluster, losing an executor mid-loop destroys
  *     partitions that cannot be recomputed ("Checkpoint block not
  *     found" / the unpersist warnings that filled VERIFY entry_tail).
  *     The per-round truncation therefore goes through [[truncate]]:
  *     a RELIABLE checkpoint when the session has a checkpoint
  *     directory configured (the cluster deployment sets one —
  *     `spark.sparkContext.setCheckpointDir`), falling back to
  *     localCheckpoint in local mode where executor loss means the
  *     whole app is gone anyway.
  */
object Iterate {

  /** Truncate a node-sized per-round frame's lineage. Reliable
    * checkpoint when a checkpoint dir is configured (cluster-safe:
    * survives executor loss), eager localCheckpoint otherwise (local
    * mode / tests, where the driver IS the only executor).
    */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(true)
    else df.localCheckpoint(true)

  /** The iteration-stationary edge layout: both directions of every
    * edge (already-symmetric input welcome), self-loops dropped,
    * deduped, endpoints cast to long, hash-partitioned by `src`,
    * sorted within partitions by `src`, persisted.
    *
    * ONE exchange total — the dedup runs as an aggregation ON the
    * src-partitioned data (HashPartitioning(src) satisfies the
    * (src, dst) clustering requirement), where the old
    * orient().distinct() + repartition(src) chain shuffled the edge
    * set twice. Every round's src-keyed join then reuses the cached
    * layout with no Exchange and no Sort (see class doc). Callers
    * release the storage through the catalog-clearCache contract
    * (ARCHITECTURE.md "Scale design" §).
    */
  def symmetricBySrc(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    materialized(raw.unionAll(raw.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .dropDuplicates(Seq("src", "dst"))
      .sortWithinPartitions("src"))
  }

  /** persist + eager materialization for a multi-consumer REUSE frame
    * (not a loop-truncation point): unlike [[truncate]] the cached
    * plan keeps its output partitioning and ordering, so a downstream
    * join/aggregate keyed like the frame's producing exchange reuses
    * it instead of re-shuffling (r19 q335: the train-leg self-join on
    * the join key it was already partitioned by). Eager for the same
    * reason as [[materialized]].
    */
  def reuse(df: DataFrame): DataFrame = materialized(df)

  /** persist + EAGER materialization. A lazily-persisted layout that a
    * first-round plan references more than once (the normalizer /
    * initial-state subtrees of the loops do) is built CONCURRENTLY by
    * every referencing subtree before any partition lands in the
    * cache — r19 measured SIX racing edge builds in hits' first
    * checkpoint job. One count() up front pins the cache exactly once.
    */
  private def materialized(df: DataFrame): DataFrame = {
    val out = df.persist()
    out.count()
    out
  }

  /** [[symmetricBySrc]] for an already-DIRECTED edge list: dedup +
    * stationary layout, no symmetrization.
    */
  def directedBy(edges: DataFrame, keyCol: String,
      srcCol: String, dstCol: String): DataFrame =
    materialized(edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col(keyCol))
      .dropDuplicates(Seq("src", "dst"))
      .sortWithinPartitions(keyCol))
}
