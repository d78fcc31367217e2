package graft.operators

import graft.functions.CountMinSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-pruned EXACT heavy hitters — the two-phase pattern that
  * makes exact frequency thresholds affordable at corpus scale:
  * a full `groupBy(item)` shuffles every distinct item (at 100 TB,
  * the long tail IS the data); instead, pass 1 builds one 32 KB
  * Count-Min sketch (mergeable partials, driver sees a constant-size
  * state), pass 2 prefilters rows through the sketch and exact-counts
  * ONLY the survivors.
  *
  * Exactness proof (why the output equals the naive plan): CMS
  * estimates NEVER underestimate (overestimate-only, the
  * [[CountMinSketch]] contract), so for every item with true count ≥
  * minSupport, est(item) ≥ true(item) ≥ minSupport — the prefilter
  * keeps a SUPERSET of the answer. False survivors (overestimated
  * tail items) are removed by the final exact HAVING. Both phases are
  * deterministic, so the result is oracle-checkable (q148) — unlike
  * the estimate-valued q103.
  *
  * Pruning power: a tail item survives the prefilter only if its
  * sketch collisions reach minSupport − true; with εN = (e/w)·N
  * expected overestimate, the shuffled volume drops toward the true
  * heavy-hitter mass as minSupport ≫ εN. When minSupport ≲ εN the
  * prefilter degrades gracefully to a no-op (correct, just unpruned)
  * — size w up per the [[CountMinSketch]] bounds.
  *
  * The probe is procedural by design (d array lookups against the
  * broadcast sketch — the documented [[CountMinSketch.estimateCol]]
  * caveat), so it runs as a typed mapPartitions filter, not a UDF in
  * a Catalyst plan.
  */
object HeavyHitters {

  /** All NON-NULL items with exact count ≥ minSupport, as (item, n) —
    * equal to `groupBy(item).count.filter(n ≥ minSupport)` over the
    * string rendering of the column with nulls dropped: the sketch
    * hashes strings and skips NULL (the [[CountMinSketch]] null-skip
    * convention), so the operator casts to string and drops nulls
    * up front — a caller needing the null group counts it separately
    * (one `count(when(isnull…))`, no shuffle).
    *
    * DETERMINISM REQUIREMENT (the repo-wide input discipline): the
    * `items` plan executes TWICE — once for the sketch, once for the
    * survivor count — and the exactness proof (CMS never
    * underestimates ⇒ the prefilter keeps a superset of the true
    * heavy hitters) assumes both executions see the same multiset. A
    * nondeterministic input (an unseeded sample, a rand() column, a
    * first()-per-group without ordering) voids the guarantee; persist
    * such an input before calling, or seed it.
    */
  def frequentExact(
      items: DataFrame,
      itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport > 0, "minSupport must be positive")
    val spark = items.sparkSession
    import spark.implicits._
    val skRow = items
      .agg(CountMinSketch.sketch(col(itemCol)).as("sk"))
      .head()
    val sketch = skRow.getSeq[Long](0).toArray
    val bc = spark.sparkContext.broadcast(sketch)
    val survivors = items.select(col(itemCol).cast("string").as("item"))
      .as[String]
      .mapPartitions { it =>
        val sk = bc.value
        it.filter(item => item != null && CountMinSketch.estimate(sk, item) >= minSupport)
      }
      .toDF("item")
    survivors.groupBy($"item")
      .agg(count(lit(1)).as("n"))
      .filter($"n" >= minSupport)
  }
}
