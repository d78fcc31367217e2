package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the STATIC half of the skew-join story (the
  * runtime half, AQE partition splitting, is pinned by AqeSkewSpec;
  * the aggregation analogue is q36): when one join key dominates the
  * probe side and the build side is too big to broadcast, a plain
  * shuffle join serializes the hot key through one reducer. Salting
  * widens the key: the probe side gets a deterministic per-row salt,
  * the build side replicates each row once per salt value, and the
  * join runs on (key, salt) — the hot key now lands on `salts`
  * reducers.
  *
  * Trade: build-side volume ×salts against reducer parallelism
  * ×salts on the hot keys — the classic play when the build side is
  * dimension-sized but over the broadcast threshold. Semantics are
  * UNCHANGED (every probe row still meets every matching build row,
  * exactly once) — which is precisely what the q67 oracle checks
  * against the plain join.
  *
  * The salt is `hash(rowId) mod salts` — deterministic under task
  * retry (a recomputed partition salts identically), unlike
  * rand()-based salting which can double- or zero-count rows when a
  * stage retries over a non-idempotent RNG.
  */
object SkewJoin {

  /** `big ⋈ small` on `key`, with the hot keys spread over `salts`
    * reducers. `bigRowId` must be a row-unique column of `big` (ids
    * work; any high-cardinality column does) — it only seeds the salt.
    */
  def saltedJoin(
      big: DataFrame,
      bigRowId: String,
      small: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    require(salts > 1, "salts must exceed 1 (1 would be the plain join)")
    val b = big.withColumn("__salt", pmod(hash(col(bigRowId)), lit(salts)))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
