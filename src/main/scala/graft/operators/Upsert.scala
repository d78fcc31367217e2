package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert — the lakehouse write primitive (Delta/Iceberg
  * `MERGE INTO`) expressed as plain relational algebra, since OSS
  * parquet has no transactional merge: updates win over target rows on
  * the key, inserts append, untouched rows pass through. The reference
  * maintains its tables by CDF-driven incremental sync (SURVEY §2.10
  * S13, `01-download-pdfs.py:180-182` overwrite); upsert is the same
  * maintenance contract when the source hands you deltas instead of
  * snapshots.
  *
  * NOT a naive full-outer join: Spark cannot broadcast a full-outer
  * (both sides' unmatched rows must surface), so that plan
  * shuffle-sorts the whole target however small the delta. Decomposed
  * instead into
  *  - UPDATE application — target LEFT JOIN updates: broadcastable,
  *    so the delta-sized case (the normal one) is a NARROW codegen
  *    pass over the target, no target shuffle;
  *  - INSERT detection — updates ANTI JOIN target keys: the target
  *    contributes only its key column to that shuffle (skinny rows),
  *    the cheapest membership test available without a table format's
  *    file-level indexes.
  * Column-generic (any schema sharing the key), pure per-column
  * coalesce, no UDF.
  */
object Upsert {

  /** `target` merged with `updates` on `keyCol`: matched rows take the
    * update's row WHOLESALE (MERGE matched semantics — including its
    * nulls), unmatched updates insert, unmatched target rows survive.
    * Schemas must agree (same column set) — the relational MERGE
    * contract.
    */
  def upsert(target: DataFrame, updates: DataFrame, keyCol: String): DataFrame = {
    require(target.columns.sorted.sameElements(updates.columns.sorted),
      s"schemas differ: target ${target.columns.mkString(",")} vs " +
        s"updates ${updates.columns.mkString(",")}")
    // MERGE's cardinality contract: a duplicate key in the delta would
    // silently MULTIPLY matched target rows through the join. Delta/
    // Iceberg raise "multiple source rows matched" at runtime; we
    // check eagerly — one skinny aggregation over the delta-sized side.
    val dup = updates.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"updates contain duplicate $keyCol (e.g. ${dup.head.get(0)}); " +
        "MERGE semantics require one update row per key")
    // a NULL-keyed delta row would sail through both joins (null never
    // equals) and silently append as a null-keyed insert — Delta/
    // Iceberg MERGE surfaces it; so do we, eagerly
    if (updates.filter(col(keyCol).isNull).limit(1).collect().nonEmpty)
      throw new IllegalArgumentException(
        s"updates contain a NULL $keyCol; MERGE requires non-null merge keys")
    val dataCols = target.columns.filterNot(_ == keyCol).toSeq
    val ordered = keyCol +: dataCols

    // matched-or-passthrough: update row wins wholesale on a key hit
    // (the __hit flag, not data-column nullness, decides precedence).
    // No broadcast hint: a delta-sized update broadcasts on its own
    // size stats (asserted in UpsertSpec), while a snapshot-sized one
    // degrades to a shuffle join instead of an executor OOM.
    val u = updates.select(
      col(keyCol) +: lit(true).as("__hit") +: dataCols.map(c => col(c).as(s"__u_$c")): _*)
    val applied = target.join(u, Seq(keyCol), "left")
      .select(col(keyCol) +: dataCols.map { c =>
        when(col("__hit"), col(s"__u_$c")).otherwise(col(c)).as(c)
      }: _*)

    // inserts: updates whose key is absent — the target side of this
    // shuffle is its KEY COLUMN only
    val inserts = updates.join(target.select(col(keyCol)), Seq(keyCol), "left_anti")
      .select(ordered.map(col): _*)

    applied.unionByName(inserts)
  }
}
