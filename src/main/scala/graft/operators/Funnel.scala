package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered multi-stage funnel over an event log: stage k is reached by
  * an entity iff a stage-k event occurs strictly after its stage-(k-1)
  * time and within `withinSeconds` of it; the entity's stage-k time is
  * the EARLIEST such event. The "first qualifying event" rule makes
  * the result deterministic and single-valued per entity — the common
  * product-analytics semantics ("conversion windows").
  *
  * Plan shape: one aggregate per stage (filter → groupBy(entity) →
  * min), each LEFT-joined to the previous stage's one-row-per-entity
  * frame — the window condition is part of the JOIN predicate, so an
  * entity whose candidate events all miss the window still keeps its
  * row (with a null stage time) rather than vanishing. All joins and
  * aggregates share the same entity-key partitioning (Spark reuses
  * the exchange); stage frames only shrink; the per-stage event
  * predicate pushes to the scan. No collect_list — a hot entity with
  * 10^6 events costs one aggregation, not an array.
  */
object Funnel {

  /** One funnel stage: a row-level predicate picking this stage's
    * events, and the max allowed delay (in seconds) after the
    * previous stage's time. The first stage's `withinSeconds` is
    * ignored (no predecessor); `Long.MaxValue` means unbounded.
    */
  final case class Stage(name: String, predicate: Column, withinSeconds: Long = Long.MaxValue)

  /** One row per entity that reached stage 1: entity plus a
    * `t_<stageName>` timestamp per stage (null once a stage is
    * missed; later stages of a missed stage are null by construction
    * since their predecessor time is null).
    */
  def funnel(
      events: DataFrame,
      entity: Column,
      ts: Column,
      stages: Seq[Stage]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val head = events.filter(stages.head.predicate)
      .groupBy(entity.as("entity"))
      .agg(min(ts).as(s"t_${stages.head.name}"))
    stages.tail.foldLeft((head, stages.head.name)) { case ((acc, prevName), st) =>
      val prevT = acc(s"t_$prevName")
      val cand = events.filter(st.predicate)
        .select(entity.as("__e"), ts.as("__ts"))
      val inWindow =
        if (st.withinSeconds == Long.MaxValue) cand("__ts") > prevT
        else cand("__ts") > prevT &&
          cand("__ts") <= prevT + expr(s"INTERVAL ${st.withinSeconds} SECOND")
      val joined = acc.join(cand, acc("entity") === cand("__e") && inWindow, "left")
      val carried = acc.columns.filter(_ != "entity")
        .map(c => first(col(c)).as(c))
      val agg0 = joined.groupBy(acc("entity"))
        .agg(carried.head, carried.tail :+ min(col("__ts")).as(s"t_${st.name}"): _*)
      (agg0, st.name)
    }._1
  }

  /** Stage-level rollup of [[funnel]]: (stage_idx, stage, n_entities,
    * conv_from_first). A k×1 single-row aggregate exploded to k rows —
    * the per-stage counts and ratios are scalars, never data-sized.
    */
  def funnelStats(perEntity: DataFrame, stages: Seq[Stage]): DataFrame = {
    val aggs = stages.map(st => count(col(s"t_${st.name}")).as(s"__n_${st.name}"))
    val one = perEntity.agg(aggs.head, aggs.tail: _*)
    val n1 = col(s"__n_${stages.head.name}").cast("double")
    val rows = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(st.name).as("stage"),
        col(s"__n_${st.name}").as("n_entities"),
        graft.functions.TextFunctions.r4(
          col(s"__n_${st.name}").cast("double") / n1).as("conv_from_first"))
    }
    one.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
      .orderBy(col("stage_idx"))
  }
}
