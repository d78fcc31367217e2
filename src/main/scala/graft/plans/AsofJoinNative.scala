package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a FIRST-CLASS Catalyst operator — custom logical
  * node + planner strategy + physical sorted-merge plan (the full
  * extension tier of SURVEY §7.2(6): used where composition genuinely
  * leaves performance on the table).
  *
  * The composed form ([[graft.operators.AsofJoin.asofJoin]]) unions
  * both sides and runs a `last(_, ignoreNulls)` window: one shuffle +
  * sort over LEFT+RIGHT rows together, a null-padded union schema, a
  * per-row struct box, and a WindowExec buffer. This operator keeps
  * the same distribution contract (hash-cluster each side by key,
  * sort by (key, time) — EnsureRequirements co-partitions the sides
  * exactly as it does for a sort-merge join) but replaces
  * union+window with a per-partition two-pointer MERGE: each
  * partition streams both sorted sides once, carrying only the latest
  * preceding right payload per key — no union row inflation, no
  * window buffer, no struct boxing.
  *
  * Semantics (identical to the composed form, spec-pinned): for each
  * left row, the payload of the LATEST right row with the same key
  * and `right.ts <= left.ts` (inclusive), appended as nullable
  * `__asof_<col>` columns; right must be unique per (key, ts); keys
  * and timestamps must be non-null (the composed form's window
  * semantics for nulls are its own contract — this operator rejects
  * null keys/timestamps at runtime rather than silently diverging).
  */
object AsofJoinNative {

  /** Logical node. `outAttrs` carries the produced attribute identities
    * so copies (optimizer transforms) keep stable ExprIds.
    */
  case class AsofJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Attribute,
      leftTs: Attribute,
      rightKey: Attribute,
      rightTs: Attribute,
      payload: Seq[Attribute],
      outAttrs: Seq[AttributeReference])
      extends BinaryNode {

    override def output: Seq[Attribute] = left.output ++ outAttrs

    override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

    // every left column passes through and every named right column is
    // read — declared so ColumnPruning cannot strip them from under us
    override def references: AttributeSet =
      AttributeSet(left.output) ++ AttributeSet(Seq(rightKey, rightTs) ++ payload)

    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: AsofJoinPlan → AsofJoinExec. Injected via
    * `experimental.extraStrategies` by [[asofJoin]] (idempotent) and
    * by `GraftExtensions` for `spark.sql.extensions` users.
    */
  object AsofJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case p: AsofJoinPlan =>
        AsofJoinExec(planLater(p.left), planLater(p.right),
          p.leftKey, p.leftTs, p.rightKey, p.rightTs, p.payload, p.outAttrs) :: Nil
      case _ => Nil
    }
  }

  /** Physical sorted-merge as-of join. */
  case class AsofJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKey: Attribute,
      leftTs: Attribute,
      rightKey: Attribute,
      rightTs: Attribute,
      payload: Seq[Attribute],
      outAttrs: Seq[AttributeReference])
      extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ outAttrs

    // the sort-merge-join contract: cluster each side by its key;
    // EnsureRequirements makes the two hash partitionings compatible
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

    override def outputPartitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def doExecute(): RDD[InternalRow] = {
      val keyType = leftKey.dataType
      val tsType = leftTs.dataType
      val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
      val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
      val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
      val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
      require(lKeyIdx >= 0 && lTsIdx >= 0 && rKeyIdx >= 0 && rTsIdx >= 0,
        "as-of join columns not found in child output")
      val payloadExprs = payload
      val rightOutput = right.output
      val nPayload = payload.size

      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
        val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
        // projected candidate payloads are buffered across rows →
        // must be copies; the projection itself reuses its buffer
        val payloadProj = UnsafeProjection.create(payloadExprs, rightOutput)
        val nullRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nPayload)
        val joined = new JoinedRow
        // downstream contract: executed rows must be UnsafeRows (the
        // collect/shuffle paths cast) — project the JoinedRow out.
        // Payload slots must read as NULLABLE regardless of the source
        // column's nullability: the no-match row is all nulls
        val projInput = left.output ++ payloadExprs.map(_.withNullability(true))
        val resultProj = UnsafeProjection.create(projInput, projInput)

        new Iterator[InternalRow] {
          private var candidate: InternalRow = _
          private var candidateKey: Any = _
          private var rRow: InternalRow = _

          private def advanceRight(): Unit =
            rRow = if (rIt.hasNext) rIt.next() else null

          advanceRight()

          override def hasNext: Boolean = lIt.hasNext

          override def next(): InternalRow = {
            val l = lIt.next()
            val lKey = l.get(lKeyIdx, keyType)
            val lTs = l.get(lTsIdx, tsType)
            require(lKey != null && lTs != null,
              "as-of join requires non-null keys and timestamps")
            // consume right rows up to (key, ts]; the last one seen
            // for this key is the as-of match
            var loop = true
            while (loop && rRow != null) {
              val rKey = rRow.get(rKeyIdx, keyType)
              val rTs = rRow.get(rTsIdx, tsType)
              require(rKey != null && rTs != null,
                "as-of join requires non-null keys and timestamps")
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0 || (c == 0 && tsOrd.compare(rTs, lTs) <= 0)) {
                candidate = payloadProj(rRow).copy()
                candidateKey = InternalRow.copyValue(rKey)
                advanceRight()
              } else loop = false
            }
            val matched = candidate != null && keyOrd.compare(candidateKey, lKey) == 0
            resultProj(joined(l, if (matched) candidate else nullRow))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** THE idempotent strategy registration — one guard, called by
    * [[asofJoin]], [[GraftOptimizations.install]], and (via
    * injectPlannerStrategy) GraftExtensions; any install-discipline
    * change happens here once.
    */
  def installStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
  }

  /** Builder: resolve columns on the analyzed children, register the
    * strategy (idempotent), and wrap the custom node back into a
    * DataFrame. Output schema = left columns + `__asof_<c>` per
    * payload column — exactly [[graft.operators.AsofJoin.asofJoin]].
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(!payloadCols.contains(key))
    val spark = left.sparkSession
    installStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    val overlap = lPlan.outputSet.intersect(rPlan.outputSet)
    require(overlap.isEmpty,
      s"as-of join sides share attributes ($overlap) — re-read or alias one side")
    val payload = payloadCols.map(resolve(rPlan, _))
    val outAttrs = payload.map(a =>
      AttributeReference(s"__asof_${a.name}", a.dataType, nullable = true)())
    GraftSqlShim.ofRows(spark,
      AsofJoinPlan(lPlan, rPlan,
        resolve(lPlan, key), resolve(lPlan, leftTsCol),
        resolve(rPlan, key), resolve(rPlan, rightTsCol),
        payload, outAttrs))
  }
}
