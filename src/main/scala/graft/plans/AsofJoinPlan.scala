package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, BindReferences, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: the whole-operator extension tier (custom
  * LogicalPlan + Strategy + SparkPlan) for the operator the composed
  * formulation in [[graft.ops.TemporalOps.asofJoin]] builds from
  * union+window. Semantics are identical (backward as-of: each probe row
  * attaches the latest build row with equal keys and build time <= probe
  * time, ties broken by the greatest `tiebreak`); the physical plan is
  * the part that differs:
  *
  *   - both children hash-cluster on the join keys (EnsureRequirements
  *     co-partitions them exactly as it does for SortMergeJoin) and sort
  *     by (keys, time) — the SAME single shuffle the composed form pays;
  *   - the merge is then one streaming pointer pass per partition: no
  *     union row-widening (the composed form carries probe ∪ build
  *     columns through the sort), no window-function state, and the
  *     build side's attach columns are projected once per accepted row.
  *
  * At 100 TB the shuffle dominates either way; what the native operator
  * buys is the memory profile — the sorter never sees widened rows, and
  * nothing is buffered beyond one attach row per key run.
  */
object AsofJoinPlan {

  /** Logical node. Children arrive analyzed (built from DataFrames), so
    * all expressions are resolved attributes; `attachOut` are the fresh
    * output attributes (`asof_<name>`, nullable) this operator produces
    * for the attached build columns. */
  case class AsofJoin(
      left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTime: Attribute, rightTime: Attribute, rightTiebreak: Attribute,
      attach: Seq[Attribute], attachOut: Seq[Attribute]) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ attachOut
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(attachOut)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
      copy(left = newLeft, right = newRight)
  }

  object AsofJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoin(l, r, lk, rk, lt, rt, tb, attach, attachOut) =>
        AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb,
          attach, attachOut) :: Nil
      case _ => Nil
    }
  }

  case class AsofJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
      leftTime: Expression, rightTime: Expression, rightTiebreak: Expression,
      attach: Seq[Attribute], attachOut: Seq[Attribute]) extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ attachOut
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(attachOut)

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    // Sorted by (keys, time) on both sides; build additionally by the
    // tiebreak so the LAST row accepted at an equal time is the greatest.
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) ++
        Seq(SortOrder(rightTime, Ascending), SortOrder(rightTiebreak, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def doExecute(): RDD[InternalRow] = {
      val keyTypes = leftKeys.map(_.dataType)
      val timeType = leftTime.dataType
      val numAttach = attach.length
      // serializable locals for the closure
      val lKeys = leftKeys; val rKeys = rightKeys
      val lTime = leftTime; val rTime = rightTime
      val lOut = left.output; val rOut = right.output
      val attachAttrs = attach

      left.execute().zipPartitions(right.execute()) { (probeIter, buildIter) =>
        val probeKeyProj = UnsafeProjection.create(lKeys, lOut)
        val buildKeyProj = UnsafeProjection.create(rKeys, rOut)
        val probeTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
        val buildTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
        val attachProj = UnsafeProjection.create(attachAttrs, rOut)
        val resultProj = UnsafeProjection.create(
          (lOut ++ attachAttrs).map(_.dataType).toArray)
        val keyOrd = keyOrdering(keyTypes)
        val timeOrd = nullFirst(
          PhysicalDataType.ordering(timeType).asInstanceOf[Ordering[Any]])
        val nullRow = new GenericInternalRow(numAttach)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var lookahead: InternalRow = _        // next unconsumed build row
          private var lookKey: InternalRow = _
          private var lastKey: InternalRow = _          // key of lastAttach
          private var lastAttach: InternalRow = _       // attach cols of latest accepted build row

          override def hasNext: Boolean = probeIter.hasNext

          override def next(): InternalRow = {
            val p = probeIter.next()
            val pk = probeKeyProj(p)
            val pt = probeTimeProj(p).copy()
            // advance the build side to the probe's (key, time) frontier
            var done = false
            while (!done) {
              if (lookahead == null) {
                if (buildIter.hasNext) {
                  lookahead = buildIter.next()
                  lookKey = buildKeyProj(lookahead)
                } else done = true
              }
              if (lookahead != null) {
                val c = keyOrd.compare(lookKey, pk)
                if (c < 0) {
                  lookahead = null                       // key fully behind: drop
                } else if (c == 0 &&
                    timeOrd.lteq(buildTimeProj(lookahead).get(0, timeType),
                      pt.get(0, timeType))) {
                  lastAttach = attachProj(lookahead).copy()
                  lastKey = lookKey.copy()
                  lookahead = null
                } else done = true                       // ahead of the frontier
              }
            }
            val matches = lastAttach != null && lastKey != null &&
              keyOrd.compare(lastKey, pk) == 0
            resultProj(joined(p, if (matches) lastAttach else nullRow))
          }
        }
      }
    }

    /** Null-safe wrapper: nulls order FIRST and equal to each other —
      * the same semantics the composed union+window form gets for free
      * (window partitionBy groups null keys together; ascending sort
      * defaults to NullsFirst, so a null build time reads as −∞ and a
      * null-time probe sees only null-time build rows). Matches
      * [[requiredChildOrdering]]'s Ascending/NullsFirst sort, so the
      * merge frontier and the physical sort always agree. */
    private def nullFirst(ord: Ordering[Any]): Ordering[Any] =
      new Ordering[Any] {
        override def compare(a: Any, b: Any): Int =
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else ord.compare(a, b)
      }

    private def keyOrdering(
        types: Seq[org.apache.spark.sql.types.DataType]): Ordering[InternalRow] =
      new Ordering[InternalRow] {
        private val ords = types.map(t => nullFirst(
          PhysicalDataType.ordering(t).asInstanceOf[Ordering[Any]])).toArray
        private val ts = types.toArray
        override def compare(a: InternalRow, b: InternalRow): Int = {
          var i = 0
          while (i < ords.length) {
            val c = ords(i).compare(a.get(i, ts(i)), b.get(i, ts(i)))
            if (c != 0) return c
            i += 1
          }
          0
        }
      }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Idempotently make the planner aware of [[AsofJoin]]. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** Public API — same signature and semantics as
    * [[graft.ops.TemporalOps.asofJoin]], planned natively. Attached
    * columns surface as `asof_<name>` (nullable: probes with no prior
    * build row get nulls). */
  def asof(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTime: String, buildTime: String, tiebreak: String,
      attach: Seq[String]): DataFrame = {
    val spark = probe.sparkSession
    install(spark)
    val lp = probe.queryExecution.analyzed
    // Re-alias every right-side column to a fresh exprId: probe and build
    // typically share lineage (self-as-of over one table), and the
    // analyzer's DeduplicateRelations renumbers conflicting child ids
    // without rewriting a custom node's expression fields. With the
    // conflict removed up front, nothing needs rewriting.
    val rp = {
      val analyzed = build.queryExecution.analyzed
      org.apache.spark.sql.catalyst.plans.logical.Project(
        analyzed.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        analyzed)
    }
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val attachSrc = attach.map(attr(rp, _))
    val attachOut = attachSrc.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    val lKeys = keys.map(attr(lp, _)); val rKeys = keys.map(attr(rp, _))
    val lTime = attr(lp, probeTime); val rTime = attr(rp, buildTime)
    // The merge reads BOTH sides' projected rows with the LEFT side's
    // physical types (AsofJoinExec.keyTypes/timeType) — a type mismatch
    // would not error, it would decode the right side's UnsafeRows at
    // the wrong widths and compare garbage. Refuse it up front; callers
    // cast explicitly, so the cast shows in their plan.
    require(keys.nonEmpty, "asof join requires at least one key column")
    lKeys.lazyZip(rKeys).lazyZip(keys).foreach { (l, r, n) =>
      require(org.apache.spark.sql.types.DataType.equalsIgnoreNullability(l.dataType, r.dataType),
        s"asof key '$n' types differ: probe ${l.dataType.sql} vs " +
          s"build ${r.dataType.sql}; cast one side first") }
    require(org.apache.spark.sql.types.DataType.equalsIgnoreNullability(
      lTime.dataType, rTime.dataType),
      s"asof time types differ: probe '$probeTime' ${lTime.dataType.sql} " +
        s"vs build '$buildTime' ${rTime.dataType.sql}; cast one side first")
    GraftBridge.ofRows(spark, AsofJoin(lp, rp,
      lKeys, rKeys, lTime, rTime, attr(rp, tiebreak),
      attachSrc, attachOut))
  }
}
