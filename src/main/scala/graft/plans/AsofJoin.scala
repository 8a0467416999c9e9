package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** AS-OF join as a first-class Catalyst operator — the (c)-tier custom
  * operator of the builder brief: a [[LogicalPlan]] node, a
  * [[SparkStrategy]], and a [[SparkPlan]] with its own distribution and
  * ordering requirements, attachable via `SparkSessionExtensions` or
  * `spark.experimental.extraStrategies`.
  *
  * Semantics (LEFT OUTER AS-OF): every left row picks the right row with
  * the greatest `rightTime <= leftTime` among rows with equal keys; left
  * rows without a qualifying match emit null right columns. Null keys and
  * null times never match (SQL equi-join convention). Ties on
  * `(rightKeys, rightTime)` are caller-resolved (pre-deduplicate) — same
  * contract as DuckDB's ASOF JOIN.
  *
  * Why a physical operator instead of the union+window formulation
  * (`EventQueries.asofAttribution`): same asymptotics (one hash exchange
  * per side + in-partition sort), but the merge is a single streaming
  * pass over the two sorted iterators — no window-function state, no
  * union schema padding, no second pass to split sides back apart, and
  * O(1) memory per partition. At 100 TB both sides shuffle only on the
  * join keys; EnsureRequirements plans the exchanges/sorts from the
  * declared requirements exactly as for a sort-merge join.
  */
final case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] onto [[AsofJoinExec]]. Validates side-ownership and
  * type agreement HERE so every construction path is covered — the
  * [[Asof.join]] DataFrame API pre-checks with friendlier errors, but the
  * SQL path ([[AsofSql]]) builds the node from analyzer-resolved
  * attributes and reaches planning without those checks. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      val lSide = lk :+ lt
      val rSide = rk :+ rt
      // a key resolved against the wrong side would fail attribute
      // binding at execution with an opaque error — or worse, bind by
      // coincidence; refuse at planning instead
      require(lSide.forall(_.references.subsetOf(l.outputSet)),
        "asof join: left keys/time must reference only left-side columns")
      require(rSide.forall(_.references.subsetOf(r.outputSet)),
        "asof join: right keys/time must reference only right-side columns")
      // the exec builds its row orderings from the LEFT side's types and
      // applies them to BOTH projections — mismatched types would read
      // wrong slot widths and corrupt comparisons silently
      lSide.map(_.dataType).zip(rSide.map(_.dataType)).zipWithIndex.foreach {
        case ((a, b), i) => require(a == b,
          s"asof join: type mismatch at position $i: $a vs $b " +
            "(cast the sides to matching types first)")
      }
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** SQL surface for the as-of operator — a TABLE-VALUED FUNCTION so plain
  * `spark.sql` can plan [[AsofJoinExec]] (Spark's parser has no ASOF
  * JOIN syntax to hook):
  *
  * {{{
  * SELECT * FROM graft_asof('purchases', 'clicks',
  *                          'user_id', 'c_user', 'ts', 'click_ts')
  * }}}
  *
  * Arguments (all string literals): left/right table or view names
  * (multipart `db.tbl` accepted), comma-separated key column lists, and
  * the two time columns. The builder emits [[AsofJoin]] over
  * `UnresolvedRelation`s with `UnresolvedAttribute` keys; the analyzer
  * resolves both exactly as it would for a hand-written operator, then
  * [[AsofJoinStrategy]] (injected via `GraftExtensions` at build time or
  * `GraftFunctions.register` on a live session) plans the physical
  * sorted-merge pass. Column names across the two sides must be disjoint
  * (alias first), same contract as [[Asof.join]]. */
object AsofSql {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
  import org.apache.spark.sql.types.StringType

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_asof")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[AsofJoin].getName, "graft_asof")

  val builder: Seq[Expression] => LogicalPlan = { children =>
    require(children.length == 6,
      "graft_asof expects (left_table, right_table, left_keys, " +
        s"right_keys, left_time, right_time), got ${children.length} arguments")
    val argNames = Seq("left_table", "right_table", "left_keys",
      "right_keys", "left_time", "right_time")
    def str(i: Int): String = children(i) match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_asof: ${argNames(i)} must be a string literal, got $other")
    }
    // real identifier parsing, not split('.'): a backquoted part or a
    // view name containing a literal dot must survive intact
    def rel(i: Int) = UnresolvedRelation(
      org.apache.spark.sql.SparkSession.active.sessionState.sqlParser
        .parseMultipartIdentifier(str(i)))
    def cols(i: Int) = str(i).split(',').toIndexedSeq
      .map(c => UnresolvedAttribute.quoted(c.trim))
    val (lk, rk) = (cols(2), cols(3))
    require(lk.length == rk.length,
      s"graft_asof: ${lk.length} left keys vs ${rk.length} right keys")
    AsofJoin(rel(0), rel(1), lk, rk,
      UnresolvedAttribute.quoted(str(4).trim),
      UnresolvedAttribute.quoted(str(5).trim))
  }

  /** The injection triple for `SparkSessionExtensions.injectTableFunction`
    * / `TableFunctionRegistry.registerFunction`. */
  def injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (identifier, info, builder)
}

/** Partition-local sorted-merge AS-OF join. Children are hash-clustered
  * on the join keys and sorted by (keys, time), so one forward pass per
  * partition joins both sides: right rows are consumed while their
  * (keys, time) prefix is <= the current left row's, remembering the
  * latest consumed row; key equality decides match vs null. O(n + m)
  * time, O(1) rows of state. */
final case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  /** Left rows stream through in order, so the left child's partitioning
    * and ordering survive. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of rows with an as-of match"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKT = leftKeys :+ leftTime
    val rKT = rightKeys :+ rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val ktTypes = lKT.map(_.dataType)
    val allOut = output
    val nRight = rOut.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKtProj = UnsafeProjection.create(lKT, lOut)
      val rKtProj = UnsafeProjection.create(rKT, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val ktOrd = RowOrdering.createNaturalAscendingOrdering(ktTypes)
      val outProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)

      new Iterator[InternalRow] {
        // lookahead right row + its (keys, time) projection, both copied
        // (Unsafe buffers are reused by the child iterator)
        private var rRow: InternalRow = _
        private var rKt: InternalRow = _
        // latest right row consumed by the merge and its key prefix
        private var lastRow: InternalRow = _
        private var lastKt: InternalRow = _
        advance()

        private def advance(): Unit = {
          rRow = null; rKt = null
          while (rRow == null && rIter.hasNext) {
            val r = rIter.next()
            val kt = rKtProj(r)
            // null key or null time on the right can never match
            if (!kt.anyNull) { rRow = r.copy(); rKt = kt.copy() }
          }
        }

        // key prefix of a (keys, time) row for equality checks: the two
        // orderings agree because keys are a prefix of the kt row
        private def sameKey(a: InternalRow, b: InternalRow): Boolean =
          keyOrd.compare(a, b) == 0

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkt = lKtProj(l)
          numOutputRows += 1
          if (lkt.anyNull) {
            outProj(joined(l, nullRight))
          } else {
            while (rKt != null && ktOrd.compare(rKt, lkt) <= 0) {
              lastRow = rRow; lastKt = rKt
              advance()
            }
            if (lastRow != null && sameKey(lastKt, lkt)) {
              numMatched += 1
              outProj(joined(l, lastRow))
            } else outProj(joined(l, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API for the AS-OF join operator. */
object Asof {

  /** Idempotently install [[AsofJoinStrategy]] on a live session — the
    * runtime path for sessions not built with `GraftExtensions`. */
  def installStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  /** `left ASOF LEFT JOIN right ON keys AND leftTime >= rightTime`.
    * Column names across the two sides must be disjoint (alias the right
    * side); installs [[AsofJoinStrategy]] on the session if absent. */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    installStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    // the clash guard and column lookup must use the SESSION's resolver:
    // under default case-insensitive resolution a left 'ts' and right
    // 'TS' would pass an exact-string check here only to make every
    // downstream select("ts") throw AMBIGUOUS_REFERENCE
    val resolver = spark.sessionState.conf.resolver
    val clash = lPlan.output.map(_.name)
      .filter(l => rPlan.output.exists(r => resolver(l, r.name)))
    require(clash.isEmpty,
      s"asof join requires disjoint column names; clashing: $clash")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(a => resolver(a.name, n)).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val lk = leftKeys.map(attr(lPlan, _))
    val rk = rightKeys.map(attr(rPlan, _))
    val lt = attr(lPlan, leftTime)
    val rt = attr(rPlan, rightTime)
    // the exec's row orderings are built from the LEFT side's types and
    // applied to BOTH sides' projections — mismatched types would read
    // the wrong slot widths and corrupt comparisons silently
    (lk.map(_.dataType) :+ lt.dataType)
      .zip(rk.map(_.dataType) :+ rt.dataType).zipWithIndex.foreach {
        case ((a, b), i) => require(a == b,
          s"asof join: type mismatch at position $i: $a vs $b " +
            "(cast the sides to matching types first)")
      }
    GraftBridge.ofRows(spark, AsofJoin(lPlan, rPlan, lk, rk, lt, rt))
  }
}
