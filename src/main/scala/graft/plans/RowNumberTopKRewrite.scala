package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Optimizer rule: the canonical SQL top-k idiom
  *
  *   SELECT * FROM (SELECT …, row_number() OVER (PARTITION BY g ORDER BY o)
  *                  AS rn FROM t) WHERE rn <= k
  *
  * plans as Window (full per-partition sort of t) + Filter. This rule
  * rewrites the exact Filter∘Window(row_number) pattern to
  * `TopKRankedNode` — bounded per-group heaps, O(n log k), no sort — while
  * PRESERVING the rank column (same exprId, so downstream references
  * resolve unchanged). Conservative guards: single row_number window
  * expression, non-empty partition/order specs, pure `rn <= k` / `rn < k`
  * literal predicate. Injected via GraftExtensions.injectOptimizerRule. */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, orderSpec, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      boundFromCond(cond, alias.toAttribute) match {
        case Some(k) if k > 0 =>
          TopKRankedNode(partitionSpec, orderSpec, k, alias.toAttribute, child)
        case _ => f
      }
    // Same idiom with an integral-cast projection in between — the common
    // `.withColumn("rn", row_number().over(w).cast("long")).filter(…)`
    // DataFrame shape: Filter(cast_rn <= k, Project(…, Cast(rn)…, Window)).
    // The cast is monotonic, so bounding the cast output bounds the rank.
    // projList must be deterministic: the rewrite evaluates the projection
    // only for the k kept rows instead of every window row, which changes
    // the values a rand()/monotonically_increasing_id() projection would
    // produce (same guard Catalyst's own filter/project pushdown uses).
    case f @ Filter(cond, Project(projList,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          projList.forall(_.deterministic) =>
      val rn = alias.toAttribute
      val boundable = rn +: projList.collect {
        case a @ Alias(c: Cast, _)
            if c.child.semanticEquals(rn) &&
               (c.dataType == LongType || c.dataType == IntegerType) => a.toAttribute
      }
      boundable.iterator.map(attr => boundFromCond(cond, attr))
          .collectFirst { case Some(k) if k > 0 => k } match {
        case Some(k) =>
          Project(projList, TopKRankedNode(partitionSpec, orderSpec, k, rn, child))
        case _ => f
      }
  }

  /** Rewrite only for k up to this cap: the heap exec holds k rows per group
    * in task memory with no spill path, so a huge literal k (e.g. a no-op
    * `rn <= 2^31-1` filter) must stay on Spark's spilling WindowExec /
    * WindowGroupLimit plan. 10k rows × row size is comfortably in-budget for
    * any task; beyond it the sort-based path is the right plan anyway. */
  private val MaxRewriteK = 10000

  /** rn <= k / rn < k / k >= rn / k > rn with an int or long literal. */
  private object IntLikeLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case IntegerLiteral(k) => Some(k.toLong)
      case Literal(k: Long, LongType) => Some(k)
      case _ => None
    }
  }

  /** Bound math in Long (a `rn < Int.MinValue` literal must not wrap to a
    * huge positive k), then gated to (0, MaxRewriteK]. */
  private def boundFromCond(cond: Expression, rn: Attribute): Option[Int] = {
    val raw: Option[Long] = cond match {
      case LessThanOrEqual(a: Attribute, IntLikeLiteral(k)) if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntLikeLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(IntLikeLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
      case GreaterThan(IntLikeLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, IntLikeLiteral(1L)) if a.semanticEquals(rn) => Some(1L)
      case _ => None
    }
    raw.filter(k => k > 0 && k <= MaxRewriteK).map(_.toInt)
  }
}

/** Logical top-k-per-group WITH rank output (child.output :+ rank). */
case class TopKRankedNode(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, rankAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  override def output = child.output :+ rankAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKRankedStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKRankedNode(group, ordering, k, rankAttr, child) =>
      TopKRankedExec(group, ordering, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical: bounded heap per group, then per-group sort of ≤k rows to
  * assign ranks 1..k — O(n log k + groups·k log k), never a full sort. */
case class TopKRankedExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  require(k >= 1, s"ranked top-k requires k >= 1, got $k")
  override def output = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val outAttrs = output
    val group = groupExprs
    val order = ordering
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(group, childOutput)
      val ord = new LazilyGeneratedOrdering(order, childOutput)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val groups = TopKHeaps.accumulate(iter, keyProj, ord, kk)
      import scala.jdk.CollectionConverters._
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      groups.values().iterator().asScala.flatMap { pq =>
        val rows = pq.iterator().asScala.toArray.sorted(ord)
        rows.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, i + 1)
          outProj(joined(r, rankRow)).copy(): InternalRow
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
