package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per group WITHOUT sorting.
  *
  * The built-in formulation (row_number() over a window + filter rn ≤ k)
  * must fully sort every partition by (group, order) — O(n log n) CPU and
  * full-partition sort buffers. This operator keeps a bounded k-element heap
  * per group: O(n log k), memory O(groups × k), no sort exchange — only the
  * hash shuffle on the group keys.
  *
  * The complete extension ladder (SURVEY §2 preference (c)):
  *  logical `TopKPerGroupNode` → `TopKStrategy` (planner) →
  *  `TopKPerGroupExec` (physical, requiredChildDistribution =
  *  ClusteredDistribution(group)) → `TopK.perGroup` Column-level API.
  *
  * Reference analog: the MR secondary-sort + reducer-early-exit idiom
  * (hadoop-mapreduce-examples SecondarySort.java:1 with a counting reducer)
  * — the MR version still paid the full shuffle sort; this one never sorts.
  */
case class TopKPerGroupNode(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                            k: Int, child: LogicalPlan) extends UnaryNode {
  override def output = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(group, ordering, k, child) =>
      TopKPerGroupExec(group, ordering, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Shared per-partition heap accumulation for both top-k exec nodes: one
  * bounded k-element PriorityQueue per group key (head = WORST kept row via
  * reverse ordering → O(log k) evict). State is bounded at
  * (groups-per-partition × k) rows and never spills: the operator targets
  * small-k per-key top-N where that product fits in task memory (the
  * requiredChildDistribution hash-partitions groups, so per-task group
  * counts shrink as parallelism grows). For huge k·groups the Window +
  * WindowGroupLimit path is the right plan — the rewrite rule only fires on
  * literal k ≤ MaxRewriteK, which keeps k bounded by design. */
private[plans] object TopKHeaps {
  def accumulate(iter: Iterator[InternalRow], keyProj: UnsafeProjection,
                 ord: Ordering[InternalRow], kk: Int)
      : java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val groups = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var pq = groups.get(key)
      if (pq == null) {
        pq = new java.util.PriorityQueue[InternalRow](kk + 1, ord.reverse)
        groups.put(key.copy(), pq)
      }
      if (pq.size < kk) pq.add(row.copy())
      else if (ord.compare(row, pq.peek()) < 0) { pq.poll(); pq.add(row.copy()) }
    }
    groups
  }
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                            k: Int, child: SparkPlan) extends UnaryExecNode {
  require(k >= 1, s"top-k per group requires k >= 1, got $k")
  override def output = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val group = groupExprs
    val order = ordering
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(group, childOutput)
      val ord = new LazilyGeneratedOrdering(order, childOutput)
      val groups = TopKHeaps.accumulate(iter, keyProj, ord, kk)
      import scala.jdk.CollectionConverters._
      groups.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Column-level API. Pass RESOLVED sort columns (df("c").desc / df("c")). */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, s"TopK.perGroup requires k >= 1, got $k") // fail on the driver, not as a task NPE
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    val plan = GraftBridge.logicalPlan(df)
    val groupExprs: Seq[Expression] = groupCols.map(c => GraftBridge.expr(df(c)))
    val sortOrders = orderBy.map(c => GraftBridge.expr(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftBridge.ofRows(spark, TopKPerGroupNode(groupExprs, sortOrders, k, plan))
  }
}
