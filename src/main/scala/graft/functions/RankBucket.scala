package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: rank bucket of a value against a sorted
  * boundary array — binary search returning |{b : b ≤ v}| (the upper-bound
  * index), i.e. which of the `boundaries.length + 1` quantile buckets the
  * value falls in.
  *
  * The boundaries are MODEL STATE (same pattern as NearestCentroids): a
  * bounded driver-side array (≤ 2^bits quantiles) carried in the expression
  * and shipped with the plan. Replaces the `size(filter(typedlit(bounds),
  * b => b <= v))` higher-order-function form, whose lambda is INTERPRETED
  * and linear in the boundary count — this is codegen'd and O(log n) per
  * row, which matters when the layout job rewrites 100 TB. */
case class RankBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {

  require(boundaries.nonEmpty, "rank_bucket: empty boundary array")

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rank_bucket"

  override def nullSafeEval(v: Any): Any =
    RankBucket.compute(v.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boundsRef = ctx.addReferenceObj("rankBounds", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RankBucket$$.MODULE$$.compute($v, $boundsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RankBucket {

  /** Count of boundaries ≤ v: first index with boundaries(i) > v. Boundaries
    * must be sorted ascending (approxQuantile output); duplicates (a heavy
    * value spanning several quantiles) are handled by the strict upper
    * bound — all copies count, matching the HOF filter form exactly.
    *
    * NaN: Spark SQL's `<=` orders NaN above every double, so the replaced
    * HOF form returned bounds.length for NaN keys; Java's `<=` is false for
    * NaN and would silently send them to bucket 0. Match the SQL ordering
    * explicitly — NaN keys land in the last bucket. */
  def compute(v: Double, bounds: Array[Double]): Long = {
    if (java.lang.Double.isNaN(v)) return bounds.length.toLong
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}
