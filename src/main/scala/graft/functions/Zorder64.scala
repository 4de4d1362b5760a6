package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: 64-bit Morton (Z-order) interleave of two
  * integer keys — the multi-dimensional clustering key for data layout
  * (sort by z-value → files are rectangles in (a, b) space, so min/max
  * file stats prune scans on EITHER column's predicate, not just the
  * leading sort key).
  *
  * Takes the low 32 bits of each input; callers should pre-normalize
  * wide-domain or skewed columns (e.g. rank/quantile-bucket them) — at
  * 100 TB that normalization pass is the standard first step of a z-order
  * compaction job.
  */
case class Zorder64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override def nullSafeEval(a: Any, b: Any): Any =
    Zorder64.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Zorder64$$.MODULE$$.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Zorder64 {
  /** Spread the low 32 bits of v into the even bit positions of a long
    * (the classic Morton-code bit-twiddle, O(log bits) masks). */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
