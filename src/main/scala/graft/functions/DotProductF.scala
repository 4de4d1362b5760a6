package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two float vectors (double
  * products, double accumulation — same numerics as CosineSimilarity's dot
  * term, bit-for-bit).
  *
  * Exists so pairwise similarity joins can factor the norms OUT of the hot
  * loop: cosine over a candidate pair costs one dot here plus two
  * premultiplied per-vector norms, instead of CosineSimilarity's three
  * accumulators per pair — ~3x fewer flops where the pair count, not the
  * vector count, dominates (verified-candidate stages of near-dup joins).
  * `dot / (sqrt_norm_a * sqrt_norm_b)` with norms computed as
  * `sqrt(dot_f(v, v))` is IEEE-identical to `cosine_sim(a, b)`: same
  * products, same order, and sqrt is correctly rounded — so oracle parity
  * and the all-pairs spec twin are unaffected. (Holds for equal-length
  * vectors — cosine_sim truncates its norm sums to the common prefix of a
  * ragged pair, a case fixed-dimension embedding corpora never hit.)
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
