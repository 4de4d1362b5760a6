package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: MinHash signature of a pre-hashed shingle set.
  *
  * Input: array<bigint> of base hashes in [0, P). Output: array<bigint> of
  * length numPerms, lane p = min over shingles of (h·a_p + b_p) mod P with
  * P = 2^31−1 and deterministic planning-time coefficients.
  *
  * Why native: the composable form — transform(sequence(0,127), i →
  * array_min(transform(hs, …))) — runs in the INTERPRETED higher-order-
  * function path, and Catalyst freely inlines it into downstream lambda
  * consumers, re-evaluating the full O(perms×shingles) computation per
  * reference (measured 878 s for 5 000 docs at sf0.1). This tight eval loop
  * does ~6.6k long ops per doc: ~0.1 s for the same input; codegen emits a
  * static call so the expression stays inside whole-stage codegen.
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val (as, bs) = MinHashSignature.coeffs(numPerms)

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, hs =>
      s"${ev.value} = graft.functions.MinHashSignature$$.MODULE$$.compute($hs, $asRef, $bsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def compute(hs: ArrayData, as: Array[Long], bs: Array[Long]): GenericArrayData = {
    val numPerms = as.length
    val n = hs.numElements()
    val out = new Array[Long](numPerms)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var p = 0
        while (p < numPerms) {
          val x = (h * as(p) + bs(p)) % P
          if (x < out(p)) out(p) = x
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  val P = 2147483647L // 2^31−1: h < P and a < 2^31 keep h·a+b < 2^62 (no overflow)

  /** Deterministic data-free coefficients (same LCG as DedupOps.permCoeffs). */
  def coeffs(numPerms: Int): (Array[Long], Array[Long]) = {
    var state = 20240812L
    def next(): Long = { state = (state * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffL; state }
    val a = Array.fill(numPerms)(next() | 1L)
    val b = Array.fill(numPerms)(next())
    (a, b)
  }
}
