package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a token array.
  *
  * Classic Charikar SimHash: each token hashes to 64 bits (FNV-1a — stable,
  * engine-independent, no dependency on Spark's internal hash evolution);
  * bit j votes +1/−1 into a 64-lane counter; the sign pattern is the
  * fingerprint. Near-identical documents differ in few bits, so Hamming
  * distance ≤ k finds near-dups. One pass per row, no shuffle — the whole
  * dedup pre-pass is map-side at any scale. Static-call doGenCode keeps the
  * expression inside whole-stage codegen (the O(tokens × 64) loop lives in
  * one JIT-friendly method).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[ArrayData])

  // static-call codegen: the expression stays inside whole-stage codegen,
  // the loop body lives in one JIT-friendly method
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimHash64$$.MODULE$$.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var t = 0
    while (t < arr.numElements()) {
      if (!arr.isNullAt(t)) {
        val h = fnv1a64(arr.getUTF8String(t))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L; var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** FNV-1a 64-bit over UTF-8 bytes — deterministic across engines/versions. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
