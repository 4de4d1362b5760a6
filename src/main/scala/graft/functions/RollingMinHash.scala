package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing-style rolling-hash fingerprint.
  *
  * Polynomial rolling hash (base 257, 64-bit wraparound) over every k-byte
  * window of the UTF-8 text; returns the MINIMUM window hash — the classic
  * min-sampling fingerprint (Schleimer et al. 2003, "Winnowing: Local
  * Algorithms for Document Fingerprinting"). Identical documents share the
  * fingerprint; documents sharing any k-byte run that happens to contain the
  * global minimum also collide — the building block for content-defined
  * chunk dedup. O(bytes) per row, map-side. */
case class RollingMinHash(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override def nullSafeEval(v: Any): Any =
    RollingMinHash.compute(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.RollingMinHash$$.MODULE$$.compute($str, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinHash {
  def compute(v: UTF8String, k: Int): Long = {
    val bytes = v.getBytes
    if (bytes.length < k) return SimHash64.fnv1a64(v)
    val B = 257L
    // B^(k-1) with 64-bit wraparound (consistent on both add and remove side)
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var min = h
    while (i < bytes.length) {
      h = (h - (bytes(i - k) & 0xffL) * pow) * B + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }
}
