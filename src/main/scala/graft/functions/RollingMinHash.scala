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

/** Verify-support twin of RollingMinHash: ALL k-byte window hashes as
  * array<long> (same polynomial hash, same short-text fallback), so the
  * per-doc min reduction can be oracle-checked over a materialized
  * (doc_id, h) relation — `min(array)` must equal `rolling_min_hash`. */
case class RollingWindowHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_hashes"

  override def nullSafeEval(v: Any): Any =
    RollingMinHash.computeAll(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.RollingMinHash$$.MODULE$$.computeAll($str, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-string polynomial hash in RollingWindowHashes' hash space: for a
  * string of exactly k bytes, poly_hash64(s) == the single k-byte window
  * hash rolling_window_hashes(s, k)(0). Lets a char-window enumerated via
  * substr (the non-ASCII fallback path of substring dedup) land in the SAME
  * dup-detection hash space as byte-rolled windows from ASCII docs — equal
  * strings always collide, whichever path enumerated them. */
case class PolyHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"

  override def nullSafeEval(v: Any): Any =
    RollingMinHash.polyWhole(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.RollingMinHash$$.MODULE$$.polyWhole($str);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinHash {

  /** h = Σ byte·B^i over ALL bytes — identical arithmetic to one
    * computeAll window when the string is exactly k bytes long. */
  def polyWhole(v: UTF8String): Long = {
    val bytes = v.getBytes
    val B = 257L
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    h
  }
  /** Every window hash, in position order (the relation the oracle reduces).
    * Must stay in lockstep with compute(): same base, same wraparound, same
    * short-text fallback. */
  def computeAll(v: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = v.getBytes
    if (bytes.length < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(SimHash64.fnv1a64(v)))
    val B = 257L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val out = new Array[Long](bytes.length - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    out(0) = h
    while (i < bytes.length) {
      h = (h - (bytes(i - k) & 0xffL) * pow) * B + (bytes(i) & 0xffL)
      out(i - k + 1) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

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
