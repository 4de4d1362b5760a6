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

/** CHARACTER-window twin of RollingWindowHashes for multibyte text: one
  * hash per k-CHAR (code-point) window, each equal by construction to
  * PolyHash64 of that window's substring — i.e. the polynomial byte hash
  * of the window's UTF-8 bytes, rolled forward by removing the leading
  * code point's bytes and appending the trailing one's. Lands in the SAME
  * hash space as byte-rolled ASCII windows (equal strings → equal bytes →
  * equal hash), so multibyte docs can skip the per-window `substr`
  * enumeration (one string allocation per window) the fallback path of
  * substring dedup previously paid: O(bytes) total, zero allocation per
  * window beyond the output array. */
case class RollingCharWindowHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_char_window_hashes"

  override def nullSafeEval(v: Any): Any =
    RollingMinHash.computeAllChars(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.RollingMinHash$$.MODULE$$.computeAllChars($str, $k);")

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

  /** One hash per k-CODE-POINT window: polynomial over the window's UTF-8
    * bytes, so out(i) == polyWhole(v.substringSQL(i+1, k)) — verified by
    * spec against the substr-enumerated form. Short-text fallback matches
    * computeAll's (fnv1a64 of the whole string). Rolling step removes the
    * leading code point's 1–4 bytes (each needs B^(windowBytes−1−j), read
    * from a table sized to the widest window) and appends the trailing
    * code point's bytes — O(totalBytes) overall, no per-window substring. */
  def computeAllChars(v: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = v.getBytes
    // code-point start offsets: offs(c) = byte index of char c; offs(n) = len
    var nChars = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) nChars += 1
      b += 1
    }
    if (nChars < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(SimHash64.fnv1a64(v)))
    val offs = new Array[Int](nChars + 1)
    var c = 0
    b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) { offs(c) = b; c += 1 }
      b += 1
    }
    offs(nChars) = bytes.length
    val B = 257L
    // widest window in bytes bounds the power table
    var maxN = 0
    var i = 0
    while (i + k <= nChars) {
      val n = offs(i + k) - offs(i)
      if (n > maxN) maxN = n
      i += 1
    }
    val pows = new Array[Long](maxN)
    if (maxN > 0) pows(0) = 1L
    i = 1
    while (i < maxN) { pows(i) = pows(i - 1) * B; i += 1 }
    val out = new Array[Long](nChars - k + 1)
    var h = 0L
    b = offs(0)
    while (b < offs(k)) { h = h * B + (bytes(b) & 0xffL); b += 1 }
    out(0) = h
    i = 1
    while (i + k <= nChars) {
      val n = offs(i - 1 + k) - offs(i - 1) // byte length BEFORE this roll
      var m = offs(i - 1)
      var p = n - 1
      while (m < offs(i)) { h -= (bytes(m) & 0xffL) * pows(p); p -= 1; m += 1 }
      var a = offs(i + k - 1)
      while (a < offs(i + k)) { h = h * B + (bytes(a) & 0xffL); a += 1 }
      out(i) = h
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
