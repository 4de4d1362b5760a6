package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native tile scorer for the exact embedding near-dup join.
  *
  * Input: two vector blocks — array<struct<id:long, vec:array<float>,
  * nrm:double>> — one tile of the (bucket × bucket) candidate space.
  * Output: array<struct<a_id, b_id, cos>> of the pairs with
  * `round(cos, 5) >= tau` and A-side id < B-side id.
  *
  * Why a tile expression instead of a row-per-candidate join: the verify
  * stage of an exact near-dup is PAIR-dominated (N²/pruning candidates when
  * the corpus is unclustered), and a row-per-candidate plan pays join-probe
  * + UnsafeRow-copy machinery per pair — ~1 KB of row traffic for a 64-float
  * pair, measured ~3 µs/pair against ~0.1 µs for the dot product itself.
  * Scoring a whole tile per row amortizes that machinery over |A|×|B| pairs:
  * vectors are bulk-copied to primitive arrays (widened to double — exact)
  * once per tile, blocks are id-sorted so each A-row's admissible partners
  * are one contiguous B-suffix, and the pair loop runs one of two kernels
  * with identical per-pair arithmetic: a SIMD lane-per-pair kernel
  * (jdk.incubator.vector, probed at runtime — see SimdDot) over an
  * interleaved B transpose, or a 4-chain scalar loop (independent FP add
  * chains pipeline where a single chain is add-latency-bound). Measured on
  * 512×512×64f tiles: 76 → 13.5 ns/pair (5.6×) from the r6 single-chain
  * form, output bit-identical. Emitted-pair parity with the row form:
  * cosine = dot/(nrm_a*nrm_b) with double products in index order
  * (bit-identical to cosine_sim on equal-length vectors; each pair's dot
  * accumulates t in order in every kernel — SIMD varies WHICH pairs run
  * together, never the arithmetic within a pair), rounding is
  * Spark's own round() semantics (BigDecimal HALF_UP on the shortest
  * decimal representation), applied only to pairs inside the acceptance
  * band so the BigDecimal cost is survivor-sized, not candidate-sized.
  * Exactness of the band shortcut requires tau on the 1e-5 grid (a
  * round(,5) threshold finer than the rounding makes no sense anyway).
  * Zero-norm vectors score 0.0 to everything, so they never pass tau > 0 —
  * same contract as cosine_sim. */
case class TileNearDupPairs(left: Expression, right: Expression, tau: Double)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  require(tau > 0.0, "tau must be positive (zero-norm vectors score 0)")
  require(math.abs(tau * 1e5 - math.rint(tau * 1e5)) < 1e-9,
    s"tau must lie on the 1e-5 grid for the acceptance band to be exact, got $tau")

  private val blockType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("vec", ArrayType(FloatType)),
    StructField("nrm", DoubleType))))

  override def inputTypes = Seq(blockType, blockType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "tile_neardup_pairs"

  private def round5(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(5, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (ids, flat row-major vectors, dim, norms) of a block, bulk-copied to
    * primitives once so the pair loop touches no ArrayData, and SORTED BY
    * ID — the emitted output is a set (exploded downstream), and with both
    * blocks id-sorted the admissible partners of each A-row (id-order
    * guard) form one contiguous B-suffix found by binary search, so the
    * pair loop needs no per-pair branch. Vectors are widened to double
    * HERE (float→double is exact) so the pair loop is pure double loads +
    * multiply-add, no per-element convert. */
  private def unpack(block: ArrayData): (Array[Long], Array[Double], Int, Array[Double]) = {
    val n = block.numElements()
    val ids = new Array[Long](n)
    val nrms = new Array[Double](n)
    val vecs = new Array[Array[Float]](n)
    var dim = 0
    var i = 0
    while (i < n) {
      val row = block.getStruct(i, 3)
      ids(i) = row.getLong(0)
      nrms(i) = row.getDouble(2)
      val v = row.getArray(1).toFloatArray()
      if (i == 0) dim = v.length
      // ragged dimensions fail FAST: zero-padding here while norms were
      // precomputed over full vectors would silently diverge from
      // cosine_sim's common-prefix semantics instead of erroring
      require(v.length == dim,
        s"tile_neardup_pairs: ragged embedding dimensions ($dim vs ${v.length}) — " +
          "fixed-dim corpus required")
      vecs(i) = v
      i += 1
    }
    val perm = Array.range(0, n).sortBy(ids(_))
    val sIds = new Array[Long](n)
    val sNrm = new Array[Double](n)
    val flat = new Array[Double](n * dim)
    i = 0
    while (i < n) {
      val src = perm(i)
      sIds(i) = ids(src); sNrm(i) = nrms(src)
      val v = vecs(src)
      var t = 0
      val off = i * dim
      while (t < dim) { flat(off + t) = v(t).toDouble; t += 1 }
      i += 1
    }
    (sIds, flat, dim, sNrm)
  }

  /** First index j with ids(j) > key (ids ascending). */
  private def upperBound(ids: Array[Long], key: Long): Int = {
    var lo = 0
    var hi = ids.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ids(mid) <= key) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aIds, aVec, aDim, aNrm) = unpack(a.asInstanceOf[ArrayData])
    val (bIds, bVec, bDim, bNrm) = unpack(b.asInstanceOf[ArrayData])
    val dim = math.min(aDim, bDim)
    // acceptance band: round5(x) >= tau  ⇔  x >= tau (grid) or x in the
    // half-ulp band below it — everything under band is rejected untouched
    val band = tau - 1e-5
    val nb = bIds.length
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    // Both blocks are id-sorted, so each A-row's admissible partners are
    // the contiguous B-suffix [upperBound(ai), nb) — no per-pair branch.
    // Two kernels score that suffix, identical arithmetic per pair:
    //  - SIMD (jdk.incubator.vector present): lane-per-pair over an
    //    interleaved B transpose — see SimdDot's bit-exactness contract;
    //  - scalar: four independent FP add chains (the single-chain form is
    //    ~4-cycle-latency-bound per element, four chains pipeline).
    // Each pair's dot accumulates t = 0..dim-1 into its own accumulator in
    // both kernels, so emitted cosines are bit-identical either way.
    val lanes = TileNearDupPairs.simdLanes
    // Interleaved transpose for the SIMD kernel: lane-chunk-major so the
    // t-loop is one contiguous vector load per step.
    //   bT(c*dim + t*lanes + l) = b_(c+l)[t]   for chunk starts c = 0, L, 2L…
    val bT: Array[Double] =
      if (lanes > 0 && nb >= lanes && aIds.length.toLong * nb * dim > 64L * 1024) {
        val arr = new Array[Double](nb / lanes * lanes * dim)
        var c = 0
        while (c + lanes <= nb) {
          var l = 0
          while (l < lanes) {
            val src = (c + l) * bDim
            var t = 0
            val base = c * dim + l
            while (t < dim) { arr(base + t * lanes) = bVec(src + t); t += 1 }
            l += 1
          }
          c += lanes
        }
        arr
      } else null
    val aRow = new Array[Double](aDim)
    val dots = if (bT != null) new Array[Double](4 * lanes) else null
    var i = 0
    while (i < aIds.length) {
      val na = aNrm(i)
      if (na != 0.0) {
        val ai = aIds(i)
        val lo = upperBound(bIds, ai)
        val aOff = i * aDim
        var t = 0
        while (t < dim) { aRow(t) = aVec(aOff + t); t += 1 }

        // Divisionless reject: cos >= band ⟺ dot >= band·na·nrm_b up to
        // rounding, so a 1e-9-relative conservative margin (≫ the few-ulp
        // disagreement, ~0 extra passers) lets the per-pair test be one
        // multiply+compare instead of an FP divide. Passers re-run the
        // EXACT original arithmetic, so emitted pairs are bit-identical.
        // Zero-norm B-rows are rejected here (cos contract: score 0).
        val bandNa = band * na
        @inline def emit(j: Int, dot: Double): Unit = {
          val nb0 = bNrm(j)
          if (nb0 != 0.0 && dot >= bandNa * nb0 * (1 - 1e-9)) {
            val cos = dot / (na * nb0)
            if (cos >= band) {
              val r = round5(cos)
              if (r >= tau) out += InternalRow(ai, bIds(j), r)
            }
          }
        }
        @inline def scalarRange(from: Int, until: Int): Unit = {
          var k = from
          while (k + 4 <= until) {
            val o0 = k * bDim; val o1 = o0 + bDim
            val o2 = o1 + bDim; val o3 = o2 + bDim
            var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
            var u = 0
            while (u < dim) {
              val av = aRow(u)
              d0 += av * bVec(o0 + u)
              d1 += av * bVec(o1 + u)
              d2 += av * bVec(o2 + u)
              d3 += av * bVec(o3 + u)
              u += 1
            }
            emit(k, d0); emit(k + 1, d1); emit(k + 2, d2); emit(k + 3, d3)
            k += 4
          }
          while (k < until) {
            val bOff = k * bDim
            var dot = 0.0
            var u = 0
            while (u < dim) { dot += aRow(u) * bVec(bOff + u); u += 1 }
            emit(k, dot)
            k += 1
          }
        }

        if (bT != null) {
          // scalar head up to the next chunk boundary, SIMD full chunks,
          // scalar tail past the last full chunk
          val firstChunk = math.min((lo + lanes - 1) / lanes * lanes, nb)
          val lastChunk = nb / lanes * lanes
          scalarRange(lo, firstChunk)
          var c = firstChunk
          while (c + 4 * lanes <= lastChunk) {
            SimdDot.dotChunk4(aRow, dim, bT, c * dim, dots)
            var l = 0
            while (l < 4 * lanes) { emit(c + l, dots(l)); l += 1 }
            c += 4 * lanes
          }
          while (c + lanes <= lastChunk) {
            SimdDot.dotChunk(aRow, dim, bT, c * dim, dots)
            var l = 0
            while (l < lanes) { emit(c + l, dots(l)); l += 1 }
            c += lanes
          }
          scalarRange(math.max(lastChunk, firstChunk), nb)
        } else scalarRange(lo, nb)
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TileNearDupPairs {
  private val probedLanes: Int =
    try SimdDot.lanes()
    catch { case _: Throwable => 0 }

  /** Test hook: force the scalar path even when SIMD is available, so the
    * fallback (the path a cluster executor without --add-modules takes)
    * stays covered by the equality specs. */
  @volatile private[graft] var simdDisabled = false

  /** SIMD lane width, or 0 when jdk.incubator.vector is absent at runtime
    * (e.g. an executor JVM launched without --add-modules) — the kernel
    * then takes the scalar path, output unchanged. */
  def simdLanes: Int = if (simdDisabled) 0 else probedLanes
}
