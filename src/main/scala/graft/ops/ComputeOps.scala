package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed exact-digit computation of pi — the BBP spigot family.
  *
  * Reference analogs: BaileyBorweinPlouffe.java:1 (map tasks each own a
  * 4-hex-digit offset range; a reducer concatenates) and the pi/ package
  * (DistBbp.java:1, DistSum.java:1) whose map- and reduce-side summations
  * partition the same series by term ranges. Spark-native form: the digit
  * offsets ARE the distributed id space (`spark.range`), each row computes
  * its four hex digits with pure JVM arithmetic (no input, no shuffle —
  * the same embarrassingly-parallel shape as [[DataGen]]), and the ordered
  * result is the concatenation. The per-offset work is the published BBP
  * digit-extraction identity
  *
  *   {16^d pi} = {4 S(1,d) - 2 S(4,d) - S(5,d) - S(6,d)},
  *   S(j,d) = sum_k 16^(d-k) / (8k + j)
  *
  * with the head terms (k <= d) taken mod 1 via 2^e mod n square-and-multiply
  * so every intermediate stays in a Long, and the geometric tail truncated
  * once terms drop below double precision. The NEAR path below is accurate
  * for offsets up to ~10^8 (n^2 < Long.Max moduli, plain-double partial
  * sums); the FAR path ([[piFractionAtFar]], r10) is the DistBbp analog
  * for the beyond-double regime — 2^52-bound moduli via a double-assisted
  * exact mulmod, double-double accumulation (the reference's "modular
  * double-precision pairs"), and the k-range of a SINGLE digit position
  * distributed across the cluster (the DistSum shape).
  */
object ComputeOps {

  /** 2^e mod n by square-and-multiply. n <= ~8*10^8 keeps n^2 < Long.Max. */
  private[ops] def powMod2(e: Long, n: Long): Long = {
    if (n == 1L) return 0L
    var result = 1L % n
    var base = 2L % n
    var exp = e
    while (exp > 0) {
      if ((exp & 1L) == 1L) result = result * base % n
      base = base * base % n
      exp >>= 1
    }
    result
  }

  /** Fractional part of S(j,d) = sum_{k>=0} 16^(d-k)/(8k+j). */
  private[ops] def fracSum(j: Long, d: Long): Double = {
    var s = 0.0
    var k = 0L
    while (k <= d) { // head: 16^(d-k) is integral; only its residue matters
      val n = 8 * k + j
      s += powMod2((d - k) << 2, n).toDouble / n
      s -= math.floor(s)
      k += 1
    }
    var pow = 1.0 / 16.0 // tail: 16^(d-k) = 16^-(k-d) shrinks geometrically
    while (k <= d + 14) { // 14*4 = 56 bits, past double precision
      s += pow / (8 * k + j)
      pow /= 16.0
      k += 1
    }
    s - math.floor(s)
  }

  /** Fractional part of 16^d * pi (d = 0 yields .243F6A88...). */
  private[ops] def piFractionAt(d: Long): Double = {
    require(d >= 0, s"digit offset $d < 0")
    val x = 4 * fracSum(1, d) - 2 * fracSum(4, d) - fracSum(5, d) - fracSum(6, d)
    x - math.floor(x)
  }

  /** The four hex digits of pi at 0-based fractional offset d. */
  def hexDigitsAt(d: Long): String =
    "%04X".format((piFractionAt(d) * 65536.0).toLong)

  /** Distributed digit table: one row per 4-digit unit, ordered.
    * (pos, hex4) — pi's fractional hex expansion is the concatenation. */
  def piDigits(spark: SparkSession, nDigits: Int = 64, numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    require(nDigits % 4 == 0, "nDigits must be a multiple of 4")
    val units = nDigits / 4
    spark.range(0, units, 1, math.min(numPartitions, units))
      .as[Long]
      .map(u => (u * 4, hexDigitsAt(u * 4)))
      .toDF("pos", "hex4")
      .orderBy("pos")
  }

  /** Driver-side convenience: the first n fractional hex digits as a string. */
  def piHex(spark: SparkSession, nDigits: Int): String =
    piDigits(spark, nDigits).collect().map(_.getString(1)).mkString

  // ------------------------------------------------------------------
  // Beyond-double / beyond-long regime — the DistBbp/DistSum analog
  // (pi/DistBbp.java:1, pi/DistSum.java:1): ONE far digit position's
  // series is partitioned into k-ranges ACROSS the cluster, each task
  // summing its range with (a) 128-bit-safe modular arithmetic (the
  // double-assisted mulmod, exact for any modulus < 2^52 — lifting the
  // near path's n^2 < Long.Max bound, i.e. offsets beyond ~3.8e8) and
  // (b) double-double (~106-bit) accumulation with error-free term
  // splitting via Math.fma — the reference's "modular double-precision
  // pairs". Capacity: offsets to (2^52-6)/8 ~ 5.6e14 >> 2^40; total
  // error ~ d·2^-106 + chunks·2^-53 stays far below the 2^-20 needed
  // for four confident hex digits at every offset in range. The cost is
  // the series itself — O(d·log d) mulmods for one far digit (~180
  // core-hours at d = 2^40: an 11-minute job on 1000 executors, the
  // regime this op exists for; locally the spec validates at 4e8 and
  // the scale artifact at 2^34, both past every near-path bound).
  // ------------------------------------------------------------------

  /** (a·b) mod n, exact for 0 <= a,b < n < 2^52: the quotient is estimated
    * in double (off by at most ~2 ulps of n) and the remainder recovered
    * with WRAPPING 64-bit arithmetic — the true remainder lies in
    * (-2n, 3n) ⊂ (-2^63, 2^63), so the wrapped difference equals it
    * exactly; two correction loops land it in [0, n). */
  private[graft] def mulMod52(a: Long, b: Long, n: Long): Long = {
    val q = (a.toDouble * b.toDouble / n.toDouble).toLong
    var r = a * b - q * n
    while (r < 0) r += n
    while (r >= n) r -= n
    r
  }

  /** 2^e mod n via square-and-multiply over [[mulMod52]]; n < 2^52. */
  private[graft] def powMod2Far(e: Long, n: Long): Long = {
    if (n == 1L) return 0L
    var result = 1L % n
    var base = 2L % n
    var exp = e
    while (exp > 0) {
      if ((exp & 1L) == 1L) result = mulMod52(result, base, n)
      base = mulMod52(base, base, n)
      exp >>= 1
    }
    result
  }

  /** One task's contribution to frac(16^d·pi): the head terms k in
    * [k0, k1) of 4·S(1,d) − 2·S(4,d) − S(5,d) − S(6,d), accumulated in
    * double-double. Each term r/n is split error-free (hi = r/n rounded;
    * lo = fma(−hi, n, r)/n recovers the rounding residue exactly — r and
    * n are < 2^52, hence exact doubles), weighted by the formula's small
    * integer coefficients (exact scalings), twoSum'd into the running
    * pair, and renormalized mod 1 (an exact integer subtraction while
    * |s| < 2^53). Returns (hi, lo) with |lo| ~ (k1−k0)·2^-53 — the pair
    * is the task's EXACT partial to ~106 bits. */
  private val FarJs = Array(1L, 4L, 5L, 6L)
  private val FarWts = Array(4.0, -2.0, -1.0, -1.0) // exact scalings (powers of 2)

  private[graft] def fracChunkDD(d: Long, k0: Long, k1: Long): (Double, Double) = {
    var s = 0.0
    var e = 0.0
    var k = k0
    while (k < k1) {
      val exp = (d - k) << 2
      val k8 = 8 * k
      var j = 0
      while (j < 4) {
        val n = k8 + FarJs(j)
        val r = powMod2Far(exp, n)
        val nd = n.toDouble
        val rd = r.toDouble
        val q = rd / nd
        val wt = FarWts(j)
        val hi = wt * q
        val lo = wt * (Math.fma(-q, nd, rd) / nd)
        val t = s + hi
        val bp = t - s
        e += (s - (t - bp)) + (hi - bp) + lo
        s = t
        s -= math.floor(s) // keep |s| small: exact while s < 2^53
        j += 1
      }
      k += 1
    }
    (s, e)
  }

  /** frac(16^d·pi) by DISTRIBUTED head summation: the k-range [0, d] is
    * split into `chunk`-sized tasks (`spark.range` — the DistSum shape:
    * work for ONE digit position spreads across every executor), task
    * partials are double-double pairs reduced on the driver in
    * deterministic chunk order (bounded: ≤ 2^22 pairs of 16 bytes), and
    * the geometric tail (k > d, < 2^-56 total) is added driver-side. */
  def piFractionAtFar(spark: SparkSession, d: Long,
                      chunk: Long = 1L << 20): Double = {
    import spark.implicits._
    require(d >= 0, s"digit offset $d < 0")
    require(8 * d + 6 < (1L << 52), s"offset $d beyond the 2^52 modulus bound")
    require(chunk >= 1, "chunk must be positive")
    val nChunks = (d + 1 + chunk - 1) / chunk
    require(nChunks <= (1L << 22),
      s"$nChunks partials exceed the driver-reduce bound; raise chunk")
    val partials = spark.range(0, nChunks, 1,
        math.min(nChunks, 1024L).toInt).as[Long]
      .map { c =>
        val k0 = c * chunk
        val (s, e) = fracChunkDD(d, k0, math.min(k0 + chunk, d + 1))
        (c, s, e)
      }
      .collect().sortBy(_._1)
    var s = 0.0
    var e = 0.0
    partials.foreach { case (_, hi, lo) =>
      val t = s + hi
      val bp = t - s
      e += (s - (t - bp)) + (hi - bp) + lo
      s = t
      s -= math.floor(s)
    }
    // tail: 16^(d-k) = 16^-(k-d), geometric past double precision by k=d+14
    var pow = 1.0 / 16.0
    var k = d + 1
    while (k <= d + 14) {
      e += pow * (4.0 / (8 * k + 1) - 2.0 / (8 * k + 4) - 1.0 / (8 * k + 5) -
        1.0 / (8 * k + 6))
      pow /= 16.0
      k += 1
    }
    val x = s + e
    x - math.floor(x)
  }

  /** The four hex digits of pi at 0-based fractional offset d, computed on
    * the far (distributed long-modular) path. */
  def hexDigitsAtFar(spark: SparkSession, d: Long,
                     chunk: Long = 1L << 20): String =
    "%04X".format((piFractionAtFar(spark, d, chunk) * 65536.0).toLong)
}
