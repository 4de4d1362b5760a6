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
  * once terms drop below double precision. Like the reference, accuracy is
  * engineered for offsets up to ~10^8 (doubles carry ~52 fractional bits and
  * each partial sum is renormalized into [0,1) every term); the reference's
  * DistBbp covers the beyond-double regime with modular double-precision
  * pairs — out of scope here, documented in SURVEY §2.
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
}
