package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tile scorer for the blocked edit-distance dedup join.
  *
  * Input: two key blocks — array<struct<id:long, pfx:string>> — one tile of
  * the (block × block) candidate space. Output: array<struct<a_id, b_id,
  * dist:long>> of the pairs with A-side id < B-side id and edit distance
  * ≤ maxDist (exact distance emitted, same contract as
  * bounded_levenshtein ≥ 0).
  *
  * Why a tile form next to the row-per-candidate join: the verify stage is
  * pair-dominated on shared-vocabulary corpora (the blocking key collides),
  * and the per-pair path pays join-row machinery PLUS a fresh 128-long peq
  * bitmask allocation inside every bounded_levenshtein call. Here the
  * pattern bitmask is built once per A-row and reused across the whole
  * B-block (BoundedLevenshtein.core), blocks are id-sorted at unpack so
  * each A-row's admissible partners are one contiguous B-suffix (binary
  * search, no per-pair id branch), B-side bytes/ascii-eligibility are
  * precomputed once per tile, and only surviving pairs materialize as
  * rows. (A 4-way interleaved Myers variant was measured SLOWER than this
  * form — the per-lane guards cost more than the chain overlap buys; see
  * NOTES_PERF round 6b.)
  * Parity: Levenshtein is symmetric, so fixing the pattern role emits the
  * same integers as distance(); non-ASCII or >64-byte prefixes take the
  * same builtin fallback per pair. */
case class TileLevenshteinPairs(left: Expression, right: Expression, maxDist: Int)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")

  private val blockType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("pfx", StringType))))

  override def inputTypes = Seq(blockType, blockType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("dist", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "tile_levenshtein_pairs"

  /** Blocks are SORTED BY ID at unpack (output is a set — exploded
    * downstream), so each A-row's admissible partners (id-order guard) are
    * one contiguous B-suffix found by binary search; B-side bytes and
    * ascii-eligibility are precomputed once per tile. */
  private def unpack(block: ArrayData): (Array[Long], Array[UTF8String]) = {
    val n = block.numElements()
    val ids = new Array[Long](n)
    val pfx = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val row = block.getStruct(i, 2)
      ids(i) = row.getLong(0)
      pfx(i) = row.getUTF8String(1)
      i += 1
    }
    val perm = Array.range(0, n).sortBy(ids(_))
    (perm.map(ids), perm.map(pfx))
  }

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
    val (aIds, aPfx) = unpack(a.asInstanceOf[ArrayData])
    val (bIds, bPfx) = unpack(b.asInstanceOf[ArrayData])
    val k = maxDist
    val nb = bIds.length
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val peq = new Array[Long](128) // one table per TILE, refilled per A-row
    // B-side bytes + ascii flags once per tile, not once per pair
    val bBytes = new Array[Array[Byte]](nb)
    val bLen = new Array[Int](nb)
    val bAscii = new Array[Boolean](nb)
    var j = 0
    while (j < nb) {
      val tb = bPfx(j)
      bLen(j) = tb.numBytes
      bAscii(j) = tb.numChars == bLen(j)
      if (bAscii(j)) bBytes(j) = tb.getBytes
      j += 1
    }
    var i = 0
    while (i < aIds.length) {
      val pa = aPfx(i)
      val ai = aIds(i)
      val m = pa.numBytes
      val asciiA = m <= 64 && pa.numChars == m
      val lo = upperBound(bIds, ai)
      if (asciiA) {
        java.util.Arrays.fill(peq, 0L)
        val pb = pa.getBytes
        var t = 0
        while (t < m) { peq(pb(t) & 0x7f) |= 1L << t; t += 1 }
        var jj = lo
        while (jj < nb) {
          if (bAscii(jj)) {
            if (math.abs(bLen(jj) - m) <= k) {
              val d = BoundedLevenshtein.core(peq, m, bBytes(jj), bLen(jj), k)
              if (d >= 0) out += InternalRow(ai, bIds(jj), d.toLong)
            }
          } else {
            val d = pa.levenshteinDistance(bPfx(jj), k)
            if (d >= 0) out += InternalRow(ai, bIds(jj), d.toLong)
          }
          jj += 1
        }
      } else {
        var jj = lo
        while (jj < nb) {
          val d = pa.levenshteinDistance(bPfx(jj), k) // builtin fallback, same as distance()
          if (d >= 0) out += InternalRow(ai, bIds(jj), d.toLong)
          jj += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
