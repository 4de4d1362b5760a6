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
  * vectors are bulk-copied to primitive arrays once per tile and the pair
  * loop is pure JIT-vectorizable double math. Emitted-pair parity with the
  * row form: cosine = dot/(nrm_a*nrm_b) with double products in index order
  * (bit-identical to cosine_sim on equal-length vectors), rounding is
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
    * primitives once so the pair loop touches no ArrayData. */
  private def unpack(block: ArrayData): (Array[Long], Array[Float], Int, Array[Double]) = {
    val n = block.numElements()
    val ids = new Array[Long](n)
    val nrms = new Array[Double](n)
    var dim = 0
    var flat: Array[Float] = null
    var i = 0
    while (i < n) {
      val row = block.getStruct(i, 3)
      ids(i) = row.getLong(0)
      nrms(i) = row.getDouble(2)
      val v = row.getArray(1).toFloatArray()
      if (flat == null) { dim = v.length; flat = new Array[Float](n * dim) }
      // ragged dimensions fail FAST: zero-padding here while norms were
      // precomputed over full vectors would silently diverge from
      // cosine_sim's common-prefix semantics instead of erroring
      require(v.length == dim,
        s"tile_neardup_pairs: ragged embedding dimensions ($dim vs ${v.length}) — " +
          "fixed-dim corpus required")
      System.arraycopy(v, 0, flat, i * dim, dim)
      i += 1
    }
    (ids, if (flat == null) Array.emptyFloatArray else flat, dim, nrms)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aIds, aVec, aDim, aNrm) = unpack(a.asInstanceOf[ArrayData])
    val (bIds, bVec, bDim, bNrm) = unpack(b.asInstanceOf[ArrayData])
    val dim = math.min(aDim, bDim)
    // acceptance band: round5(x) >= tau  ⇔  x >= tau (grid) or x in the
    // half-ulp band below it — everything under band is rejected untouched
    val band = tau - 1e-5
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < aIds.length) {
      val na = aNrm(i)
      val aOff = i * aDim
      var j = 0
      while (j < bIds.length) {
        if (aIds(i) < bIds(j) && na != 0.0 && bNrm(j) != 0.0) {
          val bOff = j * bDim
          var dot = 0.0
          var t = 0
          while (t < dim) {
            dot += aVec(aOff + t).toDouble * bVec(bOff + t).toDouble; t += 1
          }
          val cos = dot / (na * bNrm(j))
          if (cos >= band) {
            val r = round5(cos)
            if (r >= tau) out += InternalRow(aIds(i), bIds(j), r)
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
