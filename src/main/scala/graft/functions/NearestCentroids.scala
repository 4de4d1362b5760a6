package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: indexes of the k nearest centroids by cosine
  * similarity (ties broken by centroid index asc) — the map-side assignment
  * kernel of the IVF ANN path.
  *
  * The centroid set is MODEL STATE (the Spark MLlib `KMeansModel` pattern):
  * bounded at nlist × dim floats, carried inside the expression and shipped
  * with the serialized plan to every task. Assignment is therefore one
  * whole-stage-codegen'd column — no join, no shuffle, no window — versus
  * the join(broadcast(centroids)) + row_number formulation that
  * materializes n × nlist rows and shuffles them to rank.
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]], k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty, "nearest_centroids: empty centroid set")
  require(k >= 1 && k <= centroids.length,
    s"nearest_centroids: k=$k out of [1, ${centroids.length}]")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val model = new NearestCentroids.Model(centroids)

  override def nullSafeEval(v: Any): Any =
    NearestCentroids.compute(v.asInstanceOf[ArrayData], model, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("ncModel", model,
      classOf[NearestCentroids.Model].getName)
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = graft.functions.NearestCentroids$$.MODULE$$.compute($vec, $modelRef, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {

  /** Flattened centroid matrix + precomputed norms (once per task). */
  final class Model(cs: Array[Array[Float]]) extends Serializable {
    val n: Int = cs.length
    val dim: Int = cs.head.length
    val flat: Array[Float] = {
      val f = new Array[Float](n * dim)
      var j = 0
      while (j < n) {
        require(cs(j).length == dim, "nearest_centroids: ragged centroid set")
        System.arraycopy(cs(j), 0, f, j * dim, dim); j += 1
      }
      f
    }
    val norm: Array[Double] = {
      val out = new Array[Double](n)
      var j = 0
      while (j < n) {
        var s = 0.0; var i = 0
        while (i < dim) { val v = flat(j * dim + i).toDouble; s += v * v; i += 1 }
        out(j) = math.sqrt(s); j += 1
      }
      out
    }
  }

  /** Spark `round(x, 6)` semantics (BigDecimal HALF_UP over the shortest
    * decimal repr) — the SAME rounding the relation-recovery path and the
    * DuckDB oracle apply before ranking, so every assignment path shares
    * one tie-break rule. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** compare(round6(a), round6(b)) — with a fast path that skips the
    * BigDecimal when |a−b| > 1.1e-6: rounding moves each value by at most
    * 5.0001e-7, so beyond that gap the rounded values are distinct
    * multiples of 1e-6 in the same order as the raw ones. The slow path
    * fires only on near-ties, keeping the assignment kernel FLOPs-bound. */
  private def cmpRounded(a: Double, b: Double): Int = {
    val d = a - b
    if (d > 1.1e-6) 1
    else if (d < -1.1e-6) -1
    else java.lang.Double.compare(round6(a), round6(b))
  }

  /** Top-k centroid indexes by (round-6 cosine desc, index asc) — the one
    * tie-break rule shared with assignFromCentroidRelation and the DuckDB
    * oracle, so the direct/bench argmax and the Verify/oracle ranking can
    * never disagree on a near-tie. Same zero-norm convention as
    * CosineSimilarity (cos = 0). */
  def compute(vec: ArrayData, m: Model, k: Int): GenericArrayData = {
    val d = math.min(vec.numElements(), m.dim)
    var vn = 0.0
    var i = 0
    while (i < d) { val v = vec.getFloat(i).toDouble; vn += v * v; i += 1 }
    vn = math.sqrt(vn)
    val bestIdx = new Array[Int](k)
    val bestCos = new Array[Double](k)
    var filled = 0
    var j = 0
    while (j < m.n) {
      var dot = 0.0
      val off = j * m.dim
      i = 0
      while (i < d) { dot += vec.getFloat(i).toDouble * m.flat(off + i); i += 1 }
      val cos = if (vn == 0.0 || m.norm(j) == 0.0) 0.0 else dot / (vn * m.norm(j))
      // insertion into the (round-6 cos desc, idx asc) top-k; strict >
      // keeps the earlier (lower) index on rounded ties
      if (filled < k || cmpRounded(cos, bestCos(filled - 1)) > 0) {
        var p = math.min(filled, k - 1)
        while (p > 0 && cmpRounded(cos, bestCos(p - 1)) > 0) {
          bestCos(p) = bestCos(p - 1); bestIdx(p) = bestIdx(p - 1); p -= 1
        }
        bestCos(p) = cos; bestIdx(p) = j
        if (filled < k) filled += 1
      }
      j += 1
    }
    new GenericArrayData(bestIdx)
  }
}
