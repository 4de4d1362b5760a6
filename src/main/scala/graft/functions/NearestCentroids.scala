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

  /** Top-k centroid indexes by (cosine desc, index asc); same zero-norm
    * convention as CosineSimilarity (cos = 0). */
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
      // insertion into the (cos desc, idx asc) top-k; strict > keeps the
      // earlier (lower) index on ties
      if (filled < k || cos > bestCos(filled - 1)) {
        var p = math.min(filled, k - 1)
        while (p > 0 && cos > bestCos(p - 1)) {
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
