package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: multi-table random-hyperplane (sign) LSH
  * bucket ids for an embedding — the map-side bucketing kernel of the
  * LSH-ANN path (Charikar 2002 sign-LSH; same model-state pattern as
  * NearestCentroids: the hyperplane matrix is bounded at
  * tables × bits × dim floats, carried inside the expression, shipped with
  * the serialized plan).
  *
  * Output: array of `tables` ints; table t's id is `(t << bits) | signbits`
  * — namespaced so a single exploded column equi-joins across all tables
  * without a separate table column. Collision probability per bit for
  * vectors at angle θ is 1 − θ/π, so a table of b bits catches a pair with
  * probability (1 − θ/π)^b and L tables give recall 1 − (1 − p)^L — tune
  * (tables, bits) to the corpus similarity profile.
  */
case class HyperplaneLsh(child: Expression, planes: Array[Array[Float]],
                         tables: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(tables >= 1 && bits >= 1 && bits <= 24,
    s"hyperplane_lsh: tables=$tables bits=$bits out of range")
  require(tables <= (1 << (31 - bits)),
    s"hyperplane_lsh: tables=$tables overflows the int bucket namespace at bits=$bits " +
      s"(max ${1 << (31 - bits)}) — distinct tables would alias to the same buckets")
  require(planes.length == tables * bits,
    s"hyperplane_lsh: need ${tables * bits} hyperplanes, got ${planes.length}")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_lsh"

  @transient private lazy val model = new HyperplaneLsh.Model(planes, tables, bits)

  override def nullSafeEval(v: Any): Any =
    HyperplaneLsh.compute(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("lshModel", model,
      classOf[HyperplaneLsh.Model].getName)
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = graft.functions.HyperplaneLsh$$.MODULE$$.compute($vec, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneLsh {

  /** Flattened hyperplane matrix (once per task). */
  final class Model(ps: Array[Array[Float]], val tables: Int, val bits: Int)
      extends Serializable {
    val dim: Int = ps.head.length
    val flat: Array[Float] = {
      val f = new Array[Float](ps.length * dim)
      var j = 0
      while (j < ps.length) {
        require(ps(j).length == dim, "hyperplane_lsh: ragged hyperplane set")
        System.arraycopy(ps(j), 0, f, j * dim, dim); j += 1
      }
      f
    }
  }

  def compute(vec: ArrayData, m: Model): GenericArrayData = {
    val d = math.min(vec.numElements(), m.dim)
    val out = new Array[Int](m.tables)
    var t = 0
    while (t < m.tables) {
      var bucket = t << m.bits
      var j = 0
      while (j < m.bits) {
        val off = (t * m.bits + j) * m.dim
        var dot = 0.0
        var i = 0
        while (i < d) { dot += vec.getFloat(i).toDouble * m.flat(off + i); i += 1 }
        if (dot >= 0.0) bucket |= 1 << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Deterministic symmetric hyperplanes (LCG over the unit cube — not
    * rotation-invariant like Gaussian draws, but sign-LSH only needs a
    * symmetric direction distribution, and determinism is what makes the
    * operator oracle-/spec-checkable). */
  def genPlanes(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    var s = seed
    def next(): Float = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 32).toInt).toFloat / Int.MaxValue
    }
    Array.fill(n)(Array.fill(dim)(next()))
  }
}
