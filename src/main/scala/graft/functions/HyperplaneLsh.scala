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
  *
  * `probes` > 0 turns on MULTI-PROBE emission (Lv et al., VLDB 2007,
  * adapted from E2LSH to sign-LSH): per table, also emit the buckets
  * reached by flipping each of the `probes` sign bits with the smallest
  * margin |dot| — the bits a true near neighbour is most likely to differ
  * on, since P[flip] per bit decays with the margin. Output grows to
  * tables·(1+probes) ids. Intended asymmetry: the INDEX side stays
  * probes=0 (one bucket per table for N vectors), only the QUERY side
  * multi-probes — recall rises like extra tables, but the index build,
  * its shuffle, and its storage don't grow. At 100 TB that asymmetry is
  * the whole point: tables is the expensive knob (×N index rows),
  * probes is the cheap one (×nQueries probe rows).
  */
case class HyperplaneLsh(child: Expression, planes: Array[Array[Float]],
                         tables: Int, bits: Int, probes: Int = 0)
    extends UnaryExpression with ExpectsInputTypes {

  require(tables >= 1 && bits >= 1 && bits <= 24,
    s"hyperplane_lsh: tables=$tables bits=$bits out of range")
  require(probes >= 0 && probes <= bits,
    s"hyperplane_lsh: probes=$probes out of range [0, bits=$bits]")
  require(tables <= (1 << (31 - bits)),
    s"hyperplane_lsh: tables=$tables overflows the int bucket namespace at bits=$bits " +
      s"(max ${1 << (31 - bits)}) — distinct tables would alias to the same buckets")
  require(planes.length == tables * bits,
    s"hyperplane_lsh: need ${tables * bits} hyperplanes, got ${planes.length}")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_lsh"

  @transient private lazy val model =
    new HyperplaneLsh.Model(planes, tables, bits, probes)

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
  final class Model(ps: Array[Array[Float]], val tables: Int, val bits: Int,
                    val probes: Int) extends Serializable {
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
    val out = new Array[Int](m.tables * (1 + m.probes))
    val margin = if (m.probes > 0) new Array[Double](m.bits) else null
    var o = 0
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
        if (margin != null) margin(j) = math.abs(dot)
        j += 1
      }
      out(o) = bucket; o += 1
      // multi-probe: flip the `probes` lowest-|margin| bits, one at a time
      // (first-order probe sequence). Selection is deterministic — ties
      // break to the lowest bit index — so the probe relation dump and the
      // operator replan identically.
      var p = 0
      while (p < m.probes) {
        var bestJ = -1
        var bestM = Double.MaxValue
        var k = 0
        while (k < m.bits) {
          if (margin(k) < bestM) { bestM = margin(k); bestJ = k }
          k += 1
        }
        margin(bestJ) = Double.MaxValue // consumed
        out(o) = bucket ^ (1 << bestJ); o += 1
        p += 1
      }
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
