package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: WEIGHTED 64-bit SimHash of a token array
  * (Charikar 2002 §3 — the weighted form: token t votes ±w(t) per bit lane
  * instead of ±1).
  *
  * Why it exists: on real text the unweighted fingerprint is dominated by
  * the stopword head — the ~25% of token mass every document shares — so
  * fingerprints of UNRELATED documents correlate and the hamming-ball
  * candidate stage pays quadratic bucket volume (measured: the sf10
  * realistic-vocabulary suite corpus drove `dedup_simhash` to 300.9 s,
  * NOTES_PERF r12, because band buckets filled with cross-topic
  * collisions). Down-weighting common tokens by idf restores bit
  * separation between unrelated docs while near-duplicates — which share
  * their CONTENT mass, not just the head — stay within the radius.
  *
  * Model contract (the [[UnigramEncode]] bounded-model-state pattern): the
  * (word → weight) table rides the serialized plan and is rebuilt into a
  * hash map once per executor via the transient-lazy model; tokens absent
  * from the table get `defaultWeight`. The table is BOUNDED BY
  * CONSTRUCTION at any corpus size: only tokens frequent enough to matter
  * are shipped (rare tokens all saturate to ~max idf anyway, which is what
  * `defaultWeight` encodes — see DedupOps.idfWeights), so a 100 TB corpus
  * ships the same few-hundred-KB table as a 1 GB one.
  *
  * With an empty table and defaultWeight = 1.0 the output is BIT-IDENTICAL
  * to [[SimHash64]] (±1.0 votes sum to the same sign pattern as ±1 votes)
  * — spec-pinned, so the weighted form is a strict generalization. Same
  * FNV-1a token hash, same static-call codegen shape.
  */
case class SimHashWeighted(child: Expression, words: Seq[String],
                           weights: Seq[Double], defaultWeight: Double)
    extends UnaryExpression with ExpectsInputTypes {

  require(words.length == weights.length, "words and weights must align")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_weighted"

  @transient private lazy val model =
    new SimHashWeighted.Model(words, weights, defaultWeight)

  override def nullSafeEval(v: Any): Any =
    SimHashWeighted.compute(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("simhashWeights", model,
      classOf[SimHashWeighted.Model].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimHashWeighted$$.MODULE$$.compute($arr, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashWeighted {

  /** UTF8String-keyed weight table — lookups run on the tokens' native
    * binary form, zero per-token String decode on the hot path. */
  final class Model(words: Seq[String], weights: Seq[Double],
                    val default: Double) extends Serializable {
    val w = new java.util.HashMap[UTF8String, java.lang.Double](words.size * 2)
    words.iterator.zip(weights.iterator).foreach { case (t, x) =>
      w.put(UTF8String.fromString(t), x)
    }
    def weight(tok: UTF8String): Double = {
      val v = w.get(tok)
      if (v == null) default else v.doubleValue()
    }
  }

  def compute(arr: ArrayData, model: Model): Long = {
    val votes = new Array[Double](64)
    var t = 0
    while (t < arr.numElements()) {
      if (!arr.isNullAt(t)) {
        val tok = arr.getUTF8String(t)
        val wt = model.weight(tok)
        val h = SimHash64.fnv1a64(tok)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += wt else votes(j) -= wt
          j += 1
        }
      }
      t += 1
    }
    var out = 0L; var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}
