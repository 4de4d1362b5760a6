package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: linear-model margin over hashed bag-of-words
  * features of a text column — the scoring half of the fastText-style
  * quality/domain classifier (Joulin et al. 2016; the GPT-3/LLaMA-lineage
  * curation pipelines score every crawl document with exactly this shape of
  * model). Same bounded-model-state pattern as [[BpeEncode]]/[[HyperplaneLsh]]:
  * the trained weight vector (D + 1 doubles, last = bias) ships inside the
  * serialized plan, so scoring is a pure MAP-SIDE projection — scan-speed at
  * any corpus size, no shuffle, no UDF boundary.
  *
  * Feature semantics (must match [[graft.ops.Classifier.hashedFeatures]]
  * bit-for-bit in index space):
  *   - tokens: maximal runs of non-\s bytes (byte-level walk; the 6 Java \s
  *     chars are ASCII and UTF-8 continuation bytes are ≥ 0x80, so the byte
  *     walk equals the char-level split(text, "\\s+") of TextOps.tokens);
  *   - index:  pmod(murmur3_x86_32(token bytes, seed 42), D) — the SAME hash
  *     Spark's `hash(word)` computes, so the declarative feature relation and
  *     this expression address identical weight slots;
  *   - value:  count(token) / n_tokens (L1-normalized term frequency).
  * margin = bias + Σ_tokens w(idx(token)) / n_tokens, accumulated in token
  * order (vs the feature relation's per-distinct-term order — the two paths
  * agree to float-rounding, spec-pinned at 1e-9). Empty/whitespace-only text
  * scores the bare bias. */
case class HashedLinearMargin(child: Expression, weights: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {

  require(weights.length >= 2, "weights = D feature slots + trailing bias")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_linear_margin"

  override def nullSafeEval(v: Any): Any =
    HashedLinearMargin.compute(v.asInstanceOf[UTF8String], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hlmWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, txt =>
      s"${ev.value} = graft.functions.HashedLinearMargin$$.MODULE$$.compute($txt, $wRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedLinearMargin {

  /** The exact byte set of the Java regex \s (all ASCII — see class doc). */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(text: UTF8String, w: Array[Double]): Double = {
    val d = w.length - 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    var sum = 0.0
    var n = 0
    var start = 0
    var i = 0
    while (i <= len) {
      val atWs = i == len || isWs(text.getByte(i))
      if (atWs) {
        if (i > start) {
          val h = Murmur3_x86_32.hashUnsafeBytes(base, off + start, i - start, 42)
          sum += w(((h % d) + d) % d)
          n += 1
        }
        start = i + 1
      }
      i += 1
    }
    if (n == 0) w(d) else w(d) + sum / n
  }
}
