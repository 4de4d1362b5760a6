package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: unigram-language-model subword tokenization
  * (Kudo 2018, "Subword Regularization" — the SentencePiece unigram
  * algorithm) of a text column under a TRAINED piece vocabulary.
  *
  * Together with [[BpeEncode]] this covers both industry-standard subword
  * families: BPE segments by greedy merge replay, unigram by per-word
  * VITERBI — the single segmentation maximizing Σ log p(piece) under the
  * trained piece distribution. Same bounded-model-state pattern: the
  * (piece → log-prob) table ships inside the serialized plan, encoding is a
  * pure map-side projection, scan-speed at any corpus size.
  *
  * Semantics:
  *   - text splits on whitespace (byte-walk identical to TextOps.tokens —
  *     see [[BpeEncode.compute]]);
  *   - each word is segmented by Viterbi over all vocabulary pieces up to
  *     maxPieceLen chars (ties broken toward the LONGER last piece — fully
  *     deterministic: a piece is determined by its (start, end) span, so
  *     the start index is the only free tie dimension);
  *   - a character absent from the vocabulary falls back to a floor
  *     log-prob single-char piece, so segmentation is total and
  *     `concat(pieces) == word` always (losslessness is spec-pinned). */
case class UnigramEncode(child: Expression, pieces: Seq[String],
                         logProbs: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {

  require(pieces.length == logProbs.length, "pieces and logProbs must align")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val model = new UnigramEncode.Model(pieces, logProbs)

  override def nullSafeEval(v: Any): Any =
    UnigramEncode.compute(v.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramEncode.Model].getName)
    nullSafeCodeGen(ctx, ev, txt =>
      s"${ev.value} = graft.functions.UnigramEncode$$.MODULE$$.compute($txt, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramEncode {

  /** Unknown single characters score this floor log-prob (well below any
    * trained piece) — segmentation stays total on unseen input. */
  val UnkLogProb: Double = -30.0

  final class Model(pieces: Seq[String], logProbs: Seq[Double]) extends Serializable {
    val lp = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    var maxLen = 1
    pieces.iterator.zip(logProbs.iterator).foreach { case (p, q) =>
      lp.put(p, q)
      if (p.length > maxLen) maxLen = p.length
    }
    def logProb(s: String): Double = {
      val v = lp.get(s)
      if (v == null) Double.NaN else v.doubleValue()
    }
  }

  /** Viterbi segmentation of one word; pieces appended to `out`.
    * dp(j) = best score of s[0..j); back(j) = start of the last piece.
    * Deterministic tie-break: prefer the longer last piece (smaller start).
    * No further dimension exists — the piece IS word[start, j), so equal
    * starts mean equal pieces. */
  private def encodeWord(word: String, model: Model,
                         out: java.util.ArrayList[UTF8String]): Unit = {
    val n = word.length
    if (n == 0) return
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(dp, Double.NegativeInfinity)
    dp(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - model.maxLen)
      // never split a surrogate pair: a piece boundary inside one is not a
      // valid string position — skip ends that land mid-codepoint
      if (j < n && Character.isLowSurrogate(word.charAt(j))) {
        dp(j) = Double.NegativeInfinity
      } else {
        while (i < j) {
          if (!(i > 0 && Character.isLowSurrogate(word.charAt(i)))) {
            val piece = word.substring(i, j)
            var q = model.logProb(piece)
            if (q.isNaN) q = if (j - i == Character.charCount(word.codePointAt(i)))
              UnkLogProb else Double.NegativeInfinity
            if (q != Double.NegativeInfinity && dp(i) != Double.NegativeInfinity) {
              val cand = dp(i) + q
              val better = cand > dp(j) || (cand == dp(j) && i < back(j))
              if (better) { dp(j) = cand; back(j) = i }
            }
          }
          i += 1
        }
      }
      j += 1
    }
    // reconstruct (positions are valid by construction)
    val cuts = new java.util.ArrayList[Int]()
    var k = n
    while (k > 0) { cuts.add(k); k = back(k) }
    var start = 0
    var c = cuts.size - 1
    while (c >= 0) {
      val end = cuts.get(c)
      out.add(UTF8String.fromString(word.substring(start, end)))
      start = end
      c -= 1
    }
  }

  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r'

  def compute(text: UTF8String, model: Model): GenericArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || isWs(s.charAt(i))) {
        if (i > start) encodeWord(s.substring(start, i), model, out)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Driver-side unigram-LM vocabulary learning over a (word, frequency)
  * dictionary — the same distribution-of-work as [[BpeTrainer]]: the only
  * corpus-sized stage is the ONE word-count shuffle that builds the
  * dictionary; everything here is O(iterations × Σ|word|·maxPieceLen) over
  * DISTINCT words, independent of corpus size.
  *
  * Kudo 2018's algorithm, hard-EM form (documented simplification: expected
  * counts come from the VITERBI segmentation rather than full
  * forward–backward — the standard reimplementation shortcut; the pruning
  * loop and the final model shape match the paper):
  *   1. seed: the `seedSize` most frequent substrings (≤ maxPieceLen chars)
  *      of dictionary words, frequency-weighted; all single characters are
  *      always kept (coverage guarantee);
  *   2. repeat: re-estimate piece probs from Viterbi counts (emIters
  *      rounds), then drop the lowest-probability non-single-char pieces
  *      (keep `1 − pruneFrac`) until the vocabulary fits vocabSize;
  *   3. one final re-estimation round yields the shipped log-probs. */
object UnigramTrainer {

  def learn(vocab: Array[(String, Long)], vocabSize: Int = 512,
            maxPieceLen: Int = 6, seedSize: Int = 4096,
            emIters: Int = 2, pruneFrac: Double = 0.2): Seq[(String, Double)] = {
    // 1. frequency-weighted substring seed
    val subCounts = new java.util.HashMap[String, Long]()
    vocab.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        if (!Character.isLowSurrogate(w.charAt(i))) {
          var j = i
          while (j < w.length && j - i < maxPieceLen) {
            j += Character.charCount(w.codePointAt(j))
            if (j - i <= maxPieceLen)
              subCounts.merge(w.substring(i, j), f, java.lang.Long.sum(_, _))
          }
        }
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val singles: Set[String] = subCounts.keySet.asScala.toSet
      .filter(s => s.length == Character.charCount(s.codePointAt(0)))
    var current: Set[String] = subCounts.asScala.toSeq
      .sortBy { case (s, c) => (-c, s) }.take(seedSize).map(_._1).toSet ++ singles

    def estimate(pieceSet: Set[String], iters: Int): Map[String, Double] = {
      // init ∝ seed substring frequency (Kudo seeds by frequency): a
      // uniform init makes the first Viterbi tie-break between equal-length
      // segmentations arbitrarily, and hard-EM then entrenches the choice —
      // frequency init steers round 1 toward the corpus-frequent pieces
      val totalSeed = math.max(1.0,
        pieceSet.iterator.map(p => subCounts.getOrDefault(p, 1L).toDouble).sum)
      var probs: Map[String, Double] = pieceSet.iterator.map(p =>
        p -> math.log(math.max(1.0, subCounts.getOrDefault(p, 1L).toDouble) / totalSeed)).toMap
      for (_ <- 1 to iters) {
        val model = new UnigramEncode.Model(probs.keys.toSeq, probs.values.toSeq)
        val counts = new java.util.HashMap[String, Long]()
        vocab.foreach { case (w, f) =>
          val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
          UnigramEncode.compute(org.apache.spark.unsafe.types.UTF8String.fromString(w), model)
            .foreach(org.apache.spark.sql.types.StringType,
              (_, v) => out.add(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))
          var i = 0
          while (i < out.size) { counts.merge(out.get(i).toString, f, java.lang.Long.sum(_, _)); i += 1 }
        }
        val total = math.max(1L, counts.values.asScala.map(_.toLong).sum).toDouble
        // pieces never chosen by any Viterbi path keep a floor mass so they
        // can be pruned deterministically rather than dividing by zero
        probs = pieceSet.iterator.map { p =>
          val c = counts.getOrDefault(p, 0L)
          p -> (if (c > 0) math.log(c / total) else UnigramEncode.UnkLogProb)
        }.toMap
      }
      probs
    }

    // 2. prune loop
    var probs = estimate(current, emIters)
    while (current.size > vocabSize) {
      val keepN = math.max(vocabSize, (current.size * (1.0 - pruneFrac)).toInt)
      val multi = current.diff(singles).toSeq
        .sortBy(p => (-probs(p), p)) // most probable first; deterministic
      val kept = multi.take(math.max(0, keepN - singles.size)).toSet ++ singles
      if (kept == current || kept == singles) {
        // nothing prunable beyond the coverage set — stop (the coverage
        // floor may legitimately exceed a tiny vocabSize target)
        current = kept
        probs = estimate(current, emIters)
        return probs.toSeq.sortBy { case (p, q) => (-q, p) }
      }
      current = kept
      probs = estimate(current, emIters)
    }
    probs.toSeq.sortBy { case (p, q) => (-q, p) }
  }
}
