package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-corpus generation for dedup/ANN scale testing.
  *
  * TeraGen-style (reference: terasort/TeraGen.java:1 — the reference
  * GENERATES its scale data rather than replicating it): every row is a
  * pure function of its id, so generation is embarrassingly parallel,
  * partitioning-independent, and reproducible at any corpus size — which
  * is what lets the dedup/ANN family escape scaleup.py's decorrelation
  * bounds (replicating a 50 k-doc corpus 10× would plant factor² duplicate
  * pairs and benchmark the data artifact, not the plan).
  *
  * PLANTED STRUCTURE (the ground truth is closed-form id arithmetic):
  * ids are grouped in tens; role = id % 10 within group g = id - role.
  *  - role 0: group base — an independent random doc / embedding.
  *  - role 1: EXACT duplicate of the base (identical text / identical
  *    vector).
  *  - role 2: NEAR duplicate — text: every 67th token from the 14th
  *    replaced with a token unique to this doc (shingle Jaccard ≈ 0.85-0.9
  *    at 100-300 tokens, first 48 chars untouched so prefix/edit-distance
  *    ops pair it too); embedding: the base vector plus 0.15·gaussian,
  *    renormalized (cos ≈ 0.989).
  *  - roles 3-9: independent random docs / embeddings.
  * So each group plants the pair set {(g,g+1) exact, (g,g+2) near,
  * (g+1,g+2) near} and nothing else: text tokens are drawn Zipf(1) from a
  * `vocab`-word vocabulary (distinct random docs share too few shingles
  * to approach any dedup threshold), and embeddings are drawn around
  * `nClusters` well-separated unit centers with enough in-cluster spread
  * that non-planted cluster-mates sit ~5σ below a 0.8 cosine threshold.
  *
  * Token shape: words are syllable strings ("badeki") encoding the Zipf
  * rank in base-24 — short common words, longer rare ones, `x`-prefixed
  * replacement tokens in a disjoint namespace. The FIRST token is drawn
  * uniform over the first `vocab/10` ranks (the "title key" idiom), which
  * keeps first-token blocking (levenshteinPairs) at natural block sizes.
  *
  * PRNG: splitmix64 (Steele et al. 2014, public reference constants) —
  * keyed on (seed, base id), never on partition or call order. */
object SyntheticCorpus {

  /** splitmix64 finalizer — one 64-bit mix step. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic stream over successive mixes of a fixed seed. */
  final class Rng(seed: Long) {
    private var ctr = seed
    def nextLong(): Long = { ctr += 1; mix(ctr) }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16 // 2^-53
    /** Box-Muller (one value per call, cached pair dropped for determinism
      * simplicity — two uniforms per gaussian). */
    def nextGaussian(): Double = {
      val u1 = math.max(nextDouble(), 1e-300)
      val u2 = nextDouble()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
  }

  private val syllables = Array(
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo")

  /** Syllable word for a vocabulary rank (base-24 digits, most-significant
    * first): rank 0 → "ba", rank 24 → "baba" … short head, longer tail. */
  def word(rank: Int): String = {
    var r = rank
    val sb = new StringBuilder(8)
    do { sb.insert(0, syllables(r % 24)); r = r / 24 - 1 } while (r >= 0)
    sb.toString()
  }

  /** Unique replacement token (disjoint "x" namespace — no regular word
    * starts with x, so replacements never collide with vocabulary). */
  private def uniqueToken(id: Long, pos: Int): String =
    "x" + java.lang.Long.toString(mix(id * 131 + pos) >>> 1, 24)

  /** Zipf(1)-distributed rank in [0, vocab): inverse-CDF via vocab^u. */
  private def zipfRank(u: Double, vocab: Int): Int =
    math.min(vocab - 1, math.floor(math.pow(vocab.toDouble, u)).toInt - 1).max(0)

  /** Base token array of group base `baseId` (roles 0/1 use it verbatim).
    *
    * TOPIC REMAP: each group's Zipf ranks are mapped through a
    * topic-seeded hash into the vocabulary, so the within-doc frequency
    * shape is Zipf (head words repeat) but WHICH words form the head is
    * per-topic. Without this, every doc shares the same global head words
    * and unigram SimHash fingerprints of unrelated docs correlate so hard
    * that ~40% of ALL pairs land within hamming 6 (measured at 20 k docs:
    * 79 M "near-dup" pairs) — a corpus artifact no real near-dup radius
    * survives, and quadratic in n. With hashed topics, unrelated docs
    * share no systematic vocabulary and incidental within-radius pairs
    * drop to the same-topic coin-flip tail. The FIRST token stays a draw
    * from the global head range so first-token blocking keeps natural
    * block sizes. */
  /** Size of the GLOBAL stopword head (see `stopFrac`). */
  val StopVocab = 200

  /** `stopFrac` > 0 adds a GLOBAL STOPWORD HEAD: each non-title token is,
    * with that probability, drawn Zipf(1) from the first [[StopVocab]]
    * vocabulary ranks WITHOUT the topic remap — shared by every document,
    * like real text's "the/of/and" mass. This is the regime prefix-filtered
    * similarity joins exist for: stopword shingles have corpus-scale df
    * (the raw inverted-index pair bound grows ~quadratically with n) while
    * content shingles stay per-topic rare (the df-ascending prefix selects
    * them, so the prefix bound stays ~linear). The default 0.0 is
    * BIT-IDENTICAL to the historical stream (the branch consumes no RNG
    * draws), so every recorded artifact and reusable corpus dir stands.
    * Planted ground truth is unaffected either way — roles copy/edit the
    * realized base tokens, and the scale checks recompute per-pair
    * similarity from the text. */
  def baseTokens(baseId: Long, vocab: Int, seed: Long,
                 stopFrac: Double = 0.0): Array[String] = {
    val rng = new Rng(mix(seed) ^ baseId * 0x2545f4914f6cdd1dL)
    val topicSeed = mix(seed * 131 + baseId)
    def mapRank(r: Int): Int = ((mix(topicSeed ^ r.toLong) >>> 33) % vocab).toInt
    val n = 100 + (rng.nextLong() >>> 33).toInt % 200
    val out = new Array[String](n)
    // first token: uniform over the first vocab/10 ranks (title-key idiom)
    out(0) = word((rng.nextLong() >>> 33).toInt % math.max(1, vocab / 10))
    var i = 1
    while (i < n) {
      out(i) =
        if (stopFrac > 0 && rng.nextDouble() < stopFrac)
          word(zipfRank(rng.nextDouble(), StopVocab)) // global head, unmapped
        else word(mapRank(zipfRank(rng.nextDouble(), vocab)))
      i += 1
    }
    out
  }

  /** Full text of doc `id` with its role applied. */
  def docText(id: Long, vocab: Int, seed: Long, stopFrac: Double = 0.0): String = {
    val role = (id % 10).toInt
    val base = if (role <= 2) id - role else id
    val toks = baseTokens(base, vocab, seed, stopFrac)
    if (role == 2) {
      var t = 13
      while (t < toks.length) { toks(t) = uniqueToken(id, t); t += 67 }
    }
    toks.mkString(" ")
  }

  /** Embedding of vec `id`: unit vector near its cluster center; roles 1/2
    * reproduce/perturb the BASE's realized vector (all derivable from id —
    * no state). Noise scale 1.2 puts cluster-mate cosines ≈ 0.41 ± 0.07
    * (≥ 5σ under a 0.8 threshold); near-dup scale 0.15 puts planted
    * cosines ≈ 0.989. */
  def embedding(id: Long, dim: Int, nClusters: Int, seed: Long): Array[Float] = {
    val role = (id % 10).toInt
    val base = if (role <= 2) id - role else id
    val cluster = ((mix(base / 10 + seed * 7) >>> 33) % nClusters).toInt

    def gaussianVec(rng: Rng): Array[Double] = {
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) { v(i) = rng.nextGaussian(); i += 1 }
      v
    }
    def normalize(v: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < dim) { s += v(i) * v(i); i += 1 }
      val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
      v
    }
    // cluster center: unit vector from the cluster id
    val center = normalize(gaussianVec(new Rng(mix(seed * 31 + 1) ^ cluster.toLong)))
    // base realized vector: center + 1.2/sqrt(dim)·N(0,I), normalized
    val baseRng = new Rng(mix(seed * 31 + 2) ^ base * 0x9E3779B97F4A7C15L)
    val noise = gaussianVec(baseRng)
    val v = new Array[Double](dim)
    val s = 1.2 / math.sqrt(dim.toDouble)
    var i = 0
    while (i < dim) { v(i) = center(i) + s * noise(i); i += 1 }
    normalize(v)
    if (role == 2) {
      // near-dup: perturb the realized base vector, renormalize
      val pRng = new Rng(mix(seed * 31 + 3) ^ id * 0x9E3779B97F4A7C15L)
      val p = gaussianVec(pRng)
      val ps = 0.15 / math.sqrt(dim.toDouble)
      i = 0
      while (i < dim) { v(i) += ps * p(i); i += 1 }
      normalize(v)
    }
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) { out(i) = v(i).toFloat; i += 1 }
    out
  }
}

/** text of synthetic doc `id` (see SyntheticCorpus). CodegenFallback: runs
  * once at generation time, not in query hot paths. */
case class SyntheticDocText(child: Expression, vocab: Int, seed: Long,
                            stopFrac: Double = 0.0)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(vocab >= 30, s"vocab=$vocab too small for distinct-doc guarantees")
  require(stopFrac >= 0.0 && stopFrac < 1.0, s"stopFrac=$stopFrac out of [0,1)")
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = StringType
  override def prettyName: String = "synthetic_doc_text"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      SyntheticCorpus.docText(input.asInstanceOf[Long], vocab, seed, stopFrac))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** embedding of synthetic vec `id` (see SyntheticCorpus). */
case class SyntheticEmbedding(child: Expression, dim: Int, nClusters: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(dim >= 8 && nClusters >= 1)
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "synthetic_embedding"
  override def nullSafeEval(input: Any): Any = {
    val v = SyntheticCorpus.embedding(input.asInstanceOf[Long], dim, nClusters, seed)
    new GenericArrayData(v.map(x => x: Any))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
