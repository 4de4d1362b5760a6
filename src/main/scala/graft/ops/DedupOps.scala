package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Deduplication family for LLM training-data pipelines.
  *
  * No reference analog in hadoop-2.7.1 (it predates LLM data curation) — the
  * closest ancestor is the MR "distinct" idiom (map key → reduce first).
  * Design sources: MinHash/LSH (Broder 1997), SimHash (Charikar 2002), as
  * deployed in large-scale dedup pipelines (e.g. Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better").
  *
  * Scale shape (100 TB):
  *  - exact: one hash-shuffle on md5 — optimal.
  *  - minhash-LSH: signatures are computed MAP-SIDE per row (no explode of
  *    doc×perm), then only (doc, band, band_sig) triples shuffle — 32 small
  *    rows per doc regardless of doc size. Bucket join is uniform by
  *    construction (hash buckets), then candidate verification touches only
  *    the candidate pairs' shingle sets.
  *  - ngram-jaccard (exact): the inverted-index self-join is quadratic in
  *    posting-list length; cap df per shingle (`maxDf`) at scale — a pair
  *    sharing only ultra-common shingles is far below any dedup threshold.
  *  - simhash: map-side fingerprint; near-pair search via 16-bit band
  *    buckets (pigeonhole: hamming ≤ 3 ⇒ some band equal).
  */
object DedupOps {

  private val P = 2147483647L // 2^31-1, keeps perm arithmetic overflow-free under ANSI

  /** Word n-gram shingles (distinct), [] when the doc is shorter than n. */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val t = TextOps.tokens(textCol)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(t, i + lit(k))): _*))))
      .otherwise(typedlit(Seq.empty[String]))
  }

  /** Exact dedup: content-hash groupBy; canonical copy = min doc_id. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard near-dup pairs via shingle inverted index.
    * maxDf caps posting lists at scale (off by default for oracle parity). */
  def ngramJaccardPairs(docs: DataFrame, tau: Double = 0.5,
                        maxDf: Option[Int] = None): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("s"))
      .filter(size(col("s")) > 0)
    val ex0 = sh.select(col("doc_id"), explode(col("s")).as("sg"), size(col("s")).as("nsh"))
    val ex = maxDf.fold(ex0) { cap =>
      val rare = ex0.groupBy(col("sg")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select(col("sg"))
      ex0.join(rare, "sg")
    }
    val a = ex.select(col("doc_id").as("a_id"), col("sg"), col("nsh").as("na"))
    val b = ex.select(col("doc_id").as("b_id"), col("sg"), col("nsh").as("nb"))
    a.join(b, Seq("sg")).filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"), first(col("na")).as("na"), first(col("nb")).as("nb"))
      .withColumn("jacc", round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jacc") >= tau)
      .select(col("a_id"), col("b_id"), col("jacc"))
  }

  /** Deterministic permutation coefficients (planning-time LCG, data-free). */
  private def permCoeffs(numPerms: Int): (Seq[Long], Seq[Long]) = {
    var state = 20240812L
    def next(): Long = { state = (state * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffL; state }
    val a = Seq.fill(numPerms)(next() | 1L) // odd, non-zero
    val b = Seq.fill(numPerms)(next())
    (a, b)
  }

  /** MinHash signature column (array<bigint>, length numPerms) computed
    * map-side from the shingle array — no per-perm row explosion. */
  def minhashSignature(shingleCol: Column, numPerms: Int = 128): Column = {
    val (as, bs) = permCoeffs(numPerms)
    val litA = typedlit(as); val litB = typedlit(bs)
    val hs = transform(shingleCol, s => pmod(xxhash64(s), lit(P)))
    transform(sequence(lit(0), lit(numPerms - 1)), i =>
      array_min(transform(hs, h =>
        pmod(h * element_at(litA, i + 1) + element_at(litB, i + 1), lit(P)))))
  }

  /** MinHash + LSH near-dup pairs, verified with exact Jaccard ≥ tau.
    * bands × rowsPerBand must equal numPerms. Returns (a_id, b_id, jacc) —
    * identical schema/content to ngramJaccardPairs at tau when LSH recall
    * is 1.0 (holds for near-dup thresholds ≥ ~0.8 with 32×4 bands). */
  def minhashLshPairs(docs: DataFrame, tau: Double = 0.8,
                      numPerms: Int = 128, bands: Int = 32): DataFrame = {
    val rowsPerBand = numPerms / bands
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("s"))
      .filter(size(col("s")) > 0)
    val sig = sh.select(col("doc_id"), col("s"),
      minhashSignature(col("s"), numPerms).as("sig"))
    val banded = sig.select(col("doc_id"), col("s"),
        col("sig"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("band_sig", hash(col("band"),
        slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
      .select(col("doc_id"), col("s"), col("band"), col("band_sig"))
    val l = banded.select(col("doc_id").as("a_id"), col("s").as("sa"), col("band"), col("band_sig"))
    val r = banded.select(col("doc_id").as("b_id"), col("s").as("sb"), col("band"), col("band_sig"))
    val cand = l.join(r, Seq("band", "band_sig"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("sa"), col("sb"))
      .dropDuplicates("a_id", "b_id")
    cand
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jacc", round(col("inter") /
        (size(col("sa")) + size(col("sb")) - col("inter")), 6))
      .filter(col("jacc") >= tau)
      .select(col("a_id"), col("b_id"), col("jacc"))
  }

  /** SimHash fingerprints per doc (map-side, native expression). */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      GraftFunctions.simhash64(TextOps.tokens(col("text"))).as("fp"))
  }

  /** SimHash near-dup pairs: 16-bit band buckets (pigeonhole guarantees any
    * pair with hamming ≤ 3 shares a band), then exact hamming filter. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val fp = simhashFingerprints(docs)
    val banded = fp.select(col("doc_id"), col("fp"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_bits", expr("(fp >> (band * 16)) & 65535"))
    val l = banded.select(col("doc_id").as("a_id"), col("fp").as("fa"), col("band"), col("band_bits"))
    val r = banded.select(col("doc_id").as("b_id"), col("fp").as("fb"), col("band"), col("band_bits"))
    l.join(r, Seq("band", "band_bits"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        GraftFunctions.hamming64(col("fa"), col("fb")).as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }
}
