package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language ID, quality scoring,
  * token counting, fingerprinting. Every op is a pure map-side projection
  * (no shuffle) — at 100 TB these run at scan speed inside whole-stage
  * codegen, which is exactly what a curation pre-pass needs.
  *
  * All formulas are integer-ratio arithmetic mirrored verbatim in the DuckDB
  * oracles, so results are engine-exact after rounding.
  */
object TextAnalysis {

  private val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "zu", "von"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "los", "las", "que", "y", "en"),
    "fr" -> Seq("le", "la", "les", "des", "un", "une", "et", "du"),
    "zh" -> Seq("zhong", "wen", "shi", "bu", "wo", "ni", "ta", "men"))

  private def stopCount(t: Column, lang: String): Column =
    size(filter(t, x => array_contains(typedlit(stopwords(lang)), x)))

  /** Stopword-vote language ID. Deterministic: argmax over per-language
    * stopword hit counts, ties broken alphabetically. (The synthetic corpus
    * is shared-vocabulary, so the vote mostly lands on 'en' — the point is
    * the deterministic, oracle-checkable n-gram-heuristic shape.) */
  def langId(docs: DataFrame): DataFrame = {
    val t = TextOps.tokens(col("text"))
    val langs = stopwords.keys.toSeq.sorted
    val withScores = docs.select(Seq(col("doc_id")) ++
      langs.map(l => stopCount(t, l).cast("long").as(s"s_$l")): _*)
    val mx = greatest(langs.map(l => col(s"s_$l")): _*)
    val pred = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"s_$l") === mx && mx > 0, lit(l)).otherwise(acc)
    }
    // foldRight gives alphabetical priority: first matching lang wins.
    withScores.withColumn("pred_lang", pred)
  }

  /** Quality score: length saturation, stopword density, punctuation penalty.
    * Pure arithmetic over integer counts → engine-exact after round(…,6). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val t = TextOps.tokens(col("text"))
    docs.select(col("doc_id"), col("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_stop", stopCount(t, "en").cast("long"))
      .withColumn("n_punct", (length(col("text")) -
        length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("long"))
      .withColumn("mean_tok_len",
        round(aggregate(t, lit(0), (acc, x) => acc + length(x)) /
          when(size(t) > 0, size(t)).otherwise(1).cast("double"), 6))
      .withColumn("stop_ratio",
        round(col("n_stop") / when(col("n_tokens") > 0, col("n_tokens")).otherwise(1).cast("double"), 6))
      .withColumn("punct_ratio",
        round(col("n_punct") / when(col("n_chars") > 0, col("n_chars")).otherwise(1).cast("double"), 6))
      .withColumn("quality", round(
        least(lit(1.0), col("n_tokens") / lit(50.0)) * 0.4 +
        col("stop_ratio") * 0.4 + (lit(1.0) - col("punct_ratio")) * 0.2, 6))
      .drop("text")
  }

  /** Token counts: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs | digit runs | single non-space symbol). */
  def tokenCount(docs: DataFrame): DataFrame = {
    val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
    docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_ws"),
      size(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).cast("long").as("n_bpe"),
      length(col("text")).cast("long").as("n_chars"))
  }

  /** Rolling-hash (winnowing) fingerprints: min polynomial hash over k-byte
    * windows — the content-defined-chunking primitive (rows-only: the hash
    * is engine-internal; properties spec'd in OpsSpec). */
  def rollingFingerprint(docs: DataFrame, k: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions.rollingMinHash(col("text"), k).as("rh"),
      length(col("text")).cast("long").as("n_chars"))
  }

  /** Deterministic document fingerprint + length metadata. */
  def docFingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(col("text")).as("fp"),
      substring(md5(col("text")), 1, 8).as("fp8"),
      length(col("text")).cast("long").as("n_chars"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
}
