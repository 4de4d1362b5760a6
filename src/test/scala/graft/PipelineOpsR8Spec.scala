package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops._

/** Specs for the round-8 pipeline additions: semantic dedup (SemDedup),
  * bigram-LM perplexity scoring, deterministic global shuffle, and per-source
  * token-budget capping. Each op is DuckDB-oracle-checked in the driver gate;
  * these specs pin the semantic invariants the hash compare can't express
  * (permutation-ness, budget arithmetic, two-phase == naive-window identity,
  * score monotonicity). */
class PipelineOpsR8Spec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)
  private def emb = Tables.embeddings(spark, sfDir)

  // ---- semanticDedup ----

  test("semanticDedup: keep set is one canonical (min id) per component, " +
    "consistent with the near-dup pair graph") {
    val out = SimilarityOps.semanticDedup(spark, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val n = emb.count()
    assert(out.length == n, "one row per vector")
    // keep ⇔ vec_id == group_id, and group_id ≤ vec_id (min-label)
    assert(out.forall { case (id, g, k) => k == (id == g) && g <= id })
    // every near-dup pair shares a group
    val groupOf = out.map(r => r._1 -> r._2).toMap
    val pairs = SimilarityOps.embeddingNearDup(spark, emb)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "testdata should contain semantic near-dups")
    assert(pairs.forall { case (a, b) => groupOf(a) == groupOf(b) })
    // survivors = number of distinct groups
    assert(out.count(_._3) == out.map(_._2).distinct.length)
  }

  // ---- lmPerplexity ----

  test("lmPerplexity: repetitive text scores lower perplexity than " +
    "unique-vocabulary text; short docs carry nulls") {
    import spark.implicits._
    val fixture = Seq(
      (0L, "the cat sat on the mat the cat sat on the mat the cat sat on the mat"),
      (1L, "zebra quark nimbus fjord waltz glyph crypt oxbow jinx verve"),
      (2L, "single"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.lmPerplexity(fixture).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ppl0 = out(0L).getDouble(3)
    val ppl1 = out(1L).getDouble(3)
    assert(ppl0 < ppl1,
      s"repeated bigrams must be more predictable: $ppl0 vs $ppl1")
    assert(out(2L).isNullAt(2) && out(2L).isNullAt(3) && out(2L).getLong(1) == 0)
    assert(out(3L).isNullAt(3) && out(3L).getLong(1) == 0)
    // a doc with t tokens contributes exactly t-1 bigrams
    assert(out(0L).getLong(1) == 17 && out(1L).getLong(1) == 9)
  }

  test("lmPerplexity: every doc with >=2 tokens has n_bigrams = n_tokens - 1") {
    val expected = docs
      .select(col("doc_id"), greatest(size(TextOps.tokens(col("text"))) - 1, lit(0))
        .cast("long").as("want"))
    val got = TextAnalysis.lmPerplexity(docs)
    val bad = got.join(expected, "doc_id")
      .filter(col("n_bigrams") =!= col("want")).count()
    assert(bad == 0)
  }

  // ---- globalShuffle ----

  test("globalShuffle: output is a deterministic permutation matching the " +
    "naive single-window rank, and seed changes the order") {
    val out = CurationPipeline.globalShuffle(docs)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.count()
    assert(rows.length == n)
    assert(rows.map(_._2).sorted.toSeq == (1L to n).toSeq, "pos is a 1..N permutation")
    // two-phase rank == naive global window (the spec the oracle also proves,
    // pinned here against the in-engine naive form)
    val naive = docs
      .select(col("doc_id"),
        md5(concat_ws("-", lit("42"), col("doc_id").cast("string"))).as("k"))
      .withColumn("pos", row_number().over(Window.orderBy(col("k"), col("doc_id"))).cast("long"))
      .select("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.forall { case (id, p) => naive(id) == p })
    // rerun is bit-identical; a different seed produces a different order
    val rerun = CurationPipeline.globalShuffle(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.forall { case (id, p) => rerun(id) == p })
    val other = CurationPipeline.globalShuffle(docs, seed = "7").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.exists { case (id, p) => other(id) != p })
  }

  // ---- quotaSample ----

  test("quotaSample: tokens_before matches the naive per-source window and " +
    "kept docs start strictly within the budget") {
    val budget = 500L
    val out = CurationPipeline.quotaSample(docs, budgetTokens = budget)
    val naive = docs
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("pri"))
      .withColumn("tb", coalesce(sum(col("n_tokens")).over(
        Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "tb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rows = out.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val (id, tb, keep) = (r.getLong(0), r.getLong(3), r.getBoolean(4))
      assert(naive(id) == tb, s"two-phase cumsum diverged for doc $id")
      assert(keep == (tb < budget))
    }
    // per-source kept token mass exceeds the budget by at most one document
    // (the straddler): sum(kept) - max(kept doc) < budget
    val kept = rows.filter(_.getBoolean(4))
      .groupBy(_.getString(1)).map { case (_, rs) =>
        (rs.map(_.getLong(2)).sum, rs.map(_.getLong(2)).max) }
    assert(kept.nonEmpty && kept.forall { case (tot, mx) => tot - mx < budget })
  }
}
