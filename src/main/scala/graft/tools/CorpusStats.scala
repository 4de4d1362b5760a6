package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, TextOps}

/** One-line corpus profile for bench forensics: doc counts, token/char
  * means, and the 3-gram shingle document-frequency distribution — the
  * quantities that size every candidate-generating dedup join (posting
  * list length ∝ df; PPJoin prefix length ∝ tokens/doc). Run it against
  * two corpora (or read two committed lines) to attribute a pair-family
  * cost move to the data without re-deriving anything.
  *
  * Usage: CorpusStats <sfDir>  (env SPARK_GRAFT_CPUS as usual). */
object CorpusStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, sfDir)
    val base = docs.agg(
      count(lit(1)).as("docs"),
      sum(length(col("text"))).as("text_bytes"),
      avg(size(TextOps.tokens(col("text")))).as("mean_tokens"),
      sum(xxhash64(col("doc_id")).cast("decimal(38,0)")).cast("string").as("fp")
    ).head()
    // shingle df distribution (3-gram, the dedup family's unit — same
    // tokenizer + shingler lane as the dedup ops)
    val df = docs
      .select(col("doc_id"),
        explode(DedupOps.shinglesFromTokens(TextOps.tokens(col("text")))).as("sg"))
      .groupBy(col("sg")).agg(count(lit(1)).as("df"))
    val d = df.agg(
      count(lit(1)).as("distinct_shingles"),
      sum(col("df")).as("postings"),
      expr("percentile(df, array(0.5, 0.9, 0.99))").as("p"),
      max(col("df")).as("max_df"),
      // candidate-volume proxy: an inverted-index self-join emits
      // sum(df·(df−1)/2) rows — THE number that moves when a corpus
      // regeneration changes duplicate density
      sum(col("df") * (col("df") - 1) / 2).as("selfjoin_rows")
    ).head()
    val p = d.getSeq[Double](2)
    println(f"""{"sf":"$sfDir","docs":${base.getLong(0)},"text_bytes":${base.getLong(1)},""" +
      f""""mean_tokens":${base.getDouble(2)}%.2f,"docs_fp":"${base.getString(3)}",""" +
      f""""distinct_shingles":${d.getLong(0)},"postings":${d.getLong(1)},""" +
      f""""df_p50":${p(0)}%.1f,"df_p90":${p(1)}%.1f,"df_p99":${p(2)}%.1f,""" +
      f""""df_max":${d.getLong(3)},"selfjoin_rows":${d.getDouble(4)}%.0f}""")
    spark.stop()
  }
}
