package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._

/** Ad-hoc stage profiler for the dedup hotspots (dev tool, not driver-run). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val shExpr = docs.select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), DedupOps.shinglesFromTokens(col("t")).as("s"))
    val sh = shExpr.filter(size(col("s")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cache build")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("s")).as("sg"), size(col("s")).as("nsh"))
    time("explode from cache")(ex.count())
    time("self-join from cache")(ex.as("a").join(ex.as("b"),
      col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id")).count())
    time("groupBy pairs")(ex.as("a").join(ex.as("b"),
        col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).count().count())
    time("full ngram jaccard")(DedupOps.ngramJaccardPairs(docs).count())
    val sig = sh.select(col("doc_id"), DedupOps.shingleHashes(col("s")).as("hs"))
      .select(col("doc_id"), DedupOps.minhashFromHashes(col("hs"), 128).as("sig"))
    time("sig compute")(sig.select(count(col("sig"))).head.getLong(0))
    val banded = sig.select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions.bandHashes(col("sig"), 32)).as(Seq("band", "band_sig")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("banded cache build")(banded.count())
    time("full minhash lsh")(DedupOps.minhashLshPairs(docs).count())
    // PPJoin internals
    val ex2 = sh.select(col("doc_id"), explode(col("s")).as("sg"), size(col("s")).as("nsh"))
    val dfs = ex2.groupBy(col("sg")).agg(count(lit(1)).as("df"))
    val prefix = ex2.join(dfs, "sg")
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("sg"))))
      .filter(col("rnk") <= col("nsh") - ceil(col("nsh") * 0.5) + 1)
      .select(col("doc_id"), col("sg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pp prefix build")(prefix.count())
    val cand2 = prefix.as("a").join(prefix.as("b"),
        col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    time("pp raw cand")(cand2.count())
    val candD = cand2.dropDuplicates("a_id", "b_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pp distinct cand")(candD.count())
    val verified = candD
      .join(sh.select(col("doc_id").as("a_id"), col("s").as("sa")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("s").as("sb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
    time("pp verify")(verified.filter(col("inter") > 20).count())
    time("full ppjoin")(DedupOps.ngramJaccardPairsPrefix(docs).count())
    spark.stop()
  }
}
