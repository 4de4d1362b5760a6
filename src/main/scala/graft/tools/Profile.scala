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
    spark.stop()
  }
}
