package graft.tools

import org.apache.spark.sql.functions._
import graft.ops._

/** Ad-hoc probe: distribution of top-k-word density over the synthetic
  * corpus (dev tool, guides the ScaleDedup classifier rule). */
object RatioProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSessions.local("32")
    graft.functions.GraftFunctions.register(spark)
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "50000").toLong
    val docs = CorpusGen.documents(spark, n)
    val topWords = TextOps.topKWords(docs, 5).collect().map(_.getString(0)).toSeq
    println(s"[probe] top5 = $topWords")
    val t = TextOps.tokens(col("text"))
    val sw = typedlit(topWords)
    val r = docs.select((size(filter(t, x => array_contains(sw, x))).cast("double") /
      greatest(size(t), lit(1)).cast("double")).as("r"))
    val qs = r.stat.approxQuantile("r", Array(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99), 1e-4)
    println(s"[probe] quantiles = ${qs.toSeq}")
    println(s"[probe] distinct ratios = ${r.distinct().count()}")
    r.groupBy(col("r")).count().orderBy(col("count").desc).limit(10).collect()
      .foreach(x => println(f"[probe] r=${x.getDouble(0)}%.5f n=${x.getLong(1)}"))
    spark.stop()
  }
}
