package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantifies the RowNumberTopKRewrite win: row_number window + filter vs
  * the bounded-heap exec, on top-3 lineitems per part at sf0.1. */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    def q = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)

    def time(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[topk] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
    }
    time("heap (rule on)  ")(q.count())
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.RowNumberTopKRewrite")
    time("window (rule off)")(q.count())
    println("[topk] plans: on contains TopKRanked=" + {
      spark.conf.unset("spark.sql.optimizer.excludedRules")
      q.queryExecution.executedPlan.toString.contains("TopKRanked")
    })
    spark.stop()
  }
}
