package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Prints formatted physical plans for the headline queries so the scan
  * pushdown / broadcast / partial-agg assertions in NOTES_PERF.md are
  * reproducible: `sbt "runMain graft.tools.ExplainAudit [query ...]"`. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_SF_DIR lets the audit run against any SF — plan FLIPS
    // (broadcast→SMJ, AQE skew splits) only show on the larger inputs
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q6_forecast_revenue", "q5_local_supplier", "q1_pricing_summary",
        "wordcount", "sessionize", "dedup_minhash_lsh", "ann_bruteforce_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
