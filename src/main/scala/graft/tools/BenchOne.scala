package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Per-query bench for iterating on one operator without the full suite:
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.BenchOne <query> …"` —
  * best-of-3 through the noop sink, same measurement contract as Bench. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val samples = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $name best=${samples.min}%.3f s all=${samples.map(s => f"$s%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
