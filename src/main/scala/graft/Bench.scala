package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing FULL materialization through the noop sink
  * (count() would let Catalyst prune projections and under-report work).
  * Prints one JSON line: {"metric":"total","value":…,"queries":{…}}. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Best-of-n per query: this host (single-tenant microVM) shows 5×+
    // run-to-run steal/IO noise on identical code, so a single sample is
    // not a usable signal — the best of n is the closest observable to the
    // true cost. n configurable via SPARK_GRAFT_BENCH_RUNS.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    def run(name: String): Double = {
      val samples = (1 to runs).map(_ => runOnce(name))
      if (samples.exists(_ < 0)) -1.0 else samples.min
    }

    // JVM/codegen warmup on the flagship query (not reported)
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs}""")
    spark.stop()
  }
}
