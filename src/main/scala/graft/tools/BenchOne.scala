package graft.tools

import java.util.Locale

import graft.SparkEntry

/** Per-query bench for iterating on one operator without the full suite:
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.BenchOne <query> …"` —
  * best-of-3 through the noop sink, same measurement contract as Bench. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = graft.GraftSessions.local(cpus)
    args.foreach { name =>
      try {
        val samples = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(String.format(Locale.ROOT, "[benchone] %s best=%.3f s all=%s",
          name, Double.box(samples.min),
          samples.map(s => String.format(Locale.ROOT, "%.2f", Double.box(s))).mkString(",")))
      } catch { case e: Throwable =>
        System.err.println(s"[benchone] $name failed: $e")
      }
    }
    spark.stop()
  }
}
