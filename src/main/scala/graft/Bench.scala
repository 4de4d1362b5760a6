package graft

import java.util.Locale

/** Benchmark main — runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing FULL materialization through the noop sink
  * (count() would let Catalyst prune projections and under-report work).
  * Prints one JSON line: {"metric":"total","value":…,"queries":{…}}.
  * All numbers formatted with Locale.ROOT — a comma-decimal JVM locale
  * would otherwise emit invalid JSON. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSessions.local(cpus)

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: $e"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Best-of-n per query: this host (single-tenant microVM) shows 5×+
    // run-to-run steal/IO noise on identical code, so a single sample is
    // not a usable signal — the best of n is the closest observable to the
    // true cost. A transiently-failed sample is dropped, not allowed to
    // poison the successful ones; -1 only when EVERY sample failed.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    def run(name: String): Double = {
      val ok = (1 to runs).map(_ => runOnce(name)).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }

    // JVM/codegen warmup on the configured dataset (not reported) — the
    // flagship entry() hardcodes its own dir, which may not exist here
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> run(n))
    val nFailed = results.count(_._2 < 0)
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + String.format(Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(String.format(Locale.ROOT,
      """{"metric":"total","value":%.3f,"unit":"sec","queries":%s,"sf":"%s","runs":%d,"failed":%d}""",
      Double.box(total), qs, sfDir, Int.box(runs), Int.box(nFailed)))
    spark.stop()
  }
}
