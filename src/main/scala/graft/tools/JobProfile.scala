package graft.tools

import java.util.Locale
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import graft.SparkEntry

/** Per-query job/stage/shuffle profiler (dev tool, not driver-run): runs
  * each named query through the noop sink and prints wall seconds next to
  * the number of Spark JOBS (each one a blocking driver round trip — the
  * fixed-latency floor at bench SF and the serialization bottleneck at low
  * core counts), stages, tasks, and shuffle read bytes. A query whose wall
  * cost is mostly job COUNT is optimized by removing driver actions, not by
  * making tasks faster.
  *
  * `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.JobProfile <query> …"`;
  * SPARK_GRAFT_PROFILE_RUNS (default 2) — the LAST run's counters are
  * reported, so JIT/codegen warmup does not inflate the first sample. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt)
    val spark = graft.GraftSessions.local(cpus)

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shuffleRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-28s ${"sec"}%8s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"shufR_MB"}%9s ${"shufW_MB"}%9s")
    names.foreach { name =>
      try {
        var wall = 0.0
        (1 to runs).foreach { _ =>
          jobs.set(0); stages.set(0); tasks.set(0)
          shuffleRead.set(0L); shuffleWrite.set(0L)
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          wall = (System.nanoTime() - t0) / 1e9
          // listener bus is async — give it a beat to drain before reading
          // counters (private API to force-drain; a short sleep suffices
          // for a dev profiler)
          Thread.sleep(150)
        }
        println(String.format(Locale.ROOT, "%-28s %8.3f %5d %6d %6d %9.1f %9.1f",
          name, Double.box(wall), Int.box(jobs.get), Int.box(stages.get),
          Int.box(tasks.get), Double.box(shuffleRead.get / 1e6),
          Double.box(shuffleWrite.get / 1e6)))
      } catch { case e: Throwable =>
        System.err.println(s"[jobprofile] $name failed: $e")
      }
    }
    spark.stop()
  }
}
