package graft

import java.util.Locale

/** Benchmark main — runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing FULL materialization through the noop sink
  * (count() would let Catalyst prune projections and under-report work).
  * Prints one JSON line: {"metric":"total","value":…,"queries":{…}}.
  * All numbers formatted with Locale.ROOT — a comma-decimal JVM locale
  * would otherwise emit invalid JSON.
  *
  * Noise hardening (this host shows 5×+ run-to-run steal on identical
  * code): per-query "queries" carries best-of-n, "samples" carries every
  * raw sample so a corrupted suite is diagnosable after the fact, and a
  * SENTINEL query timed at suite start and re-timed at suite end flags a
  * host whose load shifted mid-suite ("noisy": true when they differ >2×).
  *
  * "plans" carries a canonicalized fingerprint of each query's physical
  * plan (expression ids / plan ids / file paths masked), so cross-round
  * plan flips (broadcast→SMJ, new shuffles) are detected by diffing two
  * BENCH jsons instead of re-deriving plans by hand. The fingerprint is
  * the STATIC plan — AQE runtime re-plans don't show; flips driven by
  * stats (broadcast thresholds, join strategy) do. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSessions.local(cpus)

    // Named observations (Dataset.observe counters inside operators — e.g.
    // the PPJoin candidate-stage counters) are captured per execution and
    // dumped under "observed", so a cost move on a candidate-generating
    // operator is attributable to data vs filter-regression from the
    // artifact alone. Accumulator-based: zero extra actions.
    val observed = new java.util.concurrent.ConcurrentHashMap[String, String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      private def fmtVal(v: Any): String = v match {
        case null => "null"
        case n: Long => n.toString
        case n: Int => n.toString
        case n: Double => String.format(Locale.ROOT, "%.6g", Double.box(n))
        case s => "\"" + s.toString.replace("\"", "'") + "\""
      }
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (obsName, row) =>
          val fields = row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
            "\"" + f + "\":" + fmtVal(row.get(i)) }.mkString("{", ",", "}")
          observed.put(obsName, fields) // latest run wins — same query, same data
        }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: $e"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    /** Corpus stamp: doc/row counts, total text bytes, and an
      * order-invariant distributed fingerprint (sum of xxhash64 over id AND
      * content — no collect, no sort) for the two driver-regenerated
      * tables. Exists so a driver-side corpus regeneration is attributable
      * from two BENCH artifacts alone (fingerprint flips ⇒ data moved),
      * instead of costing a round of plan-hash forensics. CONTENT is part
      * of the hash since r12: the original id-only form collided across
      * corpora that shared ids 0..n-1 but differed in every text byte (the
      * suite-dir and ScaleDedup 500 k corpora — caught comparing their
      * artifacts), which is precisely the flip the stamp exists to show.
      * Stamps are comparable to pre-r12 artifacts only via counts +
      * text_bytes. */
    def corpusStamp(): String =
      try {
        import org.apache.spark.sql.functions._
        // hash sum in decimal(38,0): long-sum of 2^63-scale hashes overflows
        // immediately under ANSI; 38 digits absorb ~10^19 rows
        def fp(cs: org.apache.spark.sql.Column*) =
          sum(xxhash64(cs: _*).cast("decimal(38,0)")).cast("string")
        val d = Tables.documents(spark, sfDir)
          .agg(count(lit(1)), sum(length(col("text"))),
            fp(col("doc_id"), col("text"))).head()
        val e = Tables.embeddings(spark, sfDir)
          .agg(count(lit(1)), fp(col("vec_id"), col("embedding"))).head()
        s"""{"docs":${d.getLong(0)},"text_bytes":${d.getLong(1)},""" +
        s""""docs_fp":"${d.getString(2)}","vecs":${e.getLong(0)},""" +
        s""""vecs_fp":"${e.getString(1)}"}"""
      } catch { case ex: Throwable =>
        "\"err: " + ex.toString.replace("\"", "'") + "\"" }

    // Best-of-n per query: the best of n is the closest observable to the
    // true cost under steal noise. A transiently-failed sample is dropped,
    // not allowed to poison the successful ones; -1 only when EVERY sample
    // failed.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    def run(name: String): Seq[Double] = (1 to runs).map(_ => runOnce(name))
    def best(samples: Seq[Double]): Double = {
      val ok = samples.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }

    def fmt(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))

    /** Canonicalized static-plan fingerprint: stable across runs, changes
      * when the planned shape changes. */
    def planHash(name: String): String =
      try {
        val canon = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
          .replaceAll("#\\d+", "#x")
          .replaceAll("plan_id=\\d+", "plan_id=x")
          .replaceAll("id=#?\\d+", "id=x")
          .replaceAll("file:[^\\s,\\]\\)]*", "file:x")
          .replaceAll("Location: [^,\\]]*", "Location: x")
          // JVM object identities: lambda class counters (Lambda$123/0x...)
          // and toString identity hashes ([[F@1a2b3c, closure@...)
          .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda")
          .replaceAll("@[0-9a-f]+", "@x")
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(canon.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(12)
      } catch { case _: Throwable => "err" }

    // JVM/codegen warmup on the configured dataset (not reported) — the
    // flagship entry() hardcodes its own dir, which may not exist here.
    // Warm until the sentinel STABILIZES (two consecutive samples within
    // 1.5×, cap 6 runs): a fresh 32-thread JVM spends its first ~minute
    // JIT-compiling the scan/codegen stack (measured: 45 s for a q1 whose
    // warm cost is 1.2 s, sf10 r12), and a sentinel sampled during that
    // infancy reads as "host load shifted mid-suite" — a false noisy flag
    // on an idle host. Extra warm runs cost seconds once actually warm.
    val sentinelName = "q1_pricing_summary"
    var warmPrev = runOnce(sentinelName)
    var sentinelStart = runOnce(sentinelName)
    var warmTries = 0
    while (warmTries < 4 && warmPrev > 0 && sentinelStart > 0 &&
           math.max(warmPrev, sentinelStart) /
             math.min(warmPrev, sentinelStart) > 1.5) {
      warmPrev = sentinelStart
      sentinelStart = runOnce(sentinelName)
      warmTries += 1
    }

    // Same subset knobs as Verify — the sf10 sweep benches the TPC-H/events
    // families only (documents/embeddings can't scale past the
    // decorrelation bounds, see scripts/scaleup.py)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val skip = sys.env.get("SPARK_GRAFT_SKIP").map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)) && !skip(n))
    val samples = names.map(n => n -> run(n))
    val results = samples.map { case (n, ss) => n -> best(ss) }
    val sentinelEnd = runOnce(sentinelName)
    val noisy = sentinelStart > 0 && sentinelEnd > 0 &&
      math.max(sentinelStart, sentinelEnd) / math.min(sentinelStart, sentinelEnd) > 2.0

    val nFailed = results.count(_._2 < 0)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val ss = samples.map { case (k, vs) =>
      "\"" + k + "\":[" + vs.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val ph = names.map(n => "\"" + n + "\":\"" + planHash(n) + "\"")
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val obs = {
      import scala.jdk.CollectionConverters._
      observed.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    }
    val json = String.format(Locale.ROOT,
      """{"metric":"total","value":%.3f,"unit":"sec","queries":%s,"samples":%s,"plans":%s,"observed":%s,"corpus":%s,"sentinel":{"start_sec":%s,"end_sec":%s,"noisy":%b},"sf":"%s","runs":%d,"failed":%d}""",
      Double.box(total), qs, ss, ph, obs, corpusStamp(),
      fmt(sentinelStart), fmt(sentinelEnd),
      Boolean.box(noisy), sfDir, Int.box(runs), Int.box(nFailed))
    // The result JSON is printed BETWEEN fixed sentinel lines and also
    // written to a stable file path: the consuming driver scrapes stdout,
    // and trailing build-tool noise ("[success] Total time ...") made two
    // consecutive round artifacts unparseable (parsed: null). The sentinels
    // make the scrape unambiguous; the file makes it unnecessary.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] file dump failed: $e") }
    println("GRAFT_BENCH_JSON_BEGIN")
    println(json)
    println("GRAFT_BENCH_JSON_END")
    spark.stop()
  }
}
