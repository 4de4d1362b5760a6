package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Verify-only behavior switch: queries whose oracle needs a materialized
    // intermediate (dedup_simhash's fingerprint dump) check for this prop, so
    // Bench and library callers never pay for or depend on the side write.
    System.setProperty("graft.fp.dump", "1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSessions.local(cpus)
    new java.io.File(outDir).mkdirs()
    var nFailed = 0
    // Optional subset for large-SF local sweeps (driver runs set neither):
    // SPARK_GRAFT_ONLY=a,b,c runs just those; SPARK_GRAFT_SKIP=x,y drops those.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val skip = sys.env.get("SPARK_GRAFT_SKIP").map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // coalesce(1) gives the driver one tidy file per query, but it also
    // collapses each query's FINAL STAGE to one thread — invisible at
    // sf0.01, a 32× de-parallelizer on heavy queries at sf1+. Large-SF
    // local sweeps set SPARK_GRAFT_NO_COALESCE=1 to write per-partition
    // files instead (check.py globs *.parquet, so both layouts compare).
    val noCoalesce = sys.env.contains("SPARK_GRAFT_NO_COALESCE")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) && !skip(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        (if (noCoalesce) df else df.coalesce(1)).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        nFailed += 1
        System.err.println(s"[verify] $name failed: $e") // toString: getMessage can be null
      }
    }
    // Exit code stays 0 even on partial failure: the driver's gate is
    // check.py over the written outputs (a missing query shows up as a red
    // there), and a non-zero exit could abort the gate entirely. The
    // summary line makes partial breakage loud in the log.
    if (nFailed > 0) System.err.println(s"[verify] $nFailed quer${if (nFailed == 1) "y" else "ies"} FAILED to dump")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
