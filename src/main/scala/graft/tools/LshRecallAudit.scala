package graft.tools

import java.util.Locale

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** Measures what multi-probe buys: recall@k of sign-LSH ANN vs the
  * brute-force ground truth at several probe (bit-flip) counts, plus the
  * candidate volume each costs. `SPARK_GRAFT_SF_DIR=… sbt "runMain
  * graft.tools.LshRecallAudit [tables] [bits]"`. The interesting read is
  * recall-per-candidate: flips multiply only the nQueries-sized probe side,
  * so they buy recall at a per-query cost, where extra tables multiply the
  * N-sized index (build + shuffle + storage). */
object LshRecallAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_LSH_OUT", "LSH_RECALL.json")
    val tables = if (args.length > 0) args(0).toInt else 8
    val bits = if (args.length > 1) args(1).toInt else 4
    val nQueries = 50
    val k = 5
    val spark = graft.GraftSessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRows = emb.count()
    val truth = SimilarityOps.bruteForceTopK(spark, emb, nQueries = nQueries, k = k)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def measure(t: Int, b: Int, flips: Int): (Double, Long) = {
      val got = SimilarityOps.annLshTopK(spark, emb, nQueries = nQueries, k = k,
          tables = t, bits = b, flips = flips)
        .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (got & truth).size.toDouble / truth.size
      // candidate volume = distinct (q,n) pairs sharing a bucket (pre-dedup
      // scoring cost rides this)
      val (idx, probes) = SimilarityOps.lshBucketRelations(spark, emb,
        nQueries = nQueries, tables = t, bits = b, flips = flips)
      val cand = idx.join(probes, "bucket").filter(col("q_id") =!= col("n_id"))
        .select("q_id", "n_id").distinct().count()
      (recall, cand)
    }

    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    def row(label: String, t: Int, b: Int, flips: Int): Unit = {
      val (recall, cand) = measure(t, b, flips)
      println(String.format(Locale.ROOT,
        "[lshrecall] %s tables=%d bits=%d flips=%d recall@%d=%.3f candidates=%d",
        label, Int.box(t), Int.box(b), Int.box(flips), Int.box(k),
        Double.box(recall), Long.box(cand)))
      rows += String.format(Locale.ROOT,
        """{"label":"%s","tables":%d,"bits":%d,"flips":%d,"recall":%.4f,"candidates":%d}""",
        label, Int.box(t), Int.box(b), Int.box(flips), Double.box(recall), Long.box(cand))
    }
    // the flip curve at the requested (default) shape, then the auto-tuned
    // operating point ScaleDedup ships with
    Seq(0, 1, 2, 3).foreach(f => row("fixed", tables, bits, f))
    val lp = SimilarityOps.autoTuneLsh(spark, emb, nQueries = nQueries, k = k)
    row("auto", lp.tables, lp.bits, lp.flips)

    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      s"""{"metric":"lsh_recall","sf_dir":"$sfDir","n_rows":$nRows,"n_queries":$nQueries,"k":$k,""" +
        s""""curve":[${rows.mkString(",")}]}""" + "\n")
    spark.stop()
  }
}
