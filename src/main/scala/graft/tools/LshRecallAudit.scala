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
    val tables = if (args.length > 0) args(0).toInt else 8
    val bits = if (args.length > 1) args(1).toInt else 4
    val nQueries = 50
    val k = 5
    val spark = graft.GraftSessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truth = SimilarityOps.bruteForceTopK(spark, emb, nQueries = nQueries, k = k)
      .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(0, 1, 2, 3).foreach { flips =>
      val got = SimilarityOps.annLshTopK(spark, emb, nQueries = nQueries, k = k,
          tables = tables, bits = bits, flips = flips)
        .select(col("q_id"), col("n_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (got & truth).size.toDouble / truth.size
      // candidate volume = distinct (q,n) pairs sharing a bucket (pre-dedup
      // scoring cost rides this)
      val planes = graft.functions.HyperplaneLsh.genPlanes(tables * bits,
        emb.select(size(col("embedding"))).head().getInt(0), 42L)
      graft.functions.GraftFunctions.register(spark)
      val idx = emb.select(col("vec_id").as("n_id"),
        explode(graft.functions.GraftFunctions.hyperplaneLsh(col("embedding"), planes, tables, bits)).as("bucket"))
      val probes = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"),
          explode(graft.functions.GraftFunctions.hyperplaneLsh(col("embedding"), planes, tables, bits,
            math.min(flips, bits))).as("bucket"))
      val cand = idx.join(probes, "bucket").filter(col("q_id") =!= col("n_id"))
        .select("q_id", "n_id").distinct().count()
      println(String.format(Locale.ROOT,
        "[lshrecall] tables=%d bits=%d flips=%d recall@%d=%.3f candidates=%d",
        Int.box(tables), Int.box(bits), Int.box(flips), Int.box(k),
        Double.box(recall), Long.box(cand)))
    }
    spark.stop()
  }
}
