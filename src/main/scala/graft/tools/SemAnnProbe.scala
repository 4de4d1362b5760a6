package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{CorpusGen, SimilarityOps}

/** Candidate-volume probe for the sign-LSH semantic dedup self-join: for a
  * CorpusGen corpus of SPARK_GRAFT_SCALE_N vectors, print the EXACT
  * bucket-join output bound Σ_b n_b·(n_b−1)/2 (summed over tables) and the
  * bucket-size tail for a ladder of bits — one groupBy count per point, no
  * pair materialization, so the probe answers "will the verify join fit
  * this box" in seconds where the full op answers it in spilled terabytes.
  * Used to attribute the r11 5 M-vector spill death (see NOTES_PERF). */
object SemAnnProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "5000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSessions.local(cpus)
    val emb = CorpusGen.embeddings(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bitsLadder = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(SimilarityOps.selfJoinBits(n), SimilarityOps.selfJoinBits(n) + 2)
    bitsLadder.foreach { bits =>
      val t0 = System.nanoTime()
      val sizes = SimilarityOps.lshIndexRelation(spark, emb, bits = bits)
        .groupBy(col("bucket")).agg(count(lit(1)).as("nb"))
      val row = sizes.agg(
        sum((col("nb") * (col("nb") - lit(1)) / lit(2)).cast("long")).as("pairs"),
        max(col("nb")).as("max_b"),
        expr("percentile_approx(CAST(nb AS DOUBLE), 0.999)").as("p999"),
        count(lit(1)).as("buckets")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[semann-probe] n=$n bits=$bits pairBound=${row.getLong(0)}%,d " +
        f"maxBucket=${row.getLong(1)}%,d p999=${row.getDouble(2)}%.0f " +
        f"buckets=${row.getLong(3)}%,d (${sec}%.1f s)")
    }
    spark.stop()
  }
}
