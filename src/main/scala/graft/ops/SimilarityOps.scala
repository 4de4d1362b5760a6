package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions.cosineSim

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force cosine is the correctness baseline (and oracle twin); the
  * IVF path is the 100 TB shape: centroid assignment is a map-side argmax
  * against a broadcast centroid set, and a query probes only `nprobe`
  * buckets, shrinking the candidate set ~nlist/nprobe×. The cosine kernel is
  * a native codegen'd Catalyst expression (graft.functions.CosineSimilarity),
  * so scans stay in one whole-stage-codegen stage — no UDF boundary.
  */
object SimilarityOps {

  /** All-pairs near-dup: pairs with round(cos,5) ≥ tau. Quadratic — correct
    * baseline + oracle face; at scale run ivfTopK / simhash blocking first. */
  def embeddingNearDup(spark: SparkSession, emb: DataFrame, tau: Double = 0.4): DataFrame = {
    GraftFunctions.register(spark)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", round(cosineSim(col("ea"), col("eb")), 5))
      .filter(col("cos") >= tau)
      .select(col("a_id"), col("b_id"), col("cos"))
  }

  /** Brute-force top-k neighbours for the query set (vec_id < nQueries).
    * Broadcast the small query side; rank with a deterministic tie-break. */
  def bruteForceTopK(spark: SparkSession, emb: DataFrame,
                     nQueries: Int = 10, k: Int = 5): DataFrame = {
    GraftFunctions.register(spark)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val cands = emb.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
    val scored = cands.join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("cos", round(cosineSim(col("qe"), col("ne")), 6))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rn").cast("long").as("rn"))
  }

  /** IVF-style ANN: deterministic "training" picks every strideth vector as a
    * centroid; vectors are assigned map-side to their nearest centroid
    * (broadcast argmax); queries probe only the nprobe nearest buckets.
    * Same output schema as bruteForceTopK — recall measured in the spec. */
  def ivfTopK(spark: SparkSession, emb: DataFrame, nQueries: Int = 10, k: Int = 5,
              centroidStride: Int = 50, nprobe: Int = 3): DataFrame = {
    GraftFunctions.register(spark)
    val centroids = emb.filter(pmod(col("vec_id"), lit(centroidStride)) === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"))

    def nearestBuckets(df: DataFrame, idCol: String, embCol: String, nBuckets: Int): DataFrame =
      df.join(broadcast(centroids))
        .withColumn("c_cos", round(cosineSim(col(embCol), col("ce")), 9))
        .withColumn("c_rn", row_number().over(
          Window.partitionBy(col(idCol)).orderBy(col("c_cos").desc, col("c_id"))))
        .filter(col("c_rn") <= nBuckets)

    val assigned = nearestBuckets(
      emb.select(col("vec_id").as("n_id"), col("embedding").as("ne")), "n_id", "ne", 1)
      .select(col("n_id"), col("ne"), col("c_id").as("bucket"))
    val probes = nearestBuckets(
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe")), "q_id", "qe", nprobe)
      .select(col("q_id"), col("qe"), col("c_id").as("bucket"))

    val scored = assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", round(cosineSim(col("qe"), col("ne")), 6))
      .dropDuplicates("q_id", "n_id")
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rn").cast("long").as("rn"))
  }
}
