package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Round-9 batch 2: CCNet text normalization, int8 embedding quantization,
  * cluster-balanced sampling. Semantics pinned on hand-computed synthetic
  * frames plus the cross-path parity checks the DuckDB oracle can't see
  * (two-phase rank == naive window at several partition counts; direct
  * k-means path == centroid-relation path). */
class CurationR9bSpec extends SparkSpecBase {

  import spark.implicits._

  test("textNormalize: lowercase, accent strip, digit runs -> 0, symbol " +
    "runs -> one space, trim; counts match the normalized text") {
    val docs = Seq(
      (1L, "Café COSTS 12,50 dollars!!"),
      (2L, "  àéîõüçñÿ mix3d 007bond "),
      (3L, "...!!!"), // normalizes to empty
      (4L, "plain text stays plain text"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.textNormalize(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("cafe costs 0 0 dollars", 5L, 22L)))
    assert(got(2L) == (("aeioucny mix0d 0bond", 3L, 20L)))
    assert(got(3L) == (("", 0L, 0L)), "all-symbol doc -> empty, zero words")
    assert(got(4L) == (("plain text stays plain text", 5L, 27L)))
  }

  test("embeddingQuantize: scale = amax/127, recon error <= scale/2, " +
    "constant vectors reconstruct colinearly (cos 1.0)") {
    val docs = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f, 0.25f)),
      (2L, Array(0.3f, 0.3f, 0.3f, 0.3f)),  // colinear recon -> cos exactly 1
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))  // zero vector -> scale 0, cos 0
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.embeddingQuantize(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (s1, err1, cos1) = got(1L)
    assert(math.abs(s1 - 1.0 / 127.0) < 1e-9)
    assert(err1 <= s1 / 2 + 1e-12, "symmetric-quantization error bound")
    assert(cos1 > 0.999)
    assert(got(2L)._3 == 1.0, "constant vector: recon is colinear")
    assert(got(3L) == ((0.0, 0.0, 0.0)), "zero vector: scale 0, defined cos 0")
    // corpus-wide audit: the bound holds for every real embedding
    val emb = Tables.embeddings(spark, sfDir)
    val viol = SimilarityOps.embeddingQuantize(emb)
      .filter(col("max_abs_err") > col("scale") / 2 + 1e-12).count()
    assert(viol == 0)
  }

  test("balancedRank: exactly quota keeps per cluster; two-phase rank == " +
    "naive per-cluster window at 1/3/32 buckets") {
    val assigned = (1L to 100L).map(i => (i, (i % 4).toInt)).toDF("vec_id", "cluster")
    val naive = assigned
      .withColumn("pri", md5(col("vec_id").cast("string")))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
          .orderBy(col("pri"), col("vec_id"))).cast("long"))
      .select("vec_id", "cluster", "rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    for (parts <- Seq(1, 3, 32)) {
      val got = CurationPipeline.balancedRank(assigned, quota = 10, partitions = parts)
      assert(got.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
        == naive, s"two-phase != naive at partitions=$parts")
      assert(got.filter(col("keep")).groupBy("cluster").count()
        .collect().forall(_.getLong(1) == 10L), "quota keeps per cluster")
    }
  }

  test("clusterBalancedSample: direct path == centroid-relation path on the " +
    "gate embeddings; keeps never exceed quota") {
    val emb = Tables.embeddings(spark, sfDir)
    val cs = SimilarityOps.trainKmeans(emb)
    val viaRel = CurationPipeline.clusterBalancedSampleFrom(spark, emb,
      SimilarityOps.kmeansCentroidRelation(spark, cs))
    // direct path retrains; Lloyd from the same deterministic init on the
    // same input converges to the same model here, so assignments agree
    val direct = CurationPipeline.clusterBalancedSample(spark, emb)
    assert(direct.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      == viaRel.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq)
    val over = viaRel.filter(col("keep")).groupBy("cluster").count()
      .filter(col("count") > 20).count()
    assert(over == 0, "no cluster keeps more than quota")
  }
}
