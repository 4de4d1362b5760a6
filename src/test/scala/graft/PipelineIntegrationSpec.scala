package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Cross-module integration: the curation pipeline's survivor invariants and
  * the multimodal→similarity hand-off (media features as vectors through the
  * ANN kernel). */
class PipelineIntegrationSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)

  test("curation survivors: high-quality, canonical, near-dup-free") {
    val out = CurationPipeline.curate(docs)
    val survivors = out.collect()
    assert(survivors.nonEmpty && survivors.forall(_.getAs[Double]("quality") >= 0.5))
    val ids = survivors.map(_.getAs[Long]("doc_id")).toSet
    // no surviving near-dup pair: for every jacc>=0.8 pair at most the
    // smaller id survives
    val pairs = DedupOps.ngramJaccardPairs(docs, tau = 0.8).collect()
    pairs.foreach { p =>
      assert(!ids.contains(p.getAs[Long]("b_id")),
        s"near-dup loser ${p.getAs[Long]("b_id")} survived")
    }
    // canonical: survivors are the min doc_id of their content hash
    val canon = DedupOps.dedupExact(docs)
      .select(col("canonical_id")).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(canon))
  }

  test("multimodal features flow into the similarity kernel") {
    // stub feature extraction: byte histogram over the media payload as a
    // float vector — the real pipeline would emit a model embedding here
    val media = MultimodalOps.asMediaRecords(spark, docs)
    import spark.implicits._
    val feats = media.map { m =>
      val hist = new Array[Float](16)
      m.bytes.foreach(b => hist((b & 0xff) % 16) += 1f)
      (m.media_id, hist)
    }.toDF("vec_id", "embedding")
    val pairs = SimilarityOps.embeddingNearDup(spark, feats, tau = 0.999)
    // byte histograms of same-vocabulary docs are highly aligned; the point
    // is the schema/kernel compatibility, not the threshold
    assert(pairs.columns.toSeq == Seq("a_id", "b_id", "cos"))
    assert(pairs.count() >= 0)
    val topk = SimilarityOps.bruteForceTopK(spark, feats, nQueries = 3, k = 2)
    assert(topk.groupBy("q_id").count().collect().forall(_.getLong(1) == 2))
  }
}
