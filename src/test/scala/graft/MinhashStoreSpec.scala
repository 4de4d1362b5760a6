package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Persisted MinHash signature store: the store path must be id-for-id
  * identical to the recompute path (that is the contract the shared DuckDB
  * oracle also checks), and appended batches must make the store equal to
  * a fresh build over the union. */
class MinhashStoreSpec extends SparkSpecBase {

  private def survivors(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).sorted.toSeq

  test("store path == recompute path on the gate corpus (both drop reasons)") {
    val dir = "/tmp/graft_test_minhash_store"
    wipe(dir)
    val docs = Tables.documents(spark, sfDir)
    val batch = docs.filter(col("doc_id") % 5 =!= 0)
    val existing = docs.filter(col("doc_id") % 5 === 0)
    DedupOps.minhashWriteStore(existing, dir)
    val viaStore = survivors(
      CurationPipeline.incrementalDedupFromStore(batch, existing, dir))
    val recomputed = survivors(CurationPipeline.incrementalDedup(batch, existing))
    assert(viaStore == recomputed)
    assert(viaStore.nonEmpty && viaStore.size < batch.count())
  }

  test("appended batch == fresh build over the union; dedup against the " +
    "appended store == recompute against the grown corpus") {
    val dir = "/tmp/graft_test_minhash_store2"
    val dirU = "/tmp/graft_test_minhash_store2u"
    wipe(dir); wipe(dirU)
    val docs = Tables.documents(spark, sfDir)
    val existing = docs.filter(col("doc_id") % 5 === 0)
    val accepted = docs.filter(col("doc_id") % 5 === 1)
    val nextBatch = docs.filter(col("doc_id") % 5 === 2)
    DedupOps.minhashWriteStore(existing, dir)
    DedupOps.minhashAppendStore(accepted, dir, "batch_0001")
    DedupOps.minhashWriteStore(existing.unionByName(accepted), dirU)
    val merged = DedupOps.readMinhashStore(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val fresh = DedupOps.readMinhashStore(spark, dirU)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(merged == fresh, "append layout must equal a fresh union build")
    val grown = existing.unionByName(accepted)
    assert(survivors(CurationPipeline.incrementalDedupFromStore(nextBatch, grown, dir))
      == survivors(CurationPipeline.incrementalDedup(nextBatch, grown)))
  }

  private def wipe(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
