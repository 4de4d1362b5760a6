package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition every LLM data
  * pipeline runs, as ONE declarative plan —
  *
  *   quality filter → exact dedup (canonical copy) → near-dup removal
  *
  * Each stage is an already-oracle-checked operator; the composition stays
  * lazy, so Catalyst fuses the map-side stages (quality metrics, hashing)
  * into the scan and the only shuffles are the dedup groupBy and the
  * near-dup pair join. Survivors = canonical, high-quality, near-dup-free.
  *
  * At 100 TB: quality scoring is scan-speed; exact dedup one shuffle;
  * near-dup stage swaps in minhashLshPairs (same output contract) when the
  * corpus outgrows the exact pair join.
  */
object CurationPipeline {

  def curate(docs: DataFrame, minQuality: Double = 0.5,
             nearDupTau: Double = 0.8): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs)
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    // canonical exact copies (min doc_id per content hash)
    val canonical = DedupOps.dedupExact(docs).select(col("canonical_id").as("doc_id"))
    val preNearDup = quality.join(canonical, Seq("doc_id"), "left_semi")
    // Near-dup pairs are computed over the post-quality canonical SURVIVORS,
    // not the full corpus: if the lower-id member of a pair was already
    // dropped (quality / exact dedup), the higher-id copy must NOT also be
    // removed — otherwise every copy of that content could vanish.
    val survivorDocs = docs.join(preNearDup.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val losers = DedupOps.ngramJaccardPairs(survivorDocs, tau = nearDupTau)
      .select(col("b_id").as("doc_id"))
    preNearDup.join(losers, Seq("doc_id"), "left_anti")
  }
}
