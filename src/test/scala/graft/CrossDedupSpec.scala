package graft

import org.apache.spark.sql.functions._
import graft.ops.{CurationPipeline, DedupOps}

/** Cross-corpus near-dup (fuzzy decontamination) specs: the exact
  * inverted-index form, its LSH-bucketed 100 TB twin, and the survivor
  * composite. Gate corpus split: ref = src0/src1 sources, corpus = rest. */
class CrossDedupSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)
  private def corpus = docs.filter(!col("source").isin("src0", "src1"))
  private def ref = docs.filter(col("source").isin("src0", "src1"))

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("crossJaccardPairs: sound (every pair's Jaccard recomputed from raw shingle sets >= tau), sides disjoint") {
    val pairs = DedupOps.crossJaccardPairs(corpus, ref, tau = 0.8)
    val got = pairSet(pairs)
    assert(got.nonEmpty, "gate corpus should contain cross-source near-dups")
    val corpusIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    val refIds = ref.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.forall { case (a, b, j) => corpusIds(a) && refIds(b) && j >= 0.8 })
    // recompute each pair's Jaccard from the raw token shingle sets
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def sh(id: Long): Set[String] = {
      val t = texts(id).split("\\s+").filter(_.nonEmpty)
      if (t.length < 3) Set.empty
      else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    got.foreach { case (a, b, j) =>
      val (sa, sb) = (sh(a), sh(b))
      val inter = (sa & sb).size.toDouble
      val jTrue = math.rint(inter / (sa.size + sb.size - inter) * 1e6) / 1e6
      assert(math.abs(jTrue - j) < 1e-9, s"pair ($a,$b): got $j, recomputed $jTrue")
    }
  }

  test("crossMinhashPairs == crossJaccardPairs on the gate corpus (LSH recall 1.0 at tau=0.8, verified candidates)") {
    val exact = pairSet(DedupOps.crossJaccardPairs(corpus, ref, tau = 0.8))
    val lsh = pairSet(DedupOps.crossMinhashPairs(corpus, ref, tau = 0.8))
    assert(lsh == exact, s"LSH ${lsh.size} pairs vs exact ${exact.size}: " +
      s"missed=${(exact -- lsh).take(3)} extra=${(lsh -- exact).take(3)}")
  }

  test("incrementalDedup: survivors == new minus (bigger-id batch dups ∪ cross collisions), both reasons exercised") {
    val newDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val existing = docs.filter(col("doc_id") % 5 === 0)
    val newIds = newDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    // reference drops from the EXACT pair ops
    val selfDrops = DedupOps.ngramJaccardPairs(newDocs, tau = 0.8)
      .select("b_id").collect().map(_.getLong(0)).toSet
    val crossDrops = DedupOps.crossJaccardPairs(newDocs, existing, tau = 0.8)
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    assert(selfDrops.nonEmpty && crossDrops.nonEmpty,
      "gate split should exercise both drop reasons")
    val surv = CurationPipeline.incrementalDedup(newDocs, existing)
      .collect().map(_.getLong(0)).toSet
    assert(surv == newIds -- selfDrops -- crossDrops)
  }

  test("decontaminateNearDup: survivors + flagged partition the corpus; LSH path identical") {
    val corpusIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = DedupOps.crossJaccardPairs(corpus, ref, tau = 0.8)
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    val survivors = CurationPipeline.decontaminateNearDup(corpus, ref, tau = 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == corpusIds -- flagged)
    assert(flagged.subsetOf(corpusIds))
    val survivorsLsh = CurationPipeline
      .decontaminateNearDup(corpus, ref, tau = 0.8, useLsh = true)
      .collect().map(_.getLong(0)).toSet
    assert(survivorsLsh == survivors)
  }
}
