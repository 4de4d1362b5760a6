package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Per-source dataset card: counts, duplicate fraction, Gopher pass rate,
  * and the integer-arithmetic mean-quality contract. */
class DatasetCardSpec extends SparkSpecBase {

  import spark.implicits._

  test("datasetCard: per-source counts, dup fraction, keep fraction") {
    val good = (Seq.fill(24)("the") ++ Seq.fill(26)("table")).mkString(" ")
    val docs = Seq(
      (1L, "srcA", good), (2L, "srcA", good),            // exact dup pair
      (3L, "srcB", "ten short words only here " * 2))    // fails gopher min-words
      .toDF("doc_id", "source", "text")
    val card = CurationPipeline.datasetCard(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(card("srcA").getLong(1) == 2 && card("srcB").getLong(1) == 1)
    assert(card("srcA").getDouble(5) == 1.0, "both srcA docs are copies")
    assert(card("srcB").getDouble(5) == 0.0)
    assert(card("srcA").getDouble(4) == 1.0, "50-word stopworded docs pass gopher")
    assert(card("srcB").getDouble(4) == 0.0, "10-word doc fails min-words")
    assert(card("srcA").getLong(2) == 100L, "token totals sum per source")
    val mq = card("srcA").getDouble(3)
    assert(mq > 0.0 && mq <= 1.0)
  }

  test("datasetCard: n_docs partitions the corpus (no row lost or doubled)") {
    val docs = Tables.documents(spark, sfDir)
    val total = CurationPipeline.datasetCard(docs)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total == docs.count())
  }
}
