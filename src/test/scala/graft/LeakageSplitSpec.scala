package graft

import org.apache.spark.sql.functions._
import graft.ops.{CurationPipeline, DedupOps}

/** Leakage-free train/val split: the whole point is that no near-dup pair
  * straddles the boundary, so that is the headline property; the coin is
  * pinned as a pure function of the canonical group id. */
class LeakageSplitSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)

  test("leakageFreeSplit: no near-dup pair straddles the train/val boundary") {
    val split = CurationPipeline.leakageFreeSplit(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = DedupOps.minhashLshPairs(docs, tau = 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "gate corpus should contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) straddles: ${split(a)} vs ${split(b)}")
    }
  }

  test("leakageFreeSplit: partition of the corpus, coin a pure function of group_id") {
    val rows = CurationPipeline.leakageFreeSplit(docs, valFrac = 0.1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = docs.count()
    assert(rows.length == n && rows.map(_._1).distinct.length == n)
    assert(rows.map(_._3).toSet.subsetOf(Set("train", "val")))
    assert(rows.exists(_._3 == "train") && rows.exists(_._3 == "val"))
    // replay the coin
    rows.foreach { case (_, g, s) =>
      val u = java.lang.Math.floorMod(g * 2654435761L, 4294967296L).toDouble / 4294967296.0
      assert((if (u < 0.1) "val" else "train") == s, s"group $g coin mismatch")
    }
    // same group always lands on one side (implied by the coin, asserted anyway)
    rows.groupBy(_._2).foreach { case (g, rs) =>
      assert(rs.map(_._3).distinct.length == 1, s"group $g split across sides")
    }
  }
}
