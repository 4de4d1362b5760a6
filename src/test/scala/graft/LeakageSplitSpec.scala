package graft

import org.apache.spark.sql.functions._
import graft.ops.{CurationPipeline, DedupOps}

/** Leakage-free train/val split: the whole point is that no near-dup pair
  * straddles the boundary, so that is the headline property; the coin is
  * pinned as a pure function of the canonical group id. */
class LeakageSplitSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)

  test("temperatureSample: alpha=1 keeps all; alpha flattens toward equal counts; coin/rate replay") {
    import graft.ops.TextAnalysis
    val n = docs.count()
    assert(TextAnalysis.temperatureSample(docs, alpha = 1.0).count() == n)
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    val kept = TextAnalysis.temperatureSample(docs, alpha = 0.5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // replay rate + coin per kept row; and no row that qualifies is missing
    kept.foreach { case (id, src, p) =>
      val pTrue = math.rint(math.pow(nMin.toDouble / counts(src), 0.5) * 1e6) / 1e6
      assert(p == pTrue, s"doc $id source $src: p_keep $p vs $pTrue")
      val u = java.lang.Math.floorMod(id * 2654435761L, 4294967296L).toDouble / 4294967296.0
      assert(u < p)
    }
    val keptIds = kept.map(_._1).toSet
    docs.select("doc_id", "source").collect().foreach { r =>
      val (id, src) = (r.getLong(0), r.getString(1))
      val p = math.rint(math.pow(nMin.toDouble / counts(src), 0.5) * 1e6) / 1e6
      val u = java.lang.Math.floorMod(id * 2654435761L, 4294967296L).toDouble / 4294967296.0
      assert(keptIds.contains(id) == u < p, s"doc $id keep mismatch")
    }
    // flattening: the spread of per-source kept counts shrinks vs raw
    val keptBySrc = kept.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    def spread(m: Map[String, Double]) = m.values.max / m.values.min
    assert(spread(keptBySrc) <= spread(counts.view.mapValues(_.toDouble).toMap) + 1e-9)
  }

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
