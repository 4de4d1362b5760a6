package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops._

/** Round-9 hardening specs for the two-phase cumsum family
  * (quotaSample / globalShuffle / packSequences).
  *
  * The r8 driver gate flagged `quota_sample` hash-red: the old construction
  * stamped `spark_partition_id()` after a range exchange and required the
  * totals branch and the window branch to observe the SAME partition
  * assignment — which holds only while the sample-derived range boundaries
  * are planned once and reused. The rewrite derives the bucket id as a pure
  * row function (md5-prefix bucket, or collected-once quantile bounds), so
  * the two branches agree BY CONSTRUCTION. These specs pin that: two-phase
  * == naive single-window at several bucket counts, and bit-identical
  * results across repeated executions.
  */
class Round9Spec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)

  test("hexBucket: monotone in key order, in range, balanced on md5 keys") {
    import spark.implicits._
    val keyed = (1L to 5000L).toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("k"))
      .withColumn("pid", Buckets.hexBucket(col("k"), 32))
    val rows = keyed.select("k", "pid").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(rows.forall { case (_, p) => p >= 0 && p < 32 })
    // monotone: sorting by key must leave pid non-decreasing
    assert(rows.map(_._2).sliding(2).forall(w => w.head <= w.last))
    // uniform keys → every bucket hit, none pathologically hot
    val byBucket = rows.groupBy(_._2).map(_._2.length)
    assert(byBucket.size == 32 && byBucket.max < 5000 / 32 * 3)
  }

  test("quotaSample: two-phase == naive per-source window at 1/3/32 buckets, " +
    "and 5 consecutive runs are bit-identical") {
    val naive = docs
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("pri"))
      .withColumn("tb", coalesce(sum(col("n_tokens")).over(
        Window.partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "tb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    Seq(1, 3, 32).foreach { p =>
      val got = CurationPipeline.quotaSample(docs, partitions = p)
        .select("doc_id", "tokens_before").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == naive, s"bucket count $p diverged from the naive window")
    }
    val runs = (1 to 5).map { _ =>
      CurationPipeline.quotaSample(docs).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).sortBy(_._1).toSeq
    }
    assert(runs.distinct.size == 1, "quotaSample must be run-to-run deterministic")
  }

  test("globalShuffle: two-phase == naive global rank at 1/3/32 buckets") {
    val naive = docs
      .select(col("doc_id"),
        md5(concat_ws("-", lit("42"), col("doc_id").cast("string"))).as("k"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("k"), col("doc_id"))).cast("long"))
      .select("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    Seq(1, 3, 32).foreach { p =>
      val got = CurationPipeline.globalShuffle(docs, partitions = p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == naive, s"bucket count $p diverged from the naive rank")
    }
  }

  test("sudoku planted-solution oracle: uniqueness-repaired puzzles solve to " +
    "exactly the grid they were blanked from") {
    import graft.ops.PuzzleOps
    // driver-side ground truth (the same pure function the oracle bakes
    // into its VALUES literal) vs the distributed solve
    val expected = (0L until 60L).map { id =>
      val (pz, sol) = PuzzleOps.puzzleAndSolutionForId(id, 40)
      // puzzle is the planted grid with holes
      assert(pz.length == 81 && sol.length == 81)
      assert(pz.zip(sol).forall { case (p, s) => p == '0' || p == s })
      id -> sol
    }.toMap
    val got = PuzzleOps.sudokuSolveAll(PuzzleOps.sudokuPuzzlesUnique(spark, 60, 40))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.length == 60)
    got.foreach { case (id, sol, valid, kept) =>
      assert(valid && kept)
      assert(sol == expected(id), s"puzzle $id did not recover its planted grid")
    }
    // repair must leave at least one genuinely blanked puzzle (not all
    // restored to the full grid — otherwise the test proves nothing)
    val holes = PuzzleOps.sudokuPuzzlesUnique(spark, 60, 40)
      .collect().map(_.getString(1).count(_ == '0'))
    assert(holes.exists(_ >= 20), "repair degenerated: puzzles have almost no blanks")
  }

  test("trainer dictionary cap: capped == uncapped when the cap exceeds the " +
    "vocabulary, and a tight cap still yields a working lossless encoder") {
    // gate corpus vocabulary << default cap, so the driver-gate results are
    // unchanged by construction; pin it explicitly at an explicit huge cap
    val mergesDefault = TextAnalysis.trainBpe(docs, numMerges = 40)
    val mergesHuge = TextAnalysis.trainBpe(docs, numMerges = 40, maxVocab = Int.MaxValue)
    assert(mergesDefault == mergesHuge, "default cap must not alter gate-corpus training")
    val uniDefault = TextAnalysis.trainUnigram(docs, vocabSize = 128)
    val uniHuge = TextAnalysis.trainUnigram(docs, vocabSize = 128, maxVocab = Int.MaxValue)
    assert(uniDefault == uniHuge)
    // a cap far below the corpus vocabulary: training must stay functional
    // and the encoder lossless (single chars always survive as fallbacks)
    val mergesTight = TextAnalysis.trainBpe(docs, numMerges = 40, maxVocab = 50)
    val enc = TextAnalysis.bpeEncode(docs, mergesTight)
      .select(col("doc_id"), concat_ws("", col("bpe_tokens")).as("joined"))
    val orig = docs.select(col("doc_id"),
      concat_ws("", transform(TextOps.tokens(col("text")),
        w => concat(w, lit("</w>")))).as("want"))
    val bad = enc.join(orig, "doc_id").filter(col("joined") =!= col("want")).count()
    assert(bad == 0, "tight-cap BPE must stay lossless")
  }

  test("packSequences: quantile-bound buckets reproduce the global cumsum " +
    "on skewed doc_id distributions") {
    import spark.implicits._
    // heavily skewed ids (clustered + sparse tail) stress the bound search
    val ids = ((1L to 150L) ++ Seq(100000L, 100001L, 5000000L, 900000000L)).sorted
    val rnd = new scala.util.Random(9)
    val counts = ids.map(i => (i, 1 + rnd.nextInt(40)))
    val synth = counts.map { case (i, n) => (i, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val expected = {
      var cum = 0L
      counts.map { case (i, n) => val s = cum / 64L; cum += n; i -> s }.toMap
    }
    Seq(1, 3, 32).foreach { p =>
      val got = CurationPipeline.packSequences(synth, 64L, p)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expected, s"bucket count $p changed packing")
    }
  }
}
