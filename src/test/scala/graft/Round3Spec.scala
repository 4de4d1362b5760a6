package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.BoundedLevenshtein
import graft.ops.{DedupOps, SortOps, TextOps}
import graft.sources.IO
import graft.streaming.Streams

import scala.util.Random

/** Round-3 fixes: Myers bit-parallel levenshtein, streaming secondary sort,
  * length-bucketed edit-distance blocking, checkpoint parameterization, and
  * the round-2 ADVICE hardening items. */
class Round3Spec extends SparkSpecBase {

  // ---- BoundedLevenshtein: exact parity with the builtin kernel ----

  private def builtinLev(a: String, b: String, k: Int): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b), k)

  private def myersLev(a: String, b: String, k: Int): Int =
    BoundedLevenshtein.distance(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("bounded_levenshtein == builtin on random ASCII strings and planted edits") {
    val rnd = new Random(42)
    val alphabet = "abcdefg xyz"
    def randStr(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 2000) {
      val a = randStr(rnd.nextInt(64))
      // half the cases: b = a with a few random edits (distances near 0..k);
      // half: independent string (distances near len)
      val b = if (rnd.nextBoolean()) {
        var s = a.toCharArray.toBuffer
        for (_ <- 0 until rnd.nextInt(8)) {
          val op = rnd.nextInt(3)
          if (s.isEmpty || op == 0) s.insert(rnd.nextInt(s.length + 1), alphabet(rnd.nextInt(alphabet.length)))
          else if (op == 1) s.remove(rnd.nextInt(s.length))
          else s(rnd.nextInt(s.length)) = alphabet(rnd.nextInt(alphabet.length))
        }
        s.mkString
      } else randStr(rnd.nextInt(64))
      val k = rnd.nextInt(15)
      assert(myersLev(a, b, k) == builtinLev(a, b, k), s"a='$a' b='$b' k=$k")
    }
  }

  test("bounded_levenshtein edge cases: empty, equal, threshold 0, just-over") {
    assert(myersLev("", "", 0) == 0)
    assert(myersLev("", "abc", 2) == -1)
    assert(myersLev("", "abc", 3) == 3)
    assert(myersLev("same", "same", 0) == 0)
    assert(myersLev("same", "samf", 0) == -1)
    assert(myersLev("kitten", "sitting", 3) == 3)
    assert(myersLev("kitten", "sitting", 2) == -1)
  }

  test("bounded_levenshtein falls back identically on non-ASCII and >64-char inputs") {
    val cases = Seq(
      ("héllo wörld", "hallo world", 5),
      ("日本語テキスト", "日本語のテキスト", 3),
      ("a" * 80 + "xyz", "a" * 80 + "abc", 4),
      ("a" * 100, "a" * 90, 5))
    for ((a, b, k) <- cases)
      assert(myersLev(a, b, k) == builtinLev(a, b, k), s"a='$a' b='$b' k=$k")
  }

  test("bounded_levenshtein via SQL matches builtin levenshtein on documents") {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, sfDir).select(substring(col("text"), 1, 48).as("pfx"))
      .createOrReplaceTempView("r3_pfx")
    val bad = spark.sql(
      """SELECT a.pfx, b.pfx FROM r3_pfx a JOIN r3_pfx b
         ON bounded_levenshtein(a.pfx, b.pfx, 12) != levenshtein(a.pfx, b.pfx, 12)""")
    assert(bad.isEmpty, "native kernel must agree with builtin on every pair")
  }

  // ---- levenshteinPairs: bucketed blocking is output-identical ----

  test("levenshteinPairs == unbucketed builtin formulation (equivalence)") {
    val docs = Tables.documents(spark, sfDir)
    val p = docs.select(col("doc_id"),
      substring(col("text"), 1, 48).as("pfx"),
      element_at(TextOps.tokens(col("text")), 1).as("tok"))
    val reference = p.as("a").join(p.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist", levenshtein(col("a.pfx"), col("b.pfx"), 12).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 12)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"), col("dist"))
    val got = DedupOps.levenshteinPairs(docs)
    assert(got.exceptAll(reference).isEmpty && reference.exceptAll(got).isEmpty,
      "length-bucketed + bit-parallel form must emit exactly the contract pairs")
  }

  test("levenshteinPairs length bucket actually prunes variable-length keys") {
    import spark.implicits._
    // short vs long first-line keys sharing the first token: only the
    // within-bucket near pair may surface
    val docs = Seq(
      (1L, "alpha bb"),
      (2L, "alpha bc"),
      (3L, "alpha " + ("z" * 40)))
      .toDF("doc_id", "text")
    val got = DedupOps.levenshteinPairs(docs, maxDist = 2, prefixLen = 48)
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  // ---- streaming secondary sort ----

  test("secondary_sort matches the collect_list formulation and never plans one") {
    val events = Tables.events(spark, sfDir)
    val reference = events.groupBy(col("user_id"))
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("ts"), col("event_id")))),
          x => x.getField("event_id").cast("string")),
        ",").as("ordered_events"),
        count(lit(1)).as("n_events"))
    val got = SortOps.secondarySort(events)
    assert(got.exceptAll(reference).isEmpty && reference.exceptAll(got).isEmpty)
    got.collect() // finalize the (adaptive) plan before asserting its shape
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate") && !plan.contains("collect_list"),
      s"secondary sort must stream groups, not buffer arrays:\n$plan")
  }

  // ---- connectedComponents reliable checkpointing ----

  test("connectedComponents with a reliable checkpoint dir converges and writes it") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val got = DedupOps.connectedComponents(pairs, checkpointDir = Some(tmp))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "reliable checkpoint must materialize files under the dir")
  }

  // ---- ADVICE hardening ----

  test("upsertByRewrite refuses outPath == basePath (self-overwrite data loss)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_upsert_guard").toString
    val base = s"$tmp/base"
    Seq((1L, "a")).toDF("k", "v").write.parquet(base)
    val updates = Seq((1L, "b")).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      IO.upsertByRewrite(spark, base, updates, "k", base)
    }
    assert(ex.getMessage.contains("staging"))
    // base is intact
    assert(spark.read.parquet(base).count() == 1)
  }

  test("readRollup on a rollup with no committed batches returns an empty frame") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rollup_empty").toString
    val empty = Streams.readRollup(spark, s"$tmp/rollup_never_written")
    assert(empty.isEmpty && empty.columns.toSeq ==
      Seq("hour", "event_type", "n_events", "sum_value"))
    // existing but batch-less dir (checkpoint raced ahead of first trigger)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/rollup2"))
    assert(Streams.readRollup(spark, s"$tmp/rollup2").isEmpty)
  }

  test("combineRead sizes correctly for a dataset under a dot-directory ancestor") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_combine_dot").toString
    val ds = s"$tmp/.cache/dataset" // ancestor dot-dir must NOT hide the data
    (1 to 2000).toDF("x").repartition(20).write.parquet(ds)
    val combined = IO.combineRead(spark, ds,
      targetPartitionBytes = 8 * 1024, openCostInBytes = 4 * 1024)
    assert(combined.count() == 2000)
    assert(combined.rdd.getNumPartitions > 1,
      "hidden-file filter must not zero out the size estimate for dot-dir ancestors")
  }
}
