package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.ops._
import graft.streaming.Streams

/** Round-10: persisted-index lifecycle — compaction folds increments back
  * into the base relation (query parity before == after, pruning
  * preserved), a full rebuild invalidates stale increments, part-file-less
  * increment dirs read as empty, and every centroid-assignment path shares
  * ONE tie-break rule (round-6 cosine desc, index asc). */
class Round10Spec extends SparkSpecBase {

  import spark.implicits._

  private def wipe(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  private def exists(dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def topk(dir: String, q: org.apache.spark.sql.DataFrame) =
    SimilarityOps.ivfQueryIndex(spark, dir, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sorted

  test("compactIndex: query parity before == after, increments folded, " +
    "partition pruning preserved, idempotent re-run") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/tmp/graft_test_ivf_compact"
    wipe(dir)
    val emb = Tables.embeddings(spark, sfDir)
    SimilarityOps.ivfWriteIndex(spark, emb.filter(col("vec_id") < 250), dir)
    val rest = emb.filter(col("vec_id") >= 250).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Streams.ivfAppendStream(
      input.toDF().toDF("vec_id", "embedding"), dir, s"$dir/ckpt")
    try { input.addData(rest.toIndexedSeq: _*); q.processAllAvailable() }
    finally q.stop()
    assert(exists(s"$dir/postings_inc"), "precondition: increments exist")
    val queries = emb.filter(col("vec_id") < 10)
    val before = topk(dir, queries)
    val nBefore = SimilarityOps.readIndexPostings(spark, dir).count()
    SimilarityOps.compactIndex(spark, dir)
    assert(!exists(s"$dir/postings_inc"), "increments folded away")
    assert(!exists(s"$dir/postings_cmp"), "staging dir swapped away")
    assert(SimilarityOps.readIndexPostings(spark, dir).count() == nBefore,
      "no posting lost or duplicated by compaction")
    val after = SimilarityOps.ivfQueryIndex(spark, dir, queries)
    assert(topk(dir, queries) == before, "query parity after compaction")
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      "compacted postings scan must stay partition-pruned on bucket")
    // idempotent: a second run with no increments is a no-op
    SimilarityOps.compactIndex(spark, dir)
    assert(topk(dir, queries) == before)
  }

  test("ivfWriteIndex rebuild clears stale increments (old-model buckets " +
    "never leak into the new index)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/tmp/graft_test_ivf_rebuild"
    wipe(dir)
    val emb = Tables.embeddings(spark, sfDir)
    SimilarityOps.ivfWriteIndex(spark, emb.filter(col("vec_id") < 200), dir)
    val more = emb.filter(col("vec_id") >= 200 && col("vec_id") < 260).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Streams.ivfAppendStream(
      input.toDF().toDF("vec_id", "embedding"), dir, s"$dir/ckpt")
    try { input.addData(more.toIndexedSeq: _*); q.processAllAvailable() }
    finally q.stop()
    assert(exists(s"$dir/postings_inc"))
    // full rebuild over a DIFFERENT corpus slice retrains the model;
    // increments bucketed under the old model must not survive it
    val rebuilt = emb.filter(col("vec_id") < 100)
    SimilarityOps.ivfWriteIndex(spark, rebuilt, dir)
    assert(!exists(s"$dir/postings_inc"), "rebuild must clear increments")
    assert(SimilarityOps.readIndexPostings(spark, dir).count() == rebuilt.count(),
      "index contains exactly the rebuilt corpus")
  }

  test("minhashWriteStore rebuild clears stale increments; " +
    "compactMinhashStore folds appends with relation parity") {
    val dir = "/tmp/graft_test_mh_compact"
    wipe(dir)
    val docs = Tables.documents(spark, sfDir)
    val existing = docs.filter(col("doc_id") % 5 === 0)
    val accepted = docs.filter(col("doc_id") % 5 === 1)
    DedupOps.minhashWriteStore(existing, dir)
    DedupOps.minhashAppendStore(accepted, dir, "batch_0001")
    assert(exists(s"$dir/bands_inc"))
    def rel() = DedupOps.readMinhashStore(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val before = rel()
    DedupOps.compactMinhashStore(spark, dir)
    assert(!exists(s"$dir/bands_inc"), "increments folded away")
    assert(!exists(s"$dir/bands_cmp"), "staging dir swapped away")
    assert(rel() == before, "banded relation identical after compaction")
    // survivor parity: dedup against the compacted store == recompute
    val nextBatch = docs.filter(col("doc_id") % 5 === 2)
    val grown = existing.unionByName(accepted)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(CurationPipeline.incrementalDedupFromStore(nextBatch, grown, dir))
      == ids(CurationPipeline.incrementalDedup(nextBatch, grown)))
    // idempotent re-run (no increments left) is a no-op
    DedupOps.compactMinhashStore(spark, dir)
    assert(rel() == before)
    // a REBUILD after appends clears bands_inc: the store equals exactly
    // the fresh corpus, no stale signature rows
    DedupOps.minhashAppendStore(accepted, dir, "batch_0002")
    DedupOps.minhashWriteStore(existing, dir)
    assert(!exists(s"$dir/bands_inc"), "rebuild must clear increments")
    val freshDir = "/tmp/graft_test_mh_compact_fresh"
    wipe(freshDir)
    DedupOps.minhashWriteStore(existing, freshDir)
    assert(rel() == DedupOps.readMinhashStore(spark, freshDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq)
  }

  test("part-file-less increment dirs read as empty (interrupted write / " +
    "empty micro-batch) instead of breaking schema inference") {
    val dir = "/tmp/graft_test_ivf_emptydir"
    wipe(dir)
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
    SimilarityOps.ivfWriteIndex(spark, emb, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/postings_inc/batch_7"))
    assert(SimilarityOps.readIndexPostings(spark, dir).count() == emb.count())
    val queries = emb.filter(col("vec_id") < 5)
    assert(topk(dir, queries).nonEmpty)
    // same contract for the minhash store
    val mh = "/tmp/graft_test_mh_emptydir"
    wipe(mh)
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 50)
    DedupOps.minhashWriteStore(docs, mh)
    val n = DedupOps.readMinhashStore(spark, mh).count()
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$mh/bands_inc/stub"))
    assert(DedupOps.readMinhashStore(spark, mh).count() == n)
  }

  test("dedupParagraphs: zero-text-shuffle path is output-identical to the " +
    "regroup form; no shuffle exchange carries document text") {
    val docs = Tables.documents(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    val got = rows(DedupOps.dedupParagraphs(docs))
    assert(got == rows(DedupOps.dedupParagraphsRegroup(docs)),
      "r10 bloom-split form must be row-identical to the regroup form")
    assert(got.exists(_._3 > 0), "gate corpus should contain boilerplate")
    assert(got.exists(_._3 == 0), "gate corpus should contain clean docs")
    // plan shape: document text (the framed paragraph ARRAY or the raw text
    // column) never enters a shuffle exchange; only narrow hash/id rows and
    // candidate paragraph strings ("para") may shuffle. AQE off so the
    // executed tree exposes raw ShuffleExchangeExec nodes to traverse.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = DedupOps.dedupParagraphs(docs)
      df.collect()
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val shuffled = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.output.map(_.name)
      }.flatten
      // The hash-frequency / exact-verify stages run EAGERLY inside the op
      // over narrow (hash, id) and candidate-paragraph relations; the
      // returned rebuild plan is scan -> in-row project (clean branch)
      // unioned with scan -> broadcast-join(drop sets) -> in-row project
      // (dirty branch) — NO shuffle exchange at all, so document text can
      // never be exchanged.
      assert(shuffled.isEmpty,
        s"rebuild plan must not shuffle anything, got exchanges of: $shuffled")
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("BroadcastHashJoin"),
        "dirty branch joins its drop sets broadcast while they fit")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("kmeans|| init: deterministic, k centers of the right shape, Lloyd " +
    "still improves on it, and it recovers adversarial small clusters the " +
    "strided pick misses") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = SimilarityOps.kmeansParallelInit(emb, k = 8)
    val b = SimilarityOps.kmeansParallelInit(emb, k = 8)
    assert(a.length == 8 && a.head.length == b.head.length)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "init must be deterministic")
    // Lloyd monotonicity from the parallel init (same gate as strided)
    def obj(cs: Array[Array[Float]]): Double =
      SimilarityOps.assignFromCentroidRelation(spark, emb,
          SimilarityOps.kmeansCentroidRelation(spark, cs))
        .agg(org.apache.spark.sql.functions.avg("cos")).collect()(0).getDouble(0)
    val trained = SimilarityOps.trainKmeans(emb, k = 8, iters = 5, init = "parallel")
    assert(obj(trained) >= obj(a) - 1e-6, "Lloyd must not worsen the parallel init")
    // adversarial mixture: ids 0..89 in one tight mode near e1, ids 90..99 a
    // tiny far mode near e2. A stride-31 pick of k=2 draws ids 0 and 31 —
    // both from the big mode — while the distance-weighted oversampling
    // must land a candidate in the small mode.
    val adv = (0L until 100L).map { i =>
      val base = if (i < 90) Array(1.0f, 0.0f, 0.01f * (i % 7))
                 else Array(0.0f, 1.0f, 0.01f * (i % 7))
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    val strided = SimilarityOps.trainKmeans(adv, k = 2, iters = 0)
    val par = SimilarityOps.trainKmeans(adv, k = 2, iters = 0, init = "parallel")
    def hasSmallMode(cs: Array[Array[Float]]): Boolean =
      cs.exists(c => c(1) > c(0)) // a center dominated by the e2 direction
    assert(!hasSmallMode(strided), "precondition: strided init misses the small mode")
    assert(hasSmallMode(par), "kmeans|| init must seed the small far mode")
    assert(obj2(adv, par) > obj2(adv, strided) + 0.01,
      "parallel init must beat strided on the adversarial mixture")
  }

  private def obj2(emb: org.apache.spark.sql.DataFrame,
                   cs: Array[Array[Float]]): Double =
    SimilarityOps.assignFromCentroidRelation(spark, emb,
        SimilarityOps.kmeansCentroidRelation(spark, cs))
      .agg(org.apache.spark.sql.functions.avg("cos")).collect()(0).getDouble(0)

  test("crossJaccardPairs maxRefDf guard: hot reference shingle fails " +
    "loudly; a clean reference passes with identical output") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "eta theta iota kappa lambda mu")).toDF("doc_id", "text")
    // every ref doc contains the same hot 3-shingle "common words here"
    val hotRef = (10L to 15L)
      .map(i => (i, s"common words here unique$i tail$i end$i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      DedupOps.crossJaccardPairs(corpus, hotRef, tau = 0.1, maxRefDf = 3).collect()
    }
    assert(e.getMessage.contains("maxRefDf") &&
      e.getMessage.contains("crossMinhashPairs"),
      s"guard message must name the knob and the LSH twin: ${e.getMessage}")
    // guard satisfied -> output identical to the unguarded run
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val cleanRef = Seq((10L, "alpha beta gamma delta epsilon zeta extra"))
      .toDF("doc_id", "text")
    assert(rows(DedupOps.crossJaccardPairs(corpus, cleanRef, tau = 0.5, maxRefDf = 10))
      == rows(DedupOps.crossJaccardPairs(corpus, cleanRef, tau = 0.5)))
  }

  test("distCh: distributed chmod/chown over a tree — every node changed, " +
    "audit rows report outcomes, failures are rows not exceptions") {
    val root = "/tmp/graft_test_distch"
    wipe(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach { d =>
      (0 until 4).foreach { f =>
        val p = new org.apache.hadoop.fs.Path(s"$root/dir$d/file$f.txt")
        val out = fs.create(p); out.write(42); out.close()
      }
    }
    val audit = graft.sources.IO.distCh(spark, root,
      mode = Some("600"), owner = Some("root"), group = Some("root"))
    val rows = audit.collect()
    assert(rows.length == 16, s"3 dirs x 4 files + 3 dirs + root = 16, got ${rows.length}")
    assert(rows.forall(_.getBoolean(2)), "every node's mode changed")
    assert(rows.forall(_.getBoolean(3)), "every node's owner changed")
    assert(rows.forall(_.isNullAt(5)), "no errors expected")
    val perm = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$root/dir1/file2.txt")).getPermission
    assert(perm.toString == "rw-------", s"chmod 600 must land, got $perm")
    // a bad owner fails AS A ROW (the DistCh counter contract), and the
    // other requested ops on the same node still apply
    val audit2 = graft.sources.IO.distCh(spark, root,
      mode = Some("644"), owner = Some("no_such_user_graft"))
    val r2 = audit2.collect()
    assert(r2.forall(r => r.getBoolean(2) && !r.getBoolean(3) && !r.isNullAt(5)),
      "owner change must fail per-row while chmod still applies")
  }

  test("logGrepSort: grep + column sortSpec == a naive single-window rank, " +
    "at 1, 3 and 32 buckets") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val lines = Seq(
      "2024-01-01T10:00:00 view 3", "2024-01-01T09:00:00 click 7",
      "2024-01-02T08:00:00 view 1", "2024-01-01T09:30:00 buy 2",
      "2024-01-03T11:00:00 click 5", "2024-01-01T12:00:00 click 5",
      "not a log line at all", "2024-01-02T23:00:00 view 9"
    ).toDF("line")
    val naive = lines.filter(col("line").rlike("click|view"))
      .withColumn("k", concat_ws("\u0000",
        coalesce(split(col("line"), " ").getItem(1), lit("")), col("line")))
      .withColumn("pos", row_number().over(Window.orderBy(col("k"))).cast("long"))
      .select("pos", "line").collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq
    for (parts <- Seq(1, 3, 32)) {
      val got = TextOps.logGrepSort(lines, "click|view",
          sortColumns = Seq(1), partitions = parts)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == naive, s"two-phase rank at $parts buckets must equal the window")
    }
    assert(naive.length == 6 && naive.map(_._1) == (1L to 6L),
      "grep keeps 6 of 8 lines with a 1..6 rank")
    // sortSpec ordering: all clicks rank before all views
    val types = naive.sortBy(_._1).map(_._2.split(" ")(1))
    assert(types == Seq("click", "click", "click", "view", "view", "view"))
  }

  test("NearestCentroids tie-break: round-6 cosine desc, index asc — " +
    "sub-1e-6 differences resolve by index, super-1e-6 by score") {
    import graft.functions.NearestCentroids
    val dim = 2
    // unit vectors at angles chosen so centroid cosines to the query are
    // (a) equal at 6 decimals but unequal raw -> index wins even though the
    // HIGHER index has the (infinitesimally) larger raw cosine, and
    // (b) distinct at 6 decimals -> score wins regardless of index
    val query = Array(1.0f, 0.0f)
    // raw cosines: lo = 0.79999999..., hi = 0.80000001... (hi raw-greater by
    // ~2e-8) — both round to 0.800000, so the index tie-break must pick the
    // LOWER index even though the higher index wins on raw score (this is
    // exactly the case where the pre-r10 unrounded argmax diverged from the
    // relation/oracle ranking)
    val nearTieLo = Array(0.8f, 0.6f)
    val nearTieHi = Array(0.8000001f, 0.6f)
    val clearlyBetter = Array(0.9f, math.sqrt(1 - 0.81).toFloat)
    assert(dim == 2)
    val m1 = new NearestCentroids.Model(Array(nearTieLo, nearTieHi))
    val got1 = NearestCentroids.compute(
      new GenericArrayData(query), m1, 2).toIntArray().toSeq
    assert(got1 == Seq(0, 1),
      s"sub-1e-6 raw difference must fall to the index tie-break, got $got1")
    val m2 = new NearestCentroids.Model(Array(nearTieLo, clearlyBetter))
    val got2 = NearestCentroids.compute(
      new GenericArrayData(query), m2, 2).toIntArray().toSeq
    assert(got2 == Seq(1, 0), s"distinct round-6 scores rank by score, got $got2")
  }
}
