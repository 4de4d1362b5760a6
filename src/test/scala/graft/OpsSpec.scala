package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Semantics specs for operators whose oracle check is rows-only, plus
  * invariants the DuckDB hash-compare can't express. Runs on sf0.001. */
class OpsSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)
  private def li = Tables.lineitem(spark, sfDir)
  private def emb = Tables.embeddings(spark, sfDir)

  test("wordcount totals equal raw token count") {
    val total = TextOps.wordCount(docs).agg(sum("n")).head.getLong(0)
    val direct = docs.select(size(TextOps.tokens(col("text"))).as("k"))
      .agg(sum("k")).head.getLong(0)
    assert(total == direct && total > 0)
  }

  test("minhash-LSH pair set equals exact ngram-jaccard at tau=0.8") {
    val exact = DedupOps.ngramJaccardPairs(docs, tau = 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLshPairs(docs, tau = 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH recall failure: missing=${exact -- lsh} extra=${lsh -- exact}")
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
  }

  test("simhash pairs: near-dup docs land within hamming budget") {
    val pairs = DedupOps.simhashPairs(docs, maxHamming = 6).collect()
    assert(pairs.forall(_.getAs[Int]("hamming") <= 6))
    // every very-near pair by jaccard should also be simhash-near
    val nearJacc = DedupOps.ngramJaccardPairs(docs, tau = 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val simSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (nearJacc.isEmpty) 1.0
      else nearJacc.count(simSet.contains).toDouble / nearJacc.size
    assert(recall >= 0.8, s"simhash recall on j>=0.9 pairs was $recall")
  }

  test("exact dedup partitions the corpus") {
    val d = DedupOps.dedupExact(docs)
    assert(d.agg(sum("n_copies")).head.getLong(0) == docs.count())
  }

  test("IVF ANN recall vs brute force") {
    val bf = SimilarityOps.bruteForceTopK(spark, emb)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(spark, emb)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.count(ivf.contains).toDouble / bf.size
    assert(recall >= 0.3, s"IVF recall was $recall") // random vectors: probing 3/10 buckets
    assert(ivf.map(_._1) == bf.map(_._1), "every query answered")
  }

  test("sign-LSH ANN: planted-cluster recall, plus structure on real embeddings") {
    import spark.implicits._
    // planted data where LSH provably works: 100 bases, each with a partner
    // at cosine ≥ ~0.95 (small additive noise). θ ≈ 18° ⇒ per-bit collide
    // p ≈ 0.9, 8 tables × 4 bits ⇒ recall ≈ 1 − (1 − 0.9⁴)^8 ≈ 0.996.
    val rnd = new scala.util.Random(7)
    val dim = 32
    val rows = (0 until 100).flatMap { i =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val partner = base.map(v => v + (rnd.nextGaussian() * 0.1f).toFloat)
      Seq((i.toLong, base), (i + 1000L, partner))
    }
    val planted = rows.toDF("vec_id", "embedding")
    val got = SimilarityOps.annLshTopK(spark, planted, nQueries = 100, k = 1)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val hits = got.count { case (q, n) => n == q + 1000L }
    assert(hits >= 95, s"planted partner must be the top-1 neighbour; got $hits/100")
    // real (near-random) embeddings: every query answered, k rows each
    val real = SimilarityOps.annLshTopK(spark, emb)
    val byQ = real.groupBy("q_id").count().collect()
    assert(byQ.length == 10 && byQ.forall(_.getLong(1) <= 5))
  }

  test("teraSort output validates: zero inversions, checksum matches direct sum") {
    val v = SortOps.sortValidate(spark, li).head
    assert(v.getAs[Long]("inversions") == 0L)
    assert(v.getAs[Long]("row_cnt") == li.count())
    val direct = li.select(
      sum(expr("cast(round(l_extendedprice*100, 0) as bigint) + l_orderkey % 1000003 + l_linenumber")))
      .head.getLong(0)
    assert(v.getAs[Long]("checksum") == direct)
  }

  test("sessionize conserves events and respects the gap") {
    val ev = Tables.events(spark, sfDir)
    val sess = AggOps.sessionize(ev)
    assert(sess.agg(sum("n_events")).head.getLong(0) == ev.count())
    assert(sess.filter(col("session_end") < col("session_start")).count() == 0)
  }

  test("datagen is the documented LCG") {
    val rows = DataGen.generate(spark, 3).orderBy("id").collect()
    assert(rows(0).getAs[Long]("r1") == 12345L)
    assert(rows(1).getAs[Long]("r1") == (1103515245L + 12345L) % 2147483648L)
    rows.foreach { r =>
      val v = r.getAs[Double]("value"); assert(v >= 0.0 && v < 1.0)
    }
  }

  test("approx sketches are within tolerance of exact answers") {
    val row = AggOps.approxSketch(li).head
    val exactParts = li.select(countDistinct(col("l_partkey"))).head.getLong(0)
    val approxParts = row.getAs[Long]("approx_parts")
    assert(math.abs(approxParts - exactParts).toDouble / exactParts < 0.1,
      s"HLL estimate $approxParts vs exact $exactParts")
    val q50 = row.getAs[Double]("q50")
    val q99 = row.getAs[Double]("q99")
    val exactMedian = li.select(expr("percentile(l_extendedprice, 0.5)")).head.getDouble(0)
    assert(q50 > 0 && math.abs(q50 - exactMedian) / exactMedian < 0.05)
    assert(q99 >= row.getAs[Double]("q95") && row.getAs[Double]("q95") >= q50)
  }

  test("graft SQL functions resolve via GraftExtensions injection (no manual register)") {
    // shared test session was built with spark.sql.extensions=graft.GraftExtensions
    val r = spark.sql(
      "SELECT band_hashes(minhash_sig(array(1L, 2L, 3L), 16), 4) AS b").head
    assert(r.getAs[scala.collection.Seq[Long]]("b").length == 4)
    val sh = spark.sql("SELECT shingles(array('a','b','c','d'), 3) AS s").head
    assert(sh.getAs[scala.collection.Seq[String]]("s").toSeq == Seq("a b c", "b c d"))
  }

  test("PPJoin prefix filtering loses no pairs vs full inverted index") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairs(DedupOps.ngramJaccardPairs(docs, tau = 0.5))
    val pp = pairs(DedupOps.ngramJaccardPairsPrefix(docs, tau = 0.5))
    assert(pp == full && full.nonEmpty)
  }

  test("rolling min-hash: deterministic, shift-invariant on shared content") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT rolling_min_hash('the quick brown fox jumps over the lazy dog', 8) AS a, " +
      "rolling_min_hash(concat('PREFIX ', 'the quick brown fox jumps over the lazy dog'), 8) AS b")
      .head
    // identical 8-byte windows exist in both → shared candidate min windows;
    // determinism: same input → same value
    val again = spark.sql(
      "SELECT rolling_min_hash('the quick brown fox jumps over the lazy dog', 8) AS a").head
    assert(r.getLong(0) == again.getLong(0))
    val short = spark.sql("SELECT rolling_min_hash('abc', 8) AS a").head
    assert(short.getLong(0) == graft.functions.SimHash64.fnv1a64(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
  }

  test("uniform and stratified sampling hit expected rates") {
    val n = li.count().toDouble
    val uni = DataGen.sampleUniform(li, 0.1).count().toDouble
    assert(math.abs(uni / n - 0.1) < 0.03, s"uniform rate ${uni / n}")
    val fr = Map("A" -> 0.2, "N" -> 0.05, "R" -> 0.1)
    val strat = DataGen.sampleStratified(li, "l_returnflag", fr)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fr.foreach { case (k, f) =>
      val rate = strat.getOrElse(k, 0L).toDouble / base(k)
      assert(math.abs(rate - f) < 0.05, s"stratum $k rate $rate vs $f")
    }
  }

  test("salted join equals plain join") {
    val orders = Tables.orders(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val plain = cust.join(nation, col("c_nationkey") === col("n_nationkey")).count()
    val salted = JoinOps.saltedJoin(cust, "c_nationkey", nation, "n_nationkey", 8).count()
    assert(salted == plain)
  }
}
