package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Planted-span checks for the substring-level dedup (suffix-window) op —
  * the oracle gate (dedup_substring / substring_dup_stats) checks corpus
  * agreement with DuckDB; these pin exact boundary semantics on
  * hand-planted docs where the right answer is computable by eye. */
class SubstringDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val L = 40
  // a 60-char duplicated block: every 40-window inside it occurs twice, so
  // the merged span must be exactly the 60 chars in both docs
  private val block = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWX"
  require(block.length == 60)

  test("planted shared block yields one span with exact boundaries in each doc") {
    val prefixA = "A" * 10
    val prefixB = "B" * 25
    val docs = Seq(
      (1L, prefixA + block + "!!!unique-tail-one........................"),
      (2L, prefixB + block + "???unique-tail-two........................"),
      (3L, "no duplicated content at all in this row; it is all one-off text.")
    ).toDF("doc_id", "text")
    val spans = DedupOps.substringDupSpans(docs, winLen = L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set(
      (1L, 11L, 70L),   // block starts after 10 prefix chars, 1-indexed
      (2L, 26L, 85L)))
  }

  test("intra-doc repetition is a duplicate too; stats roll spans up per doc") {
    val filler = "-fill-" * 12 // 72 chars, no 40-window repeats vs block
    val doc = block + filler + block
    val docs = Seq((7L, doc)).toDF("doc_id", "text")
    val spans = DedupOps.substringDupSpans(docs, winLen = L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the filler is 6-char periodic, so windows inside one filler run repeat
    // intra-doc as well — every span must at least cover both block copies
    val covered = (s: Long, e: Long) => spans.exists(x => x._2 <= s && x._3 >= e)
    assert(covered(1L, 60L) && covered(133L, 192L))
    val stats = DedupOps.substringDupStats(docs, winLen = L).collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getAs[Long]("n_chars") == doc.length.toLong)
    assert(r.getAs[Long]("dup_chars") ==
      spans.map(x => x._3 - x._2 + 1).sum)
  }

  test("multibyte docs dedup against ASCII docs (cross-path hash space agrees)") {
    // doc 1 is pure ASCII (fast byte-rolling path); doc 2 contains a
    // multibyte char in its tail (substr+poly_hash64 fallback path). The
    // shared block must still surface — poly_hash64 of a 40-char ASCII
    // window equals its rolling byte-window hash by construction.
    val docs = Seq(
      (1L, "A" * 10 + block + "!!!unique-ascii-tail......................"),
      (2L, "B" * 25 + block + "tail-with-multibyte-é.....................")
    ).toDF("doc_id", "text")
    val spans = DedupOps.substringDupSpans(docs, winLen = L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((1L, 11L, 70L), (2L, 26L, 85L)))
    // and a duplicated window CONTAINING a multibyte char (both docs on
    // the fallback path) is found with char-accurate boundaries
    val mbBlock = "début-" + block.take(34) // 40 chars, multibyte inside
    assert(mbBlock.length == L)
    val docs2 = Seq(
      (3L, "x" * 7 + mbBlock + "1one unique ASCII tail here............."),
      (4L, "y" * 13 + mbBlock + "2two other unique tail there............")
    ).toDF("doc_id", "text")
    val spans2 = DedupOps.substringDupSpans(docs2, winLen = L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans2 == Set((3L, 8L, 47L), (4L, 14L, 53L)))
  }

  test("rolling char-window hashes equal poly_hash64 of each substr window " +
    "(1–4-byte code points, astral plane included)") {
    // the multibyte fast path's whole contract: one pass over the bytes
    // must reproduce exactly what per-window substr + poly_hash64 produced
    // before — for every window, on text mixing 1-, 2-, 3- and 4-byte
    // UTF-8 code points (é = 2, 語 = 3, 😀 = 4: a surrogate PAIR in Java
    // but ONE char to Spark's length/substr, the semantics the windows
    // must follow)
    val rnd = new scala.util.Random(42)
    val alphabet = "ab é語😀 cДﬁ𝕏."
    val cps = alphabet.codePoints().toArray
    val texts = (1 to 30).map { i =>
      val n = 5 + rnd.nextInt(60)
      val sb = new java.lang.StringBuilder
      (1 to n).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      (i.toLong, sb.toString)
    }
    val k = 7
    val df = texts.toDF("doc_id", "text")
    graft.functions.GraftFunctions.register(spark)
    val rolled = df
      .select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions
          .rollingCharWindowHashes(col("text"), k)).as(Seq("pos0", "h")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaSubstr = df
      .filter(length(col("text")) >= k)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - lit(k - 1))).as("pos"))
      .withColumn("h", graft.functions.GraftFunctions
        .polyHash64(col("text").substr(col("pos"), lit(k))))
      .collect().map(r => (r.getLong(0), r.getInt(2) - 1, r.getLong(3))).toSet
    val shortFallback = df.filter(length(col("text")) < k)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => (id, 0, 0L)) // placeholder — checked separately below
    assert(rolled.filter(r => !shortFallback.exists(_._1 == r._1)) == viaSubstr,
      "rolling char-window hashes diverge from substr+poly_hash64")
    // short texts fall back to the whole-string fingerprint, same as the
    // byte-window variant
    shortFallback.foreach { case (id, _, _) =>
      val hs = rolled.filter(_._1 == id)
      assert(hs.size == 1 && hs.head._2 == 0)
    }
  }

  test("docs shorter than the window and unique docs emit no spans") {
    val docs = Seq(
      (1L, "short"),
      (2L, "a perfectly unique sentence that is long enough for windows but repeats nothing"),
      (3L, "another entirely distinct line with no forty-character overlap anywhere at all")
    ).toDF("doc_id", "text")
    assert(DedupOps.substringDupSpans(docs, winLen = L).isEmpty)
    assert(DedupOps.substringDupStats(docs, winLen = L).isEmpty)
  }
}
