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
