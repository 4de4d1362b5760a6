package graft

import org.apache.spark.sql.functions._
import graft.ops.PipeOps

/** The hadoop-streaming contracts beyond plain text piping: the sorted
  * reducer contract (partitioner + comparator) and typed-bytes framing. */
class PipeContractSpec extends SparkSpecBase {

  test("pipeThroughSorted: an O(1)-state awk reducer sees keys contiguous and sorted") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id").cast("string").as("payload"))
    // run-length counter: correct ONLY if all records of a key arrive
    // consecutively in one subprocess — i.e. the partitioner+sort contract
    val awk = Seq("awk", "-F", "\t",
      "{ if (NR>1 && $1!=k) print k\"\\t\"c; if ($1!=k) { k=$1; c=0 }; c++ } END { if (NR>0) print k\"\\t\"c }")
    val piped = PipeOps.pipeThroughSorted(spark, ev, "event_type", "payload", awk,
      numPartitions = 4)
      .select(col("event_type"), col("out").cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(piped == direct, s"reducer contract broken: $piped vs $direct")
  }

  test("pipeThroughSorted sortKeys: numeric+reverse comparator (-k 2,2nr) " +
    "feeds the reducer values in descending numeric order") {
    import spark.implicits._
    // values whose lexicographic and numeric orders DISAGREE ("9" > "10"
    // as strings) — a first-line-per-key reducer is correct only if the
    // comparator really sorted numerically descending
    val rows = Seq(("a", "9"), ("a", "10"), ("a", "2"), ("b", "100"),
      ("b", "99"), ("b", "3"), ("c", "7")).toDF("k", "v")
    val awk = Seq("awk", "-F", "\t", "{ if ($1 != k) { print; k = $1 } }")
    val piped = PipeOps.pipeThroughSorted(spark, rows, "k", "v", awk,
      numPartitions = 3,
      sortKeys = Seq(PipeOps.SortKey("k"),
        PipeOps.SortKey("v", numeric = true, reverse = true)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(piped == Map("a" -> "10", "b" -> "100", "c" -> "7"),
      s"numeric-reverse comparator broken: $piped")
    // lexicographic default for contrast: first line per key is the
    // string-max under reverse WITHOUT numeric
    val lex = PipeOps.pipeThroughSorted(spark, rows, "k", "v", awk,
      numPartitions = 3,
      sortKeys = Seq(PipeOps.SortKey("k"), PipeOps.SortKey("v", reverse = true)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(lex == Map("a" -> "9", "b" -> "99", "c" -> "7"),
      s"lexicographic-reverse comparator broken: $lex")
  }

  test("readXmlRecords: begin/end-tag framing — wordcount over XML equals " +
    "direct, multi-line records reassemble, non-record bytes are skipped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xmlrec").toFile
    val bodies = (1 to 50).map(i => s"alpha beta gamma_$i\ndelta epsilon")
    val xml = new StringBuilder("<?xml version=\"1.0\"?>\n<root>\n")
    bodies.foreach { b => xml.append(s"  <doc>\n    $b\n  </doc>\n") }
    xml.append("</root>\n")
    val f = new java.io.File(dir, "corpus.xml")
    java.nio.file.Files.write(f.toPath, xml.toString.getBytes("UTF-8"))
    val recs = graft.sources.IO.readXmlRecords(spark, f.getAbsolutePath,
      "<doc>", "</doc>")
    val collected = recs.as[String].collect()
    assert(collected.length == 50, s"want 50 records, got ${collected.length}")
    assert(collected.forall(r => r.startsWith("<doc>") && r.endsWith("</doc>")))
    // wordcount over the framed records == wordcount over the raw bodies
    val viaXml = recs
      .select(explode(split(trim(regexp_replace(col("record"),
        "</?doc>", " ")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = bodies.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    assert(viaXml == direct, "XML-framed wordcount diverged from direct")
  }

  test("pipeTypedBytes: binary-safe framing round-trips through the identity reducer") {
    import spark.implicits._
    // payloads that tab/newline framing would corrupt
    val rows = Seq((1L, "has\ttab"), (2L, "has\nnewline"), (3L, "plain"), (4L, ""))
      .toDF("k", "v").repartition(2)
    val back = PipeOps.pipeTypedBytes(spark, rows, "k", "v", Seq("cat"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "has\ttab"), (2L, "has\nnewline"), (3L, "plain"), (4L, "")),
      s"typed-bytes round-trip mangled payloads: $back")
  }

  test("pipeTypedBytes: scales record count through the subprocess") {
    val ev = Tables.events(spark, sfDir).select(col("event_id"), col("event_type"))
    val n = ev.count()
    val back = PipeOps.pipeTypedBytes(spark, ev, "event_id", "event_type", Seq("cat"))
    assert(back.count() == n)
    assert(back.agg(countDistinct("event_id")).head.getLong(0) == n)
  }
}
