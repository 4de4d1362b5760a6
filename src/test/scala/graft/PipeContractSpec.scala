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
