package graft

import org.apache.spark.sql.functions._
import graft.sources.IO
import graft.ops.AggOps

/** JDBC source/sink (DBInputFormat/DBOutputFormat analog — reference
  * DBCountPageView.java:45-56) against embedded Derby (ships in Spark's jar
  * set — zero extra dependencies), plus the generic BytesWritable
  * SequenceFile round-trip. In-memory Derby is per-JVM, which local[n]
  * shares; a cluster deployment points the same helpers at a server URL.
  */
class JdbcIoSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("JDBC write → read round-trips rows and schema (parquet parity)") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    IO.writeJdbc(ev, url, "events_rt")
    val back = IO.readJdbc(spark, url, "events_rt")
    assert(back.schema.fieldNames.toSeq == ev.schema.fieldNames.toSeq)
    assert(back.count() == ev.count())
    assert(back.except(ev).isEmpty && ev.except(back).isEmpty)
  }

  test("db_pageview through JDBC equals the parquet path") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    IO.writeJdbc(ev, url, "pageviews")
    val viaJdbc = AggOps.dbPageview(IO.readJdbc(spark, url, "pageviews"))
    val viaParquet = AggOps.dbPageview(ev)
    assert(viaJdbc.except(viaParquet).isEmpty && viaParquet.except(viaJdbc).isEmpty)
  }

  test("range-partitioned JDBC read: parallel slices, same rows") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    IO.writeJdbc(ev, url, "events_part")
    val hi = ev.agg(max("event_id")).head.getLong(0) + 1
    val part = IO.readJdbcPartitioned(spark, url, "events_part",
      "event_id", 0L, hi, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4, "DBInputFormat-style split count")
    assert(part.except(ev).isEmpty && ev.except(part).isEmpty)
  }

  test("BytesWritable SequenceFile round-trip is bit-identical") {
    import spark.implicits._
    val path = s"/tmp/graft_test_seqbytes_${System.nanoTime()}"
    // payloads exercising non-UTF8 bytes, empty arrays, and length variety
    val rows = Seq(
      (Array[Byte](0, 1, -1, 127, -128), Array[Byte](42)),
      (Array[Byte](), Array[Byte](0, 0, 0)),
      ("key3".getBytes("UTF-8"), Array.tabulate(300)(i => (i % 251).toByte)))
    val df = rows.toDF("key", "value")
    IO.writeSequenceFileBytes(df, "key", "value", path)
    val back = IO.readSequenceFileBytes(spark, path)
      .collect().map(r => (r.getAs[Array[Byte]]("key").toSeq, r.getAs[Array[Byte]]("value").toSeq)).toSet
    assert(back == rows.map(t => (t._1.toSeq, t._2.toSeq)).toSet)
  }
}
