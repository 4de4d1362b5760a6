package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Guards against silent timestamp-unit drift in the events reader.
  *
  * The round-7 regression: testdata moved from TIMESTAMP(NANOS) to
  * timestamp[us] and a hardcoded `div 1000` compressed 30 days of events into
  * 43 minutes of 1970 — while all invariant-style specs (count conservation,
  * ordering) stayed green. These specs pin ABSOLUTE time anchors so a unit
  * error of any power of 1000 fails loudly, and prove the reader handles both
  * physical encodings (micros = live testdata; nanos = committed fixture).
  */
class EventsReaderSpec extends SparkSpecBase {

  test("events ts is TimestampType with an absolute, multi-day 2024 span") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    val r = ev.agg(
      min("ts").as("lo"), max("ts").as("hi"),
      min(year(col("ts"))).as("y")).head
    val spanDays =
      (r.getTimestamp(1).getTime - r.getTimestamp(0).getTime) / 86400000.0
    assert(r.getInt(2) >= 2024, s"events start in ${r.getInt(2)} — unit drift?")
    assert(spanDays > 1.0, f"events span $spanDays%.3f days — unit compression?")
  }

  test("nanos-encoded events fixture reads to the same logical timestamps") {
    val dir = getClass.getResource("/fixtures/nanos").getPath
    // fixture: 48 hourly events from 2024-01-01T00:00 UTC, TIMESTAMP(NANOS)
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() == 48)
    val r = ev.agg(min("ts").as("lo"), max("ts").as("hi")).head
    assert(r.getTimestamp(0).toInstant.toString == "2024-01-01T00:00:00Z")
    assert(r.getTimestamp(1).toInstant.toString == "2024-01-02T23:00:00Z")
  }

  test("micros and nanos encodings of identical data agree bit-for-bit") {
    import spark.implicits._
    val dir = getClass.getResource("/fixtures/nanos").getPath
    val nanos = Tables.events(spark, dir)
    // re-encode the same logical rows as micros via Spark's native writer
    val out = s"/tmp/graft_test_events_micros_${System.nanoTime()}"
    nanos.write.mode("overwrite").parquet(s"$out/events.parquet")
    val micros = Tables.events(spark, out)
    assert(micros.schema == nanos.schema)
    assert(micros.except(nanos).isEmpty && nanos.except(micros).isEmpty)
  }
}
