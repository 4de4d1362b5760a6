package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Round-5 hardening (ADVICE r4): explicit null-event_id contract in the
  * streaming secondary sort, and a path-prefix (not substring) rooted check
  * for connectedComponents' checkpoint dir. */
class Round5Spec extends SparkSpecBase {

  test("secondarySort omits null event_id from the string but counts the row (oracle contract)") {
    val schema = StructType(Seq(
      StructField("user_id", LongType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("event_id", LongType, nullable = true)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // the null event_id sorts FIRST within the group (nulls-first long sort),
    // so a naive "skip separator on first row" would emit ",10,11"
    val rows = Seq(
      Row(1L, ts("2024-01-01 00:00:01"), null),
      Row(1L, ts("2024-01-01 00:00:02"), 10L),
      Row(1L, ts("2024-01-01 00:00:03"), 11L),
      Row(2L, ts("2024-01-01 00:00:04"), 20L))
    val events = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val got = graft.ops.SortOps.secondarySort(events).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // matches the oracle pair string_agg (skips NULLs) / count(*) (does not)
    assert(got(1L) == ("10,11", 3L), s"got ${got(1L)}")
    assert(got(2L) == ("20", 1L))
  }

  test("checkpoint rooted check is a path prefix, not a substring") {
    import graft.ops.DedupOps.isCheckpointRootedAt
    assert(isCheckpointRootedAt("/tmp/a", "/tmp/a"))
    assert(isCheckpointRootedAt("/tmp/a/3f9c-uuid", "/tmp/a"))
    assert(isCheckpointRootedAt("file:/tmp/a/3f9c-uuid", "/tmp/a"), "scheme-qualified child")
    assert(!isCheckpointRootedAt("/tmp/ab/3f9c-uuid", "/tmp/a"),
      "/tmp/ab is a substring match but NOT rooted at /tmp/a")
    assert(!isCheckpointRootedAt("/tmp/a", "/tmp/a/deeper"))
    assert(isCheckpointRootedAt("/tmp/a/", "/tmp/a"), "trailing slash normalizes away")
  }
}
