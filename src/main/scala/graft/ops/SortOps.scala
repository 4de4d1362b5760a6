package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global / secondary sort — the TeraSort suite, Spark-native.
  *
  * Reference analogs:
  *  - Sort.java:1 + TeraSort.java:1 (hadoop-mapreduce-examples/.../terasort):
  *    TeraSort's contribution is the *sampled total-order partitioner*
  *    (TeraInputFormat.writePartitionFile samples keys → range-partitions so
  *    concatenated reducer outputs are globally sorted). Spark's `orderBy` IS
  *    that design: RangePartitioning with reservoir sampling of bounds, then
  *    per-partition sort — so the Spark-native TeraSort is just `orderBy`.
  *  - TeraValidate.java:1 / TeraChecksum.java:1: per-partition monotonicity +
  *    boundary checks + order-invariant checksum — re-done below with
  *    mapPartitions summaries (tiny: one row per partition).
  *  - SecondarySort.java:1: partition by first key, sort by second within the
  *    group — a window/ordered-aggregation, no custom partitioner needed.
  */
object SortOps {

  /** Deterministic global sort order used by sort + validate. */
  private val sortCols = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))

  /** Range-partitioned global sort (the TeraSort). Output partitions are
    * range-disjoint and internally sorted; concatenation is the total order. */
  def teraSort(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .orderBy(sortCols: _*)

  /** Oracle-checkable face of the global sort: global top-N with explicit
    * positions (TakeOrdered — scales as O(N) driver memory, not a full sort). */
  def globalSortTopN(lineitem: DataFrame, n: Int = 1000): DataFrame = {
    val top = lineitem
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(n)
    // n rows only → the single-partition window is fine at any SF.
    top.withColumn("pos", row_number().over(
        Window.orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")))
        .cast("long"))
      .select(col("pos"), col("l_orderkey"), col("l_linenumber"),
              round(col("l_extendedprice"), 2).as("price"))
  }

  /** TeraValidate + TeraChecksum: sorts, then proves sortedness of OUR output
    * (within-partition inversions via mapPartitions + cross-partition boundary
    * inversions via a lag over the per-partition summaries — one row per
    * partition, so the final window is negligible at any scale) and emits an
    * order-invariant checksum the oracle recomputes independently. */
  def sortValidate(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    import spark.implicits._
    val sorted = teraSort(lineitem).as[(Double, Long, Int)]
    val summaries = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      if (!it.hasNext) Iterator.empty
      else {
        var prev = it.next(); val first = prev
        var cnt = 1L; var inv = 0L
        var sum = (math.round(prev._1 * 100): Long) + prev._2 % 1000003L + prev._3
        while (it.hasNext) {
          val cur = it.next()
          val lt = cur._1 < prev._1 || (cur._1 == prev._1 &&
            (cur._2 < prev._2 || (cur._2 == prev._2 && cur._3 < prev._3)))
          if (lt) inv += 1
          sum += math.round(cur._1 * 100) + cur._2 % 1000003L + cur._3
          cnt += 1; prev = cur
        }
        Iterator((pid, cnt, inv, sum, first, prev))
      }
    }.toDF("pid", "cnt", "inv", "checksum_part", "first_key", "last_key")
    // boundary check compares the FULL (price, orderkey, linenumber) key —
    // struct ordering is lexicographic, same as the within-partition check;
    // comparing only the price would miss tie-break inversions at partition
    // edges (equal prices, descending secondary keys)
    val boundary = summaries.withColumn("prev_last",
        lag(col("last_key"), 1).over(Window.orderBy(col("pid"))))
      .withColumn("boundary_inv",
        when(col("prev_last").isNotNull && col("prev_last") > col("first_key"), 1L).otherwise(0L))
    boundary.agg(
      sum(col("cnt")).as("row_cnt"),
      (sum(col("inv")) + sum(col("boundary_inv"))).as("inversions"),
      sum(col("checksum_part")).as("checksum"))
  }

  /** SecondarySort: cluster by user, order by (ts, event_id) within the
    * cluster, emit the ordered sequence — the exact MR shape: partition by
    * the primary key, SORT the shuffle by (primary, secondary), then STREAM
    * each group through the reducer (SecondarySort.java:1). No collect_list:
    * Spark's external sort spills, so a hot key with millions of events
    * never materializes as one in-memory array in an aggregation buffer —
    * per-group memory is the output string alone (the theoretical floor for
    * this output shape; for unbounded groups emit ordered rows instead). */
  def secondarySort(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    events
      // micros preserve the full timestamp order (cast("long") would floor
      // to seconds and could flip sub-second (ts, event_id) tie-breaks)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .repartition(n, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      // boxed encoders: a null user_id/ts/event_id (a valid group under the
      // old groupBy form) must survive encoding as its own group / sort
      // first, not throw a runtime NPE from a primitive encoder (ADVICE r3)
      .as[(java.lang.Long, java.lang.Long, java.lang.Long)]
      .mapPartitions { it =>
        // groups are contiguous after the sort; one pass, one group at a time
        new Iterator[(java.lang.Long, String, Long)] {
          private var pending: Option[(java.lang.Long, java.lang.Long, java.lang.Long)] =
            if (it.hasNext) Some(it.next()) else None
          def hasNext: Boolean = pending.isDefined
          def next(): (java.lang.Long, String, Long) = {
            val user = pending.get._1
            val sb = new java.lang.StringBuilder
            var cnt = 0L
            var cur = pending
            while (cur.isDefined && cur.get._1 == user) {
              // null event_id contract (ADVICE r4): omitted from the ordered
              // string but counted in n_events — exactly what the oracle's
              // string_agg(event_id,…)/count(*) pair computes (string_agg
              // skips NULLs, count(*) does not)
              if (cur.get._3 != null) {
                if (sb.length > 0) sb.append(',')
                sb.append(cur.get._3)
              }
              cnt += 1
              cur = if (it.hasNext) Some(it.next()) else None
            }
            pending = cur
            (user, sb.toString, cnt)
          }
        }
      }
      .toDF("user_id", "ordered_events", "n_events")
  }
}
