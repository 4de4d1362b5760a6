package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic bucket ids for two-phase (TeraSort-shaped) global ranks and
  * cumsums.
  *
  * The anti-pattern these replace: stamping `spark_partition_id()` after a
  * range exchange and expecting every branch of the plan to observe the SAME
  * partition assignment. That holds only while the sample-derived range
  * boundaries are planned once and reused — re-executions of the exchange may
  * sample different boundaries, silently misaligning the totals branch and
  * the window branch (the r8 `quota_sample` driver-gate hash-red). Both
  * helpers here return a bucket id that is a PURE FUNCTION of the row, so
  * every branch agrees by construction, the plan needs no range exchange at
  * all (the window's own hash exchange suffices), and re-execution, AQE
  * re-planning, and executor retry are all safe.
  *
  * Reference analog: TotalOrderPartitioner's partition file
  * (terasort/TeraSort.java:1) — boundaries are computed once and SHARED by
  * every consumer, never re-sampled.
  */
object Buckets {

  /** Bucket id for a uniform 32-hex-char key (md5 output):
    * floor(prefix32bits · buckets / 2^32). Monotone in the key's
    * lexicographic order (prefix map), uniform because md5 is uniform, and
    * exact integer arithmetic throughout (v < 2^32, v·buckets < 2^63) — no
    * sampling job, balanced by construction. */
  def hexBucket(key: Column, buckets: Int): Column =
    shiftright(conv(substring(key, 1, 8), 16, 10).cast("long") * buckets, 32)

  /** Bucket id for a non-negative numeric key with NO driver job at all:
    * floor(log10(key+1) · perDecade), clamped to [0, maxBucket]. Monotone
    * in the key (log10 and floor are monotone), pure, and free — the
    * choice when an extra bounds-collection scan would dominate (small
    * inputs, latency-sensitive plans). Balance is data-dependent (a value
    * distribution spanning d decades spreads over ~d·perDecade buckets);
    * for adversarial skew use [[quantileBucket]] instead — ANY monotone
    * bucketing yields correct two-phase results, only balance varies. */
  def logBucket(key: Column, perDecade: Int = 10, maxBucket: Int = 255): Column =
    least(greatest(floor(log10(greatest(key.cast("double"), lit(0.0)) + 1.0) *
      perDecade), lit(0.0)), lit(maxBucket.toDouble)).cast("long")

  /** Bucket id for an arbitrary STRING key — [[quantileBucket]]'s string
    * twin: a deterministic hash-gated sample of keys (bounded collect,
    * ≤ 64 k strings) is sorted driver-side and every (len/buckets)-th value
    * becomes a literal bound baked into the plan; bucket = #bounds ≤ key,
    * monotone in the key's binary order by construction. As with
    * quantileBucket, ANY bound set yields correct two-phase results
    * (monotone + shared literals is the whole contract) — sample quality
    * affects balance, never output. */
  def stringQuantileBucket(df: DataFrame, key: Column, buckets: Int): Column = {
    val sample = df.select(key.as("k"))
      .filter(conv(substring(md5(col("k")), 1, 4), 16, 10) % 16 === 0)
      .limit(65536).collect().map(_.getString(0)).sorted
    val bounds =
      if (buckets <= 1 || sample.isEmpty) Array.empty[String]
      else (1 until buckets)
        .map(i => sample(math.min(sample.length - 1, i * sample.length / buckets)))
        .distinct.toArray
    if (bounds.isEmpty) lit(0)
    else size(filter(typedLit(bounds.toSeq), b => key >= b))
  }

  /** Bucket id for an arbitrary numeric key: bounds are computed ONCE here
    * (driver-side approxQuantile, `buckets-1` doubles) and baked into the
    * plan as a literal. bucket = #bounds ≤ key, monotone in the key by
    * construction; ANY bound set yields correct results (monotonicity is
    * the only requirement), so approxQuantile's accuracy affects balance,
    * never output. */
  def quantileBucket(df: DataFrame, keyCol: String, buckets: Int): Column = {
    val bounds = if (buckets <= 1) Array.empty[Double]
      else df.select(col(keyCol).cast("double").as("k"))
        .stat.approxQuantile("k",
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
    if (bounds.isEmpty) lit(0)
    else size(filter(typedLit(bounds.toSeq), b => col(keyCol).cast("double") >= b))
  }
}
