package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed data generation.
  *
  * Reference analogs: RandomWriter.java:1 / RandomTextWriter.java:1 /
  * terasort/TeraGen.java:1 (hadoop-mapreduce-examples): each map task owns an
  * id range and generates rows from a seeded PRNG. Spark-native form:
  * `spark.range(n)` gives the distributed id space (one partition per task,
  * no input, no shuffle); a pure-arithmetic LCG keyed on the row id makes the
  * output deterministic and engine-independent — the same numbers the oracle
  * recomputes in SQL. Scales linearly: generation is embarrassingly parallel.
  */
object DataGen {

  private val M = 2147483648L // 2^31
  /** glibc-style LCG step, kept in-range so ANSI-mode Spark never overflows. */
  private def lcg(c: org.apache.spark.sql.Column) = pmod(c * 1103515245L + 12345L, lit(M))

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
    "pi", "rho", "sigma", "tau", "upsilon")

  /** RandomWriter/TeraGen analog: n deterministic rows of (id, r1, r2, word,
    * value). Partitioned generation: `numPartitions` parallel id ranges. */
  def generate(spark: SparkSession, n: Long = 10000L, numPartitions: Int = 32): DataFrame = {
    val wordArr = array(words.map(lit): _*)
    spark.range(0, n, 1, numPartitions)
      // seed from id mod 2^31 so the LCG multiply stays overflow-free
      // (< 2^61) at ANY row count — raw ids past ~8.4e9 would overflow the
      // long multiply under ANSI mode (the TeraGen-scale case)
      .withColumn("r1", lcg(pmod(col("id"), lit(M))))
      .withColumn("r2", lcg(col("r1")))
      .withColumn("word", element_at(wordArr, (pmod(col("r1"), lit(words.size)) + 1).cast("int")))
      .withColumn("value", round(col("r2") / lit(M.toDouble), 9))
  }

  /** Sampling — the InputSampler/RandomSampler surface (reference:
    * hadoop-mapreduce-client-core/.../lib/partition/InputSampler.java:1,
    * which feeds TeraSort's partitioner). uniform: Bernoulli row sample;
    * stratified: per-key fractions via sampleBy (seeded, map-side). */
  def sampleUniform(df: org.apache.spark.sql.DataFrame, fraction: Double,
                    seed: Long = 42L): org.apache.spark.sql.DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  def sampleStratified(df: org.apache.spark.sql.DataFrame, strataCol: String,
                       fractions: Map[String, Double], seed: Long = 42L): org.apache.spark.sql.DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** QuasiMonteCarlo(Pi) analog (QuasiMonteCarlo.java:1): deterministic
    * pseudo-random points in the unit square → in-circle ratio. Same LCG as
    * the oracle, so even the "Monte Carlo" is hash-checkable. */
  def piEstimate(spark: SparkSession, n: Long = 100000L): DataFrame = {
    val pts = spark.range(0, n, 1, 32)
      .withColumn("xi", lcg(col("id")))
      .withColumn("yi", lcg(col("xi")))
      .withColumn("x", col("xi") / lit(M.toDouble))
      .withColumn("y", col("yi") / lit(M.toDouble))
    pts.agg(count(lit(1)).as("n"),
        sum(when(col("x") * col("x") + col("y") * col("y") <= 1.0, 1L).otherwise(0L)).as("in_circle"))
      .withColumn("pi_est", round(col("in_circle") * lit(4.0) / col("n"), 6))
  }
}
