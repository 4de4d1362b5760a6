package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** MapReduce Counters analog.
  *
  * Reference: hadoop-mapreduce-client-core/src/main/java/org/apache/hadoop/
  * mapreduce/Counters.java:1 — per-job named counters aggregated from every
  * task. Spark-native form: `Dataset.observe` metrics, collected on the
  * driver when the action completes — same "side-channel aggregate riding
  * the job" contract, but declarative (any aggregate expression) and exactly-
  * once per action (unlike accumulator re-execution double counting). */
object CounterOps {

  /** Attach row/byte/null counters to a scan; read them from the returned
    * Observation after the next action on the DataFrame. */
  def withCounters(df: DataFrame, textCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("rows"),
      sum(octet_length(col(textCol))).as("bytes"),
      count(when(col(textCol).isNull, 1)).as("null_rows"))
    (observed, obs)
  }
}
