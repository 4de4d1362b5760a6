package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** hadoop-streaming analog: run every record through an external process (or
  * an arbitrary per-partition Scala transform).
  *
  * Reference analog: hadoop-tools/hadoop-streaming/src/main/java/org/apache/
  * hadoop/streaming/PipeMapper.java:1 — records serialized to the subprocess'
  * stdin as lines, stdout lines re-parsed as records. Spark-native form:
  * `RDD.pipe` per partition (one subprocess per task, streamed, no
  * materialization), wrapped back into a DataFrame. For in-JVM per-record
  * logic, `mapPartitionsTyped` is the zero-fork equivalent.
  *
  * Scale: one subprocess per partition (≈ per core), records streamed —
  * identical process model to hadoop-streaming's map tasks.
  */
object PipeOps {

  /** Pipe `keyCol\ttextCol` lines through an external command, yielding
    * (key, out) rows. Tab-separated framing like hadoop-streaming's default
    * TextInputWriter. Lines without a tab or with a non-numeric key (filters
    * and diagnostics commonly emit these) are skipped, mirroring
    * hadoop-streaming's tolerance of key-only records, instead of failing
    * the task. */
  def pipeThrough(spark: SparkSession, df: DataFrame, keyCol: String, textCol: String,
                  cmd: Seq[String]): DataFrame = {
    import spark.implicits._
    val lines = df.select(concat_ws("\t", col(keyCol).cast("string"), col(textCol)))
      .as[String].rdd
    lines.pipe(cmd).flatMap { line =>
      val i = line.indexOf('\t')
      if (i < 0) None
      else line.substring(0, i).toLongOption.map(k => (k, line.substring(i + 1)))
    }.toDF(keyCol, "out")
  }

  /** In-JVM streaming transform per partition (hadoop-streaming without the
    * fork): arbitrary iterator→iterator logic, lazily evaluated. */
  def mapPartitionsTyped[T, U: Encoder](ds: Dataset[T])(f: Iterator[T] => Iterator[U]): Dataset[U] =
    ds.mapPartitions(f)
}
