package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources & sinks — the HDFS-surface analog.
  *
  * Reference analogs: HDFS client + FileInputFormat/FileOutputFormat
  * (hadoop-hdfs-project, hadoop-mapreduce-client-core), hadoop-distcp
  * (distributed copy/re-layout), hadoop-archives (HAR small-file compaction).
  * Spark reads/writes the storage layer natively; these helpers pin down the
  * layout decisions that matter at 100 TB: partitioned directories for
  * pruning, bounded file counts, and target file sizes.
  */
object IO {

  def readParquet(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
  def readCsv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)
  def readJson(spark: SparkSession, path: String): DataFrame = spark.read.json(path)
  def readOrc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)
  def readText(spark: SparkSession, path: String): DataFrame = spark.read.text(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** distcp analog: copy a dataset into a new layout — optionally partitioned
    * by a column (→ directory pruning) with a bounded file count per
    * partition. A distributed copy is "read → (re)partition → write": every
    * task copies a slice, no driver bottleneck. */
  def relayout(spark: SparkSession, inPath: String, outPath: String,
               partitionCol: Option[String] = None, filesPerPartition: Int = 8): Unit = {
    val df = spark.read.parquet(inPath)
    val re = partitionCol match {
      case Some(c) => df.repartition(filesPerPartition, col(c))
      case None    => df.repartition(filesPerPartition)
    }
    writeParquet(re, outPath, partitionCol.toSeq)
  }

  /** SequenceFile interop — the MR-era key/value container every reference
    * job reads/writes (hadoop-mapreduce-client-core/.../lib/input/
    * SequenceFileInputFormat.java:1). Stored as (LongWritable key,
    * Text value); lets graft exchange data in place with legacy MR jobs. */
  def writeSequenceFile(df: DataFrame, keyCol: String, valueCol: String, path: String): Unit = {
    import org.apache.hadoop.io.{LongWritable, Text}
    df.select(col(keyCol).cast("long"), col(valueCol).cast("string"))
      .rdd.map(r => (new LongWritable(r.getLong(0)), new Text(r.getString(1))))
      .saveAsSequenceFile(path)
  }

  def readSequenceFile(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import spark.implicits._
    spark.sparkContext.sequenceFile[LongWritable, Text](path)
      .map { case (k, v) => (k.get(), v.toString) }
      .toDF("key", "value")
  }

  /** Bucketed table write: pre-shuffles rows into nBuckets hash buckets per
    * bucket column (with per-bucket sort), so later equi-joins/aggregations
    * on that column read co-located data and plan WITHOUT a shuffle
    * exchange — the 100 TB answer to "this join shuffles every time".
    * (Catalog parquet table; the layout is plain parquet + bucket metadata.) */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    nBuckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(tableName)

  /** HAR analog: compact a many-small-files dataset to ~targetFileBytes
    * files. File count derived from the actual input size (cheap metadata
    * scan), so it adapts at any SF. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val df = spark.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1, (bytes / BigInt(targetFileBytes)).toInt)
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(outPath)
  }
}
