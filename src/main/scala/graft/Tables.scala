package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed readers for the driver-generated star schema (see TESTDATA.md).
  *
  * Reference analog: hadoop-2.7.1 jobs read HDFS paths via
  * `TextInputFormat`/`SequenceFileInputFormat`
  * (hadoop-mapreduce-project/hadoop-mapreduce-client/hadoop-mapreduce-client-core/
  * src/main/java/org/apache/hadoop/mapreduce/lib/input/TextInputFormat.java:1).
  * Here every table is a columnar parquet scan: Catalyst prunes columns and
  * pushes predicates into the scan, so a query touching 2 of 16 columns reads
  * only those column chunks — the 100 TB-scale replacement for record-oriented
  * InputFormats.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects by default. Reading with an explicit LongType schema gets
    * the raw nanos (same trick as spark.sql.legacy.parquet.nanosAsLong but
    * session-config-free), then converts to a microsecond TimestampType. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.read.schema(schema).parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
