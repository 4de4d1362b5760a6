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

  /** One sort-key option in the reducer comparator: the `-k n[,m][nr]`
    * flags of hadoop-streaming's KeyFieldBasedComparator (reference
    * hadoop-mapreduce-client-core/.../lib/partition/KeyFieldBasedComparator
    * .java:1) — `numeric` compares the field as a number instead of
    * lexicographically (the reference's `n`), `reverse` descends (`r`). */
  final case class SortKey(column: String, numeric: Boolean = false,
                           reverse: Boolean = false) {
    private[PipeOps] def toColumn: org.apache.spark.sql.Column = {
      val base = if (numeric) col(column).cast("double") else col(column)
      if (reverse) base.desc else base.asc
    }
  }

  /** The streaming REDUCER contract: hash-partition on `keyCol` into
    * `numPartitions` (KeyFieldBasedPartitioner analog), sort each partition
    * by (key, secondary…) (the comparator knob), THEN pipe — so the
    * subprocess sees every record of a key contiguously and in order, and
    * can aggregate with O(1) state exactly like an MR streaming reducer.
    * Same line framing and tolerance as [[pipeThrough]].
    *
    * `sortKeys`, when non-empty, replaces the default ascending-
    * lexicographic (key, secondary…) comparator with per-field
    * numeric/reverse options ([[SortKey]] — the `-k 2,2nr` contract).
    * Partitioning ALWAYS stays on `keyCol` (comparator and partitioner are
    * independent knobs in the reference too), so a reducer still sees each
    * key's records contiguously whenever `keyCol` leads `sortKeys`. */
  def pipeThroughSorted(spark: SparkSession, df: DataFrame, keyCol: String,
                        textCol: String, cmd: Seq[String], numPartitions: Int = 0,
                        secondarySort: Seq[String] = Nil,
                        sortKeys: Seq[SortKey] = Nil): DataFrame = {
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sortCols =
      if (sortKeys.nonEmpty) sortKeys.map(_.toColumn)
      else (keyCol +: secondarySort).map(col)
    val lines = df.repartition(n, col(keyCol))
      .sortWithinPartitions(sortCols: _*)
      .select(concat_ws("\t", col(keyCol).cast("string"), col(textCol)))
      .as[String].rdd
    lines.pipe(cmd).flatMap { line =>
      val i = line.indexOf('\t')
      if (i < 0) None
      else Some((line.substring(0, i), line.substring(i + 1)))
    }.toDF(keyCol, "out")
  }

  /** The streaming COMBINER stage (reference analog hadoop-streaming
    * PipeCombiner.java:1: an external command run over each map task's
    * sorted output BEFORE the shuffle). Stage 1 sorts each EXISTING
    * partition locally — sortWithinPartitions, ZERO shuffle — and pipes it
    * through `combinerCmd`, which therefore sees every key it receives
    * contiguously and sorted (the reducer contract, scoped to one
    * partition; a key split across partitions is partially aggregated in
    * each — exactly MR combiner semantics). Stage 2 is the full
    * [[pipeThroughSorted]] reducer over the combiner's output. Correct
    * whenever combine-then-reduce equals reduce alone (the associative+
    * commutative contract MR imposes on combiners); the payoff is shuffle
    * volume: |distinct keys per partition| rows instead of |records| —
    * the optimization knob that makes a 100 TB wordcount-via-pipes
    * feasible. Same line framing and tolerance as [[pipeThrough]]. */
  def pipeThroughCombined(spark: SparkSession, df: DataFrame, keyCol: String,
                          textCol: String, combinerCmd: Seq[String],
                          reducerCmd: Seq[String], numPartitions: Int = 0,
                          sortKeys: Seq[SortKey] = Nil): DataFrame = {
    import spark.implicits._
    val combined = df
      .sortWithinPartitions(col(keyCol)) // local sort, no exchange
      .select(concat_ws("\t", col(keyCol).cast("string"), col(textCol)))
      .as[String].rdd
      .pipe(combinerCmd)
      .flatMap { line =>
        val i = line.indexOf('\t')
        if (i < 0) None else Some((line.substring(0, i), line.substring(i + 1)))
      }.toDF(keyCol, "out")
    pipeThroughSorted(spark, combined, keyCol, "out", reducerCmd,
      numPartitions, sortKeys = sortKeys)
  }

  /** Typed-bytes pipe — the binary hadoop-streaming wire (public format,
    * reference hadoop-tools/hadoop-streaming/.../DumpTypedBytes.java and
    * TypedBytesInput/Output: 1-byte type code, big-endian payload; long=4,
    * int=3, string/bytes=7/0 with a 4-byte length). Tab/newline framing
    * corrupts binary payloads; typed-bytes frames them losslessly. Records
    * stream through one subprocess per partition (writer on its own thread
    * — the subprocess interleaves reads and writes, single-threaded
    * write-then-read deadlocks once a pipe buffer fills). The subprocess
    * must speak typed-bytes back; `cat` is the identity reducer. */
  def pipeTypedBytes(spark: SparkSession, df: DataFrame, keyCol: String,
                     textCol: String, cmd: Seq[String]): DataFrame = {
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val pb = new ProcessBuilder(cmd: _*)
          pb.redirectError(ProcessBuilder.Redirect.DISCARD)
          val p = pb.start()
          val writer = new Thread(() => {
            val out = new java.io.DataOutputStream(
              new java.io.BufferedOutputStream(p.getOutputStream))
            try {
              it.foreach { case (k, v) =>
                out.writeByte(4); out.writeLong(k)
                val b = v.getBytes("UTF-8")
                out.writeByte(7); out.writeInt(b.length); out.write(b)
              }
              out.close()
            } catch { case _: java.io.IOException => () } // early subprocess exit
          })
          writer.setDaemon(true)
          writer.start()
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(p.getInputStream))
          new Iterator[(Long, String)] {
            private var pending: (Long, String) = _
            private var eof = false
            private def advance(): Unit = {
              val tk = in.read()
              if (tk < 0) { eof = true; p.waitFor(); return }
              val k = tk match {
                case 4 => in.readLong()
                case 3 => in.readInt().toLong
                case t => throw new java.io.IOException(s"typed-bytes: key type $t, want int/long")
              }
              val tv = in.read()
              val v = tv match {
                case 7 | 0 =>
                  val len = in.readInt()
                  val b = new Array[Byte](len)
                  in.readFully(b)
                  new String(b, "UTF-8")
                case t => throw new java.io.IOException(s"typed-bytes: value type $t, want string/bytes")
              }
              pending = (k, v)
            }
            def hasNext: Boolean = {
              if (pending == null && !eof) advance()
              pending != null
            }
            def next(): (Long, String) = {
              if (!hasNext) throw new NoSuchElementException
              val r = pending; pending = null; r
            }
          }
        }
      }.toDF(keyCol, "out")
  }
}
