package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.{MultimodalOps, PipeOps}
import graft.sources.IO

class PipeIoMultimodalSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sfDir)

  test("pipeThrough an external process preserves keys and transforms text") {
    val out = PipeOps.pipeThrough(spark, docs, "doc_id", "text", Seq("tr", "a-z", "A-Z"))
    val joined = out.join(docs, "doc_id")
      .select(col("out") === upper(col("text"))).collect()
    assert(joined.nonEmpty && joined.forall(_.getBoolean(0)))
  }

  test("mapPartitionsTyped streams per-partition") {
    import spark.implicits._
    val ds = spark.range(0, 100, 1, 4).as[Long]
    val out = PipeOps.mapPartitionsTyped(ds)(it => it.map(_ * 2)).collect().sorted
    assert(out.toSeq == (0L until 100L).map(_ * 2))
  }

  test("parquet relayout (distcp analog) preserves data and partitions the layout") {
    val tmp = Files.createTempDirectory("graft_io").toString
    val src = s"$tmp/src"; val dst = s"$tmp/dst"
    IO.writeParquet(Tables.lineitem(spark, sfDir), src)
    IO.relayout(spark, src, dst, partitionCol = Some("l_returnflag"), filesPerPartition = 2)
    val back = spark.read.parquet(dst)
    assert(back.count() == Tables.lineitem(spark, sfDir).count())
    val dirs = new java.io.File(dst).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("l_returnflag=")) == 3)
    // partition pruning: reading one partition dir touches only that subset
    val pruned = back.filter(col("l_returnflag") === "R")
    assert(pruned.count() ==
      Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R").count())
  }

  test("compaction (HAR analog) bounds file count, preserves rows") {
    val tmp = Files.createTempDirectory("graft_compact").toString
    val src = s"$tmp/many"; val dst = s"$tmp/compact"
    Tables.orders(spark, sfDir).repartition(37).write.parquet(src)
    val nSrcFiles = new java.io.File(src).listFiles().count(_.getName.endsWith(".parquet"))
    IO.compact(spark, src, dst)
    val nDstFiles = new java.io.File(dst).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nSrcFiles == 37 && nDstFiles < nSrcFiles)
    assert(spark.read.parquet(dst).count() == Tables.orders(spark, sfDir).count())
  }

  test("csv/json/orc/text round-trips preserve data") {
    val tmp = Files.createTempDirectory("graft_fmt").toString
    val src = Tables.nation(spark, sfDir)
    src.write.option("header", "true").csv(s"$tmp/csv")
    assert(IO.readCsv(spark, s"$tmp/csv").count() == 25)
    src.write.json(s"$tmp/json")
    val j = IO.readJson(spark, s"$tmp/json")
    assert(j.count() == 25 && j.columns.sorted.toSeq == src.columns.sorted.toSeq)
    src.write.orc(s"$tmp/orc")
    assert(IO.readOrc(spark, s"$tmp/orc").count() == 25)
    Tables.documents(spark, sfDir).select(col("text")).write.text(s"$tmp/text")
    assert(IO.readText(spark, s"$tmp/text").count() == Tables.documents(spark, sfDir).count())
  }

  test("sequence file round-trip (MR-era interop format)") {
    val tmp = Files.createTempDirectory("graft_seq").toString
    IO.writeSequenceFile(docs, "doc_id", "text", s"$tmp/seq")
    val back = IO.readSequenceFile(spark, s"$tmp/seq")
    assert(back.count() == docs.count())
    val joined = back.join(docs, col("key") === col("doc_id"))
      .filter(col("value") =!= col("text")).count()
    assert(joined == 0, "values must round-trip byte-identical")
  }

  test("observe counters (MR Counters analog) report exact job-side metrics") {
    val (observed, obs) = graft.ops.CounterOps.withCounters(docs, "text")
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows") == docs.count())
    assert(m("null_rows") == 0L)
    assert(m("bytes").asInstanceOf[Long] > 0L)
  }

  test("bucketed tables join without a shuffle exchange") {
    // in-memory metastore is fresh per JVM but the warehouse dir persists
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    IO.writeBucketed(Tables.orders(spark, sfDir), "orders_b", "o_custkey", 4)
    IO.writeBucketed(Tables.customer(spark, sfDir), "customer_b", "c_custkey", 4)
    val joined = spark.table("customer_b").hint("merge")
      .join(spark.table("orders_b"), col("c_custkey") === col("o_custkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() ==
      Tables.customer(spark, sfDir).join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey")).count())
  }

  test("multimodal stub pipeline: decode → resize → frame-sample plumbing") {
    val media = MultimodalOps.asMediaRecords(spark, docs)
    val decoded = MultimodalOps.decodeStub(spark, media)
    val d1 = decoded.collect().sortBy(_.media_id)
    val d2 = MultimodalOps.decodeStub(spark, media).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq, "stub decode must be deterministic")
    assert(d1.forall(d => d.width >= 16 && d.height >= 16 && d.byte_len > 0))
    val resized = MultimodalOps.resizeStub(spark, decoded, maxDim = 64).collect()
    assert(resized.forall(d => d.width <= 64 && d.height <= 64 && d.width >= 1))
    val frames = MultimodalOps.frameSampleStub(spark, decoded, k = 4)
    val fRows = frames.collect()
    assert(fRows.forall(_.getAs[Int]("frame_idx") % 4 == 0))
    val videoIds = d1.filter(_.kind == "video").map(_.media_id).toSet
    assert(fRows.map(_.getAs[Long]("media_id")).toSet == videoIds)
  }
}
