package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 hardening (ADVICE r3): decompression-bomb guard on image decode,
  * null-key tolerance in the streaming secondary sort, and checkpoint-dir
  * non-clobbering in connectedComponents. */
class Round4Spec extends SparkSpecBase {

  test("decodeImages bounds the declared raster before reading (bomb guard)") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val media = Seq(
      graft.ops.MultimodalOps.MediaRecord(1L, png(4, 2), "image"),
      graft.ops.MultimodalOps.MediaRecord(2L, png(40, 40), "image")).toDS()
    // bound of 10 px: the 4x2 decodes for real, the 40x40 must be refused at
    // the HEADER (before any raster allocation) and degrade to the stub
    val got = graft.ops.MultimodalOps.decodeImages(spark, media, maxDecodePixels = 10L)
      .collect().map(d => d.media_id -> d).toMap
    assert(got(1L).real_decode && got(1L).width == 4 && got(1L).height == 2)
    assert(!got(2L).real_decode && got(2L).format == "undecoded",
      "oversized declared raster must fall back to the stub, not decode")
  }

  test("secondarySort tolerates null keys (boxed encoding, own group)") {
    val schema = StructType(Seq(
      StructField("user_id", LongType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("event_id", LongType, nullable = true)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      Row(1L, ts("2024-01-01 00:00:02"), 11L),
      Row(1L, ts("2024-01-01 00:00:01"), 10L),
      Row(null, ts("2024-01-01 00:00:03"), 12L),
      Row(null, ts("2024-01-01 00:00:04"), 13L))
    val events = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = graft.ops.SortOps.secondarySort(events).collect()
      .map(r => Option(r.get(0)) -> r.getString(1)).toMap
    assert(got(Some(1L)) == "10,11", "non-null group stays ordered by ts")
    assert(got(None) == "12,13", "null user_id forms its own ordered group")
  }

  test("connectedComponents does not clobber an already-configured checkpoint dir") {
    import spark.implicits._
    val sc = spark.sparkContext
    val prior = sc.getCheckpointDir
    val dirA = java.nio.file.Files.createTempDirectory("graft_ckpt_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_ckpt_b").toString
    try {
      sc.setCheckpointDir(dirA)
      val configured = sc.getCheckpointDir.get
      val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
      val comp = graft.ops.DedupOps.connectedComponents(pairs, checkpointDir = Some(dirB))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
      assert(sc.getCheckpointDir.contains(configured),
        s"session checkpoint dir must stay $configured, got ${sc.getCheckpointDir}")
    } finally {
      // restore presence/absence of the session-global dir (null unsets:
      // SparkContext wraps the argument in Option). When prior was SET this
      // re-roots under the same parent but with a fresh UUID subdir — only
      // the root matters, and the suite only depends on presence/absence.
      sc.setCheckpointDir(prior.orNull)
    }
  }
}
