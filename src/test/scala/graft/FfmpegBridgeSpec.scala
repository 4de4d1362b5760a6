package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermissions

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRecord

/** Proves BOTH paths of the external-decoder bridge without requiring a real
  * ffmpeg in the container:
  *  - bridge path: a fixture script honoring the contract (read stdin, emit
  *    raw gray frameDim² rasters on stdout) is injected as `bin`;
  *  - fallback path: a nonexistent binary degrades to decodeVideoFrames
  *    (real MJPEG decode / loud stub), never throws.
  */
class FfmpegBridgeSpec extends SparkSpecBase {

  private def fixtureScript(frames: Int, dim: Int, value: Int): String = {
    val p = Files.createTempFile("graft_fake_ffmpeg", ".sh")
    // -version probe → exit 0; decode call → drain stdin, write N frames of
    // constant `value` bytes (dim*dim each) — deterministic mean_luma
    Files.writeString(p,
      s"""#!/bin/bash
         |for a in "$$@"; do [ "$$a" = "-version" ] && { echo fake 1.0; exit 0; }; done
         |cat > /dev/null
         |head -c ${frames * dim * dim} /dev/zero | tr '\\0' "\\\\$$(printf '%03o' $value)"
         |""".stripMargin)
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
    p.toString
  }

  test("bridge path: frames stream back from the external binary with exact luma") {
    import spark.implicits._
    val dim = 8
    val bin = fixtureScript(frames = 3, dim = dim, value = 100)
    val media = Seq(
      MediaRecord(1L, Array.tabulate[Byte](256)(_.toByte), "video"),
      MediaRecord(2L, Array.tabulate[Byte](64)(i => (i * 3).toByte), "video")).toDS()
    val frames = MultimodalOps.decodeVideoFramesFfmpeg(spark, media,
      bin = bin, everyK = 2, maxFramesPerVideo = 4, frameDim = dim).collect()
    assert(frames.length == 6, s"2 videos x 3 frames, got ${frames.toList}")
    assert(frames.forall(_.real_decode), "bridge rows must be real decodes")
    assert(frames.forall(f => f.width == dim && f.height == dim && f.frame_bytes == dim * dim))
    assert(frames.forall(f => math.abs(f.mean_luma - 100.0) < 1e-9),
      s"constant-100 raster must average 100.0: ${frames.map(_.mean_luma).toList}")
    // frame_idx reconstructs the pre-sampling position: everyK spacing
    assert(frames.filter(_.media_id == 1L).map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4))
  }

  test("fallback path: missing binary degrades to the JDK decoder, loudly stubbing") {
    import spark.implicits._
    val media = Seq(MediaRecord(1L, "definitely not video".getBytes("UTF-8"), "video")).toDS()
    val rows = MultimodalOps.decodeVideoFramesFfmpeg(spark, media,
      bin = s"/nonexistent/ffmpeg_${System.nanoTime()}").collect()
    assert(rows.length == 1 && !rows.head.real_decode,
      "absent binary must degrade to the stub row, not throw")
  }

  test("bridge path: a payload the binary rejects degrades to a stub row, not a crash") {
    import spark.implicits._
    val dim = 8
    // script that emits ZERO frames for the decode call (simulates a codec
    // the binary can't handle) while still answering the -version probe
    val bin = fixtureScript(frames = 0, dim = dim, value = 0)
    val media = Seq(MediaRecord(9L, Array[Byte](1, 2, 3), "video")).toDS()
    val rows = MultimodalOps.decodeVideoFramesFfmpeg(spark, media,
      bin = bin, frameDim = dim).collect()
    assert(rows.length == 1 && !rows.head.real_decode && rows.head.media_id == 9L)
  }
}
