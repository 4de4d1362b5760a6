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

  /** OPPORTUNISTIC real-codec exit criterion for the §5 stub story: on any
    * host with a real ffmpeg, encode known gray frames to H.264, decode
    * them back through the bridge, and cross-check per-frame luma against
    * the JDK MJPEG path decoding the SAME frames — two independent
    * decoders agreeing on arithmetic. Cancels cleanly (assume) where no
    * binary exists (this sandbox), so the suite stays green everywhere
    * while the real-codec path gets exercised the moment an environment
    * provides one. */
  test("real-ffmpeg opportunistic: H.264 via the bridge cross-checks the " +
    "MJPEG path's luma arithmetic (skipped when no binary)") {
    assume(MultimodalOps.ffmpegAvailable(), "no real ffmpeg on this host")
    import spark.implicits._
    val dim = 32; val nFrames = 6
    // constant-gray frames 40, 60, …, 140 — distinct, codec-robust lumas
    val raw = Array.tabulate[Byte](nFrames * dim * dim)(
      i => (40 + 20 * (i / (dim * dim))).toByte)
    def encode(codecArgs: Seq[String]): Array[Byte] = {
      val cmd = Seq("ffmpeg", "-v", "error", "-f", "rawvideo", "-pix_fmt",
        "gray", "-s", s"${dim}x$dim", "-r", "4", "-i", "pipe:0") ++
        codecArgs ++ Seq("-f", "avi", "pipe:1")
      val p = new ProcessBuilder(cmd: _*)
        .redirectError(ProcessBuilder.Redirect.DISCARD).start()
      val w = new Thread(() => {
        try { p.getOutputStream.write(raw); p.getOutputStream.close() }
        catch { case _: java.io.IOException => () }
      })
      w.setDaemon(true); w.start()
      val out = p.getInputStream.readAllBytes(); w.join(); p.waitFor(); out
    }
    val h264 = encode(Seq("-c:v", "libx264", "-pix_fmt", "yuv420p", "-g", "1"))
    assume(h264.nonEmpty, "this ffmpeg build lacks an H.264 encoder")
    val mjpeg = encode(Seq("-c:v", "mjpeg", "-q:v", "2"))
    assume(mjpeg.nonEmpty, "this ffmpeg build lacks an MJPEG encoder")
    val expect = (0 until nFrames).map(i => 40.0 + 20 * i)
    val viaBridge = MultimodalOps.decodeVideoFramesFfmpeg(spark,
        Seq(MediaRecord(1L, h264, "video")).toDS(),
        everyK = 1, maxFramesPerVideo = nFrames, frameDim = dim)
      .collect().sortBy(_.frame_idx)
    assert(viaBridge.nonEmpty && viaBridge.forall(_.real_decode),
      "bridge must really decode H.264 on a real-ffmpeg host")
    viaBridge.zip(expect).foreach { case (f, e) =>
      assert(math.abs(f.mean_luma - e) < 6.0,
        s"H.264 frame ${f.frame_idx} luma ${f.mean_luma}, want ~$e") }
    val viaJdk = MultimodalOps.decodeVideoFrames(spark,
        Seq(MediaRecord(2L, mjpeg, "video")).toDS(),
        everyK = 1, maxFramesPerVideo = nFrames)
      .collect().sortBy(_.frame_idx)
    assert(viaJdk.nonEmpty && viaJdk.forall(_.real_decode),
      "JDK MJPEG path must really decode ffmpeg-encoded MJPEG")
    viaBridge.take(viaJdk.length).zip(viaJdk).foreach { case (b, j) =>
      assert(math.abs(b.mean_luma - j.mean_luma) < 8.0,
        s"decoders disagree on frame ${b.frame_idx}: bridge ${b.mean_luma} " +
        s"vs JDK ${j.mean_luma}") }
  }
}
