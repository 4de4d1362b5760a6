package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque binary columns with typed
  * metadata, processed batch-wise via mapPartitions.
  *
  * IMAGE decode is REAL: `decodeImages` runs the JDK's javax.imageio codecs
  * (PNG/JPEG/GIF/BMP ship with every JVM — no external packages), reading
  * both the header (format/dimensions) and the pixel raster (mean luminance
  * as the representative extracted feature). Payloads no JDK codec accepts
  * (audio/video containers, corrupt bytes) fall back to the deterministic
  * synthetic-header stub (`decodeStub`) so the pipeline is total — that stub
  * remains the stand-in for the audio/video codecs the container lacks.
  *
  * Scale: binary payloads ride in parquet as byte arrays; decode is map-side;
  * `repartition` before decode balances payload bytes (not row counts) when
  * media sizes are skewed.
  */
object MultimodalOps {

  case class MediaRecord(media_id: Long, bytes: Array[Byte], kind: String)
  case class DecodedMeta(media_id: Long, kind: String, byte_len: Int,
                         width: Int, height: Int, n_frames: Int)

  /** Oracle-checkable metadata pass over binary content (here derived from
    * the documents table: bytes = UTF-8 of text — a stand-in payload). */
  def multimodalMeta(docs: DataFrame): DataFrame = {
    val bin = encode(col("text"), "UTF-8")
    docs.select(
      col("doc_id"),
      octet_length(bin).cast("long").as("byte_len"),
      md5(bin).as("content_md5"),
      when(pmod(ascii(substring(col("text"), 1, 1)), lit(3)) === 0, "image")
        .when(pmod(ascii(substring(col("text"), 1, 1)), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"))
  }

  /** Documents → MediaRecord dataset (the binary-column ingestion shape). */
  def asMediaRecords(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("bytes"),
        when(pmod(ascii(substring(col("text"), 1, 1)), lit(3)) === 0, "image")
          .when(pmod(ascii(substring(col("text"), 1, 1)), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"))
      .as[MediaRecord]
  }

  case class DecodedImage(media_id: Long, format: String, width: Int, height: Int,
                          byte_len: Int, mean_luma: Double, real_decode: Boolean)

  /** REAL image decode through the Dataset path: javax.imageio header read
    * (format + dimensions without a pixel decode) followed by a raster read
    * for the feature pass (mean ITU-R 601 luminance, stride-subsampled to a
    * bounded pixel budget per image). Undecodable payloads degrade to the
    * stub's synthetic metadata with `real_decode = false` — a corrupt image
    * in 100 TB of media must mark, not kill, the job. mapPartitions mirrors
    * a real codec's lifecycle: decoder state per partition, records
    * streamed through. */
  def decodeImages(spark: SparkSession, media: Dataset[MediaRecord],
                   maxSampledPixels: Int = 1 << 16,
                   maxDecodePixels: Long = 64L << 20): Dataset[DecodedImage] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val real =
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(m.bytes))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) None
              else {
                val r = readers.next()
                try {
                  r.setInput(iis)
                  val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
                  // decompression-bomb guard: the header declares dimensions
                  // BEFORE any raster is allocated — a tiny payload claiming
                  // a huge raster would OOM the executor at r.read(0), and
                  // OutOfMemoryError is not caught by NonFatal. Bound the
                  // declared pixel count first; oversized claims degrade to
                  // the stub like any other undecodable payload (ADVICE r3).
                  val declaredPixels = r.getWidth(0).toLong * r.getHeight(0).toLong
                  if (declaredPixels > maxDecodePixels)
                    throw new java.io.IOException(
                      s"declared raster $declaredPixels px exceeds bound $maxDecodePixels")
                  val img = r.read(0)
                  val w = img.getWidth; val h = img.getHeight
                  val stride = math.max(1, math.toIntExact(
                    math.round(math.sqrt(w.toLong * h / maxSampledPixels.toDouble))))
                  var sum = 0.0; var n = 0L; var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val rgb = img.getRGB(x, y)
                      sum += 0.299 * ((rgb >> 16) & 0xff) +
                             0.587 * ((rgb >> 8) & 0xff) +
                             0.114 * (rgb & 0xff)
                      n += 1; x += stride
                    }
                    y += stride
                  }
                  Some(DecodedImage(m.media_id, fmt, w, h, m.bytes.length,
                    mean_luma = if (n == 0) 0.0 else sum / n, real_decode = true))
                } finally r.dispose()
              }
            } finally if (iis != null) iis.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        real.getOrElse {
          val b = m.bytes
          def at(i: Int): Int = if (b.length > i) b(i) & 0xff else 0
          DecodedImage(m.media_id, "undecoded", 16 + at(0) % 240, 16 + at(1) % 240,
            b.length, mean_luma = 0.0, real_decode = false)
        }
      }
    }
  }

  /** STUB DECODER — deterministic fake standing in for the AUDIO/VIDEO
    * codecs this container lacks (images decode for real via decodeImages).
    * "Decodes" width/height/frames from the first payload bytes. Partition-
    * wise: one "decoder" per partition, records streamed through it — the
    * exact batch shape a real codec (or mapInPandas) needs. */
  def decodeStub(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real codec would init native resources here, once per partition
      it.map { m =>
        val b = m.bytes
        def at(i: Int): Int = if (b.length > i) b(i) & 0xff else 0
        DecodedMeta(m.media_id, m.kind, b.length,
          width = 16 + at(0) % 240, height = 16 + at(1) % 240,
          n_frames = if (m.kind == "video") 1 + at(2) % 32 else 1)
      }
    }
  }

  /** Stub resize: recompute metadata for a bounded box, keeping aspect via
    * integer arithmetic (the plumbing of an image-resize stage). */
  def resizeStub(spark: SparkSession, decoded: Dataset[DecodedMeta], maxDim: Int = 64): Dataset[DecodedMeta] = {
    import spark.implicits._
    decoded.map { d =>
      val scaleNum = maxDim
      val scaleDen = math.max(math.max(d.width, d.height), maxDim)
      d.copy(width = math.max(1, d.width * scaleNum / scaleDen),
             height = math.max(1, d.height * scaleNum / scaleDen))
    }
  }

  /** Stub frame sampling: every kth frame index per video (the shape of a
    * frame-extraction fan-out: one row per sampled frame). */
  def frameSampleStub(spark: SparkSession, decoded: Dataset[DecodedMeta], k: Int = 4): DataFrame = {
    import spark.implicits._
    decoded.filter(_.kind == "video")
      .flatMap(d => (0 until d.n_frames by k).map(f => (d.media_id, f)))
      .toDF("media_id", "frame_idx")
  }
}
