package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque binary columns with typed
  * metadata, processed batch-wise via mapPartitions.
  *
  * The container has no codec libraries, so the DECODE STEP IS A STUB — a
  * deterministic fake that "decodes" a synthetic header layout (see
  * `decodeStub`). Everything around it is real and tested: the binary-column
  * schema, the partition-wise batch iteration (one decoder init per
  * partition, like a Pandas-UDF batch), and the downstream feature plumbing.
  * Swapping in a real codec replaces exactly one function.
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

  /** STUB DECODER — deterministic fake standing in for an image/audio codec.
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
