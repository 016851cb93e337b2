package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by batch-shaped partition
  * functions.
  *
  * The Spark-side plumbing here is real and tested — schema, partitioning,
  * batch iteration shape, deterministic outputs. The actual media decode
  * is a clearly-marked STUB (`decodeStub`): the codec libraries are not in
  * this container, so it derives deterministic fake features from the
  * bytes. Swapping in a real decoder changes only that one function.
  *
  * Scale notes: payloads stay columnar (parquet binary) end-to-end; the
  * decode pass is `mapPartitions` (one JVM call per partition, amortized
  * setup — the Scala analogue of mapInPandas' batch shape); feature
  * extraction emits fixed-width columns so downstream is codegen'd.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String,
      payload: Array[Byte], width: Int, height: Int, duration_ms: Long)

  final case class MediaFeatures(doc_id: Long, media_type: String,
      byte_len: Long, checksum: Long, brightness: Double, n_frames: Int)

  /** Attach a synthetic binary payload to each document (UTF-8 bytes of
    * the text — a deterministic stand-in for real media bytes) plus typed
    * metadata columns, cycling through the three modalities.
    */
  def attachPayloads(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 1920).cast("int").as("width"),
      (col("n_chars") % 1080).cast("int").as("height"),
      (col("n_chars") * 10).cast("long").as("duration_ms"))

  /** STUB decode: derives deterministic pseudo-features from the payload
    * bytes. A real implementation would decode the image/audio frame here;
    * the signature, batching, and output schema are the real contract.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup happens once (real decoders open codecs here)
      rows.map { r =>
        val bytes = r.payload
        var checksum = 1469598103934665603L
        var i = 0
        var sum = 0L
        while (i < bytes.length) {
          checksum = (checksum ^ bytes(i)) * 1099511628211L
          sum += bytes(i) & 0xFF
          i += 1
        }
        val brightness =
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length / 255.0
        val nFrames = r.media_type match {
          case "video" => math.max(1, (r.duration_ms / 1000).toInt)
          case "audio" => math.max(1, (r.duration_ms / 100).toInt)
          case _       => 1
        }
        MediaFeatures(r.doc_id, r.media_type, bytes.length.toLong,
          checksum, brightness, nFrames)
      }
    }
  }

  /** Real header parsing (no codec libraries needed): sniff the container
    * format from magic bytes and extract intrinsic dimensions/rates from
    * the header — PNG IHDR width/height, JPEG SOF0/SOF2 dimensions, WAV
    * fmt-chunk sample rate. Unknown payloads return ("unknown", -1, -1).
    * This is the non-stub slice of media decoding: everything up to the
    * entropy-coded payload is plain byte arithmetic.
    */
  final case class MediaHeader(format: String, width: Int, height: Int)

  def parseHeader(bytes: Array[Byte]): MediaHeader = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    if (bytes.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G') {
      // PNG: 8-byte signature, IHDR length+type at 8..15, width/height at 16..23
      MediaHeader("png", be32(16), be32(20))
    } else if (bytes.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // JPEG: walk markers to a SOF0/SOF2 frame header
      var i = 2
      var out: MediaHeader = MediaHeader("jpeg", -1, -1)
      var done = false
      while (!done && i + 9 <= bytes.length) {
        if (u8(i) != 0xFF) { done = true }
        else {
          val marker = u8(i + 1)
          if (marker == 0xC0 || marker == 0xC2) {
            out = MediaHeader("jpeg", be16(i + 7), be16(i + 5))
            done = true
          } else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) {
            i += 2
          } else {
            i += 2 + be16(i + 2)
          }
        }
      }
      out
    } else if (bytes.length >= 32 &&
        bytes.startsWith("RIFF".getBytes) &&
        new String(bytes.slice(8, 12)) == "WAVE") {
      // WAV: fmt chunk sample rate at offset 24 (canonical layout)
      MediaHeader("wav", le32(24), u8(22) /* channels */)
    } else MediaHeader("unknown", -1, -1)
  }

  /** Column-level format sniff over the binary payload (runs the parser
    * per-partition; constant-size output columns keep downstream
    * codegen'd).
    */
  def sniffHeaders(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val h = parseHeader(r.payload)
        (r.doc_id, h.format, h.width, h.height)
      }
    }.toDF("doc_id", "format", "parsed_width", "parsed_height")
  }

  /** Frame sampling: one output row per sampled frame index — the
    * explode-shaped fan-out a video pipeline needs (every k-th frame).
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int): DataFrame =
    features.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), floor((col("n_frames") - 1) / everyK).cast("int"))).as("sample_idx"))
      .select(col("doc_id"), (col("sample_idx") * everyK).as("frame_idx"))
}
