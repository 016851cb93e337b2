package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by batch-shaped partition
  * functions.
  *
  * The codecs here are REAL, pure-JVM byte parsers for real formats —
  * no codec libraries needed because everything up to the entropy-coded
  * payload is plain byte arithmetic:
  *   - image: 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows,
  *     4-byte row padding) — encoder and pixel-exact decoder;
  *   - audio: canonical RIFF/WAVE PCM16 mono — encoder and sample-exact
  *     decoder (chunk walk, fmt + data);
  *   - video: a length-prefixed concatenation of real BMP frames (magic
  *     "GFV1") — each frame decodes through the BMP parser.
  * `attachMediaPayloads` derives payload bytes deterministically from the
  * document text (the fixtures carry no real media), so features are
  * reproducible functions of actual encoded pixels/samples.
  *
  * Scale notes: payloads stay columnar (parquet binary) end-to-end; the
  * decode pass is `mapPartitions` (one JVM call per partition, amortized
  * setup — the Scala analogue of mapInPandas' batch shape); feature
  * extraction emits fixed-width columns so downstream is codegen'd.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String,
      payload: Array[Byte], width: Int, height: Int, duration_ms: Long)

  /** Decoded features: intrinsic dimensions/rates parsed from the real
    * header, brightness/RMS computed over the real pixel/sample payload,
    * FNV checksum of the raw bytes (determinism gate).
    */
  final case class DecodedMedia(doc_id: Long, media_type: String,
      format: String, width: Int, height: Int, sample_rate: Int,
      n_frames: Int, brightness: Double, byte_len: Long, checksum: Long)

  // ------------------------------------------------------------ encoders

  /** 24-bit uncompressed BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes.
    * `pixels` is row-major top-down BGR, length = width*height*3.
    */
  def encodeBmp(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height * 3, "pixels must be w*h*3 BGR")
    val stride = ((width * 3) + 3) / 4 * 4
    val dataSize = stride * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putShort(0).putShort(0).putInt(54) // size, res, offset
    buf.putInt(40).putInt(width).putInt(height)                  // DIB header
    buf.putShort(1).putShort(24)                                 // planes, bpp
    buf.putInt(0).putInt(dataSize).putInt(2835).putInt(2835)     // BI_RGB, size, dpi
    buf.putInt(0).putInt(0)                                      // palette
    var y = height - 1                                           // bottom-up
    while (y >= 0) {
      buf.put(pixels, y * width * 3, width * 3)
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Canonical 44-byte RIFF/WAVE header + little-endian PCM16 mono. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
    buf.putShort(1).putShort(1)                     // PCM, mono
    buf.putInt(sampleRate).putInt(sampleRate * 2)   // byte rate
    buf.putShort(2).putShort(16)                    // block align, bits
    buf.put("data".getBytes).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Minimal multi-frame container: "GFV1" + frame count + per-frame
    * length-prefixed real BMP payloads.
    */
  def encodeFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val size = 8 + frames.map(4 + _.length).sum
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GFV1".getBytes).putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Deterministic media payload for a document: REAL encoded bytes whose
    * pixel/sample values derive from the UTF-8 text (media_type cycles
    * image/audio/video by doc_id, same convention as `attachPayloads`).
    */
  def mediaBytesFor(mediaType: String, text: String): Array[Byte] = {
    val tb = text.getBytes("UTF-8")
    def b(i: Int): Byte = if (tb.isEmpty) 0 else tb(i % tb.length)
    mediaType match {
      case "image" =>
        val w = 4 + (tb.length % 13)
        val h = 4 + (tb.length % 9)
        encodeBmp(Array.tabulate(w * h * 3)(b), w, h)
      case "audio" =>
        val n = 64 + (tb.length % 512)
        encodeWav(Array.tabulate(n)(i => (((b(i) & 0xFF) - 128) * 256).toShort), 8000)
      case _ =>
        val (w, h) = (6, 4)
        val nf = 1 + (tb.length % 4)
        encodeFrames((0 until nf).map(f =>
          encodeBmp(Array.tabulate(w * h * 3)(i => b(i + f)), w, h)))
    }
  }

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

  /** Attach REAL encoded media bytes (BMP / WAV / GFV1 frames) derived
    * deterministically from each document's text. Encoding runs in
    * `mapPartitions` (byte-level work, batch-shaped); the output is a
    * plain (doc_id, media_type, payload) binary-column DataFrame.
    */
  def attachMediaPayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val mt = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          (id, mt, mediaBytesFor(mt, text))
        }
      }.toDF("doc_id", "media_type", "payload")
  }

  // ------------------------------------------------------------ decoders

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** Pixel-exact 24-bit BMP decode: (width, height, mean byte value over
    * the REAL pixel area — stride padding excluded). None for anything
    * that isn't an uncompressed 24-bit BMP.
    */
  def decodeBmpPixels(b: Array[Byte]): Option[(Int, Int, Double)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val offset = le32(b, 10)
    val w = le32(b, 18)
    val h = le32(b, 22)
    if (le16(b, 28) != 24 || le32(b, 30) != 0) return None // bpp, BI_RGB
    if (w <= 0 || h <= 0) return None
    // stride in LONG: a crafted width near 2^31/3 overflows Int stride and
    // would bypass the size check below
    val strideL = ((w.toLong * 3) + 3) / 4 * 4
    if (offset < 54 || offset.toLong + strideL * h > b.length) return None
    val stride = strideL.toInt // ≤ b.length after the check above
    var sum = 0L
    var y = 0
    while (y < h) {
      val rowStart = offset + y * stride
      var x = 0
      while (x < w * 3) { sum += b(rowStart + x) & 0xFF; x += 1 }
      y += 1
    }
    Some((w, h, sum.toDouble / (w.toLong * h * 3)))
  }

  /** Sample-exact WAV PCM16 decode via a proper chunk walk:
    * (sampleRate, nSamples, RMS amplitude normalized to [0,1]). None for
    * non-PCM16 or malformed payloads.
    */
  def decodeWavSamples(b: Array[Byte]): Option[(Int, Int, Double)] =
    decodeWavPcm(b).map { case (rate, pcm) =>
      var sumSq = 0.0
      var s = 0
      while (s < pcm.length) {
        val v = pcm(s) / 32768.0
        sumSq += v * v
        s += 1
      }
      (rate, pcm.length,
        if (pcm.isEmpty) 0.0 else math.sqrt(sumSq / pcm.length))
    }

  /** Raw PCM16 decode: (sampleRate, samples) via the chunk walk. None
    * for non-PCM16-mono or malformed payloads.
    */
  def decodeWavPcm(b: Array[Byte]): Option[(Int, Array[Short])] = {
    if (b.length < 44 || !b.startsWith("RIFF".getBytes) ||
        new String(b.slice(8, 12)) != "WAVE") return None
    var i = 12
    var rate = -1
    var ok = false
    var dataAt = -1
    var dataLen = 0
    while (i + 8 <= b.length) {
      val id = new String(b.slice(i, i + 4))
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (id == "fmt ") {
        ok = le16(b, i + 8) == 1 && le16(b, i + 10) == 1 && le16(b, i + 22) == 16
        rate = le32(b, i + 12)
      } else if (id == "data") { dataAt = i + 8; dataLen = size }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!ok || rate <= 0 || dataAt < 0) return None
    val n = dataLen / 2
    val pcm = new Array[Short](n)
    var s = 0
    while (s < n) {
      pcm(s) = le16(b, dataAt + s * 2).toShort
      s += 1
    }
    Some((rate, pcm))
  }

  final case class AudioEnergy(doc_id: Long, sample_rate: Int, n_samples: Int,
      n_windows: Int, silence_ratio: Double, mean_rms: Double,
      peak_rms: Double, peak_win: Int, clip_ratio: Double)

  /** Windowed loudness census per audio payload — the VAD / loudness-
    * normalization pre-pass of an audio corpus pipeline: fixed
    * `winSamples` windows (trailing partial window kept), per-window
    * RMS in [0,1], silence below `silenceRms`, clipping at |s| ≥ 32760.
    * Emits one row per document: window count, silence ratio, mean and
    * peak window RMS with the (first) peak window index, clipped-sample
    * ratio. Same batch shape as `decodeFeatures`: one mapPartitions
    * pass, fixed-width output columns, payloads never leave the
    * executor.
    */
  def audioEnergy(media: DataFrame, winSamples: Int = 128,
      silenceRms: Double = 0.01): Dataset[AudioEnergy] = {
    require(winSamples >= 1, s"winSamples must be >= 1, got $winSamples")
    import media.sparkSession.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWavPcm(bytes).map { case (rate, pcm) =>
          val nw = (pcm.length + winSamples - 1) / winSamples
          var w = 0
          var silent = 0
          var sumRms = 0.0
          var peak = -1.0
          var peakW = -1
          var clipped = 0
          while (w < nw) {
            val from = w * winSamples
            val to = math.min(from + winSamples, pcm.length)
            var sumSq = 0.0
            var s = from
            while (s < to) {
              val v = pcm(s) / 32768.0
              sumSq += v * v
              if (pcm(s) >= 32760 || pcm(s) <= -32760) clipped += 1
              s += 1
            }
            val rms = math.sqrt(sumSq / (to - from))
            if (rms < silenceRms) silent += 1
            if (rms > peak) { peak = rms; peakW = w }
            sumRms += rms
            w += 1
          }
          AudioEnergy(id, rate, pcm.length, nw,
            if (nw == 0) 0.0 else silent.toDouble / nw,
            if (nw == 0) 0.0 else sumRms / nw,
            math.max(peak, 0.0), peakW,
            if (pcm.isEmpty) 0.0 else clipped.toDouble / pcm.length)
        }
      })
  }

  /** Decode one payload by sniffing its real format. Brightness carries
    * the modality's intensity statistic: mean pixel value (BMP, frame
    * average for GFV1) or RMS amplitude (WAV). Malformed/unknown payloads
    * degrade to ("unknown", -1, ...) instead of failing the batch.
    */
  def decodeOne(docId: Long, mediaType: String, bytes: Array[Byte]): DecodedMedia = {
    var checksum = 1469598103934665603L
    var i = 0
    while (i < bytes.length) {
      checksum = (checksum ^ bytes(i)) * 1099511628211L
      i += 1
    }
    def unknown = DecodedMedia(docId, mediaType, "unknown", -1, -1, -1, 0,
      0.0, bytes.length.toLong, checksum)
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
      decodeBmpPixels(bytes).map { case (w, h, mean) =>
        DecodedMedia(docId, mediaType, "bmp", w, h, -1, 1,
          mean / 255.0, bytes.length.toLong, checksum)
      }.getOrElse(unknown)
    } else if (bytes.length >= 12 && bytes.startsWith("RIFF".getBytes)) {
      decodeWavSamples(bytes).map { case (rate, n, rms) =>
        DecodedMedia(docId, mediaType, "wav", -1, -1, rate, n,
          rms, bytes.length.toLong, checksum)
      }.getOrElse(unknown)
    } else if (bytes.length >= 8 && bytes.startsWith("GFV1".getBytes)) {
      val nf = le32(bytes, 4)
      var at = 8
      var f = 0
      var sum = 0.0
      var w = -1
      var h = -1
      var bad = false
      while (f < nf && !bad) {
        if (at + 4 > bytes.length) bad = true
        else {
          val len = le32(bytes, at)
          if (len < 0 || at + 4 + len > bytes.length) bad = true
          else {
            decodeBmpPixels(java.util.Arrays.copyOfRange(bytes, at + 4, at + 4 + len)) match {
              case Some((fw, fh, mean)) =>
                if (f == 0) { w = fw; h = fh }
                sum += mean / 255.0
              case None => bad = true
            }
            at += 4 + len
          }
        }
        f += 1
      }
      if (bad || nf <= 0) unknown
      else DecodedMedia(docId, mediaType, "gfv1", w, h, -1, nf,
        sum / nf, bytes.length.toLong, checksum)
    } else unknown
  }

  /** Nearest-cell thumbnail of a 24-bit BMP: mean byte value per cell of
    * a `side`×`side` grid over the real pixel area (stride padding
    * excluded) — the downscale step of a vision pipeline as plain byte
    * arithmetic. Cells sum disjoint pixel blocks (floor-partitioned), so
    * the grid means reconstruct the global mean exactly when weighted by
    * block sizes. None for anything that isn't an uncompressed 24-bit BMP.
    */
  def resizeBmpGrid(b: Array[Byte], side: Int)
      : Option[(Int, Int, Array[Double], Double)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val offset = le32(b, 10)
    val w = le32(b, 18)
    val h = le32(b, 22)
    if (le16(b, 28) != 24 || le32(b, 30) != 0) return None
    if (w <= 0 || h <= 0 || side <= 0) return None
    // stride in LONG: a crafted width near 2^31/3 overflows Int stride and
    // would bypass the size check below
    val strideL = ((w.toLong * 3) + 3) / 4 * 4
    if (offset < 54 || offset.toLong + strideL * h > b.length) return None
    val stride = strideL.toInt // ≤ b.length after the check above
    val sums = new Array[Double](side * side)
    val counts = new Array[Long](side * side)
    var y = 0
    while (y < h) {
      // rows are stored bottom-up: grid row 0 is the TOP of the image
      val cy = math.min(((h - 1 - y).toLong * side / h).toInt, side - 1)
      val rowStart = offset + y * stride
      var x = 0
      while (x < w) {
        val cx = math.min((x.toLong * side / w).toInt, side - 1)
        val cell = cy * side + cx
        var c = 0
        while (c < 3) {
          sums(cell) += (b(rowStart + x * 3 + c) & 0xFF); c += 1
        }
        counts(cell) += 3
        x += 1
      }
      y += 1
    }
    Some((w, h, sums.indices.map(i =>
      if (counts(i) == 0) 0.0 else sums(i) / counts(i)).toArray,
      sums.sum / counts.sum)) // exact global mean — cells are UNEQUAL blocks
  }

  final case class FrameSample(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, brightness: Double, thumb: Seq[Double])

  /** Deterministic frame sampling + resize over GFV1 video payloads:
    * every `stride`-th frame (always including frame 0) decodes through
    * the real BMP parser and downscales to a `thumbSide`² mean-luma grid
    * — the decode → frame-sample → resize → feature chain of a vision
    * pretraining pipeline, on real bytes. Non-video / malformed payloads
    * contribute no rows (the decode gate owns format errors).
    * `mapPartitions` batch shape, same contract as decodeFeatures.
    */
  def sampleFrames(media: DataFrame, stride: Int,
      thumbSide: Int = 4): Dataset[FrameSample] = {
    require(stride > 0, "stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          if (bytes.length < 8 || !bytes.startsWith("GFV1".getBytes)) Iterator.empty
          else {
            val nf = le32(bytes, 4)
            val out = Seq.newBuilder[FrameSample]
            var at = 8
            var f = 0
            var bad = false
            while (f < nf && !bad) {
              if (at + 4 > bytes.length) bad = true
              else {
                val len = le32(bytes, at)
                // LONG bound: a crafted length near 2^31 overflows the
                // Int sum and would sneak past the check into copyOfRange
                if (len < 0 || at.toLong + 4L + len > bytes.length) bad = true
                else {
                  if (f % stride == 0) {
                    val frame = java.util.Arrays.copyOfRange(bytes, at + 4, at + 4 + len)
                    resizeBmpGrid(frame, thumbSide) match {
                      case Some((w, h, grid, mean)) =>
                        // mean is the block-size-weighted global mean —
                        // the plain cell average would bias whenever
                        // value correlates with position or w < side
                        out += FrameSample(id, f, w, h, mean / 255.0,
                          grid.map(v => math.rint(v * 100) / 100).toSeq)
                      case None => bad = true
                    }
                  }
                  at += 4 + len
                }
              }
              f += 1
            }
            if (bad) Iterator.empty else out.result().iterator
          }
        }
      }
  }

  /** Batch decode over the binary column — real format parsing per row,
    * `mapPartitions` batch shape (per-partition setup amortized, same
    * contract as mapInPandas).
    */
  def decodeFeatures(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, mt, bytes) => decodeOne(id, mt, bytes) }
      }
  }

  /** 64-bit perceptual hash (average-hash) of a BMP payload: the real
    * decode path (`resizeBmpGrid`) shrinks the image to an 8×8 mean-luma
    * grid; each cell contributes a 1 bit iff it is brighter than the mean
    * of the 64 cells. Uniform-intensity edits (brightness shift) flip few
    * bits; unrelated images differ in ~32 — the classic pre-neural image
    * dedup signature. None for non-BMP / malformed payloads.
    */
  def phash64(b: Array[Byte]): Option[Long] =
    resizeBmpGrid(b, 8).map { case (_, _, cells, _) =>
      val cellMean = cells.sum / cells.length
      var sig = 0L
      var i = 0
      while (i < cells.length) {
        if (cells(i) > cellMean) sig |= 1L << i
        i += 1
      }
      sig
    }

  /** (id, sig) pHash signature table over the image rows of a media
    * frame — the input contract of [[Dedup.bandedHammingPairs]]. Map-only
    * (`mapPartitions`, no shuffle): each 64-bit signature replaces a
    * payload that is arbitrarily large, which is the point at 100 TB —
    * the banding join downstream carries 8 bytes a row, not pixels.
    */
  def phashSignatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        phash64(bytes).map(sig => (id, sig))
      })
      .toDF("id", "sig")
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
    * Input is any DataFrame with (doc_id, media_type, n_frames) —
    * typically `decodeFeatures` output.
    */
  def sampleFrames(features: Dataset[DecodedMedia], everyK: Int): DataFrame =
    features.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), floor((col("n_frames") - 1) / everyK).cast("int"))).as("sample_idx"))
      .select(col("doc_id"), (col("sample_idx") * everyK).as("frame_idx"))
}
