package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns._
import graft.operators.Multimodal

/** Multimodal-column query surface: binary payload plumbing (schema +
  * metadata + content hashing) oracle-checked; the stubbed decode path is
  * rows-only and property-tested in MultimodalSpec.
  */
object MultimodalQ {

  /** Binary columns: byte length + md5 of the payload + typed metadata —
    * DuckDB sees the identical UTF-8 bytes via text::BLOB.
    */
  val mmBinaryMeta = QueryDef(
    "mm_binary_meta",
    Some("""SELECT doc_id,
           |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           |                       ELSE 'video' END AS media_type,
           |       octet_length(text::BLOB) AS byte_len,
           |       md5(text) AS payload_md5,
           |       CAST(n_chars % 1920 AS INT) AS width,
           |       CAST(n_chars % 1080 AS INT) AS height
           |FROM documents""".stripMargin),
    (spark, dir) =>
      Multimodal.attachPayloads(Tables.documents(spark, dir))
        .select(col("doc_id"), col("media_type"),
          length(col("payload")).cast("long").as("byte_len"),
          md5(col("payload")).as("payload_md5"),
          col("width"), col("height")))

  /** REAL decode + feature extraction over the binary column: payloads
    * are actual encoded BMP pixels / WAV PCM16 samples / GFV1 frame
    * containers (derived deterministically from the doc text), and every
    * feature comes from parsing those bytes — header dimensions, mean
    * pixel brightness over the true pixel area (stride padding excluded),
    * RMS amplitude over the true samples. Rows-only (byte-level parsing
    * is not SQL-expressible); pixel/sample exactness is pinned in
    * MultimodalSpec against hand-computed fixtures, determinism by the
    * decode gate.
    */
  val mmDecodeFeatures = QueryDef(
    "mm_decode_features",
    None,
    (spark, dir) => {
      val media = Multimodal.attachMediaPayloads(Tables.documents(spark, dir))
      Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"), col("media_type"), col("format"),
          col("width"), col("height"), col("sample_rate"), col("n_frames"),
          r4(col("brightness")).as("brightness"), col("byte_len"), col("checksum"))
        .orderBy(col("doc_id"))
    })

  /** Frame-sample + resize over the video payloads: every 2nd GFV1
    * frame decoded through the real BMP parser and downscaled to a 4×4
    * mean-luma thumbnail grid — the vision-pipeline pre-embedding chain.
    * Rows-only (byte-level); grid exactness and determinism pinned in
    * MlMultimodalSpec against a hand-computed fixture. The grid ships as
    * a comma-joined string, not array<double>: the harness compare sorts
    * result frames in pandas, where ndarray cells are unhashable.
    */
  val mmFrameSample = QueryDef(
    "mm_frame_sample",
    None,
    (spark, dir) => {
      val media = Multimodal.attachMediaPayloads(Tables.documents(spark, dir))
        .filter(col("media_type") === "video")
      Multimodal.sampleFrames(media, stride = 2, thumbSide = 4).toDF()
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          r4(col("brightness")).as("brightness"),
          array_join(transform(col("thumb"), v => v.cast("string")), ",")
            .as("thumb"))
        .orderBy(col("doc_id"), col("frame_idx"))
    })

  /** Perceptual-hash near-dup pairs over the image payloads: real BMP
    * decode → 8×8 average-hash signature (`Multimodal.phash64`) → the
    * shared 16-bit-band Hamming blocking (`Dedup.bandedHammingPairs`,
    * exact for distance ≤ 3 by pigeonhole). The image-side counterpart
    * of `dd_simhash` — the pre-neural image dedup a multimodal corpus
    * runs before any embedding model is spent on it. No SQL oracle
    * (binary decode); the banding-vs-brute exactness is gated in
    * qc_quant_gates and the signature behavior spec'd on crafted BMPs.
    */
  val mmPhashNeardup = QueryDef(
    "mm_phash_neardup",
    None,
    (spark, dir) => {
      val media = Multimodal.attachMediaPayloads(Tables.documents(spark, dir))
        .filter(col("media_type") === "image")
      graft.operators.Dedup.bandedHammingPairs(
          Multimodal.phashSignatures(media), maxDist = 3)
        .orderBy(col("id_a"), col("id_b"))
    })

  /** Windowed loudness census over the audio payloads: real WAV PCM16
    * decode → 128-sample windows → per-doc silence ratio, mean/peak
    * window RMS, clipping ratio — the VAD / loudness-normalization
    * audit an audio corpus runs before transcription is spent on dead
    * or clipped segments. Completes the modality triple (image pHash,
    * video frame-sample, audio energy). Rows-only (binary decode);
    * window arithmetic pinned on crafted WAVs in MlMultimodalSpec.
    */
  val mmAudioEnergy = QueryDef(
    "mm_audio_energy",
    None,
    (spark, dir) => {
      val media = Multimodal.attachMediaPayloads(Tables.documents(spark, dir))
        .filter(col("media_type") === "audio")
      Multimodal.audioEnergy(media, winSamples = 128, silenceRms = 0.01).toDF()
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          col("n_windows"), r4(col("silence_ratio")).as("silence_ratio"),
          r4(col("mean_rms")).as("mean_rms"), r4(col("peak_rms")).as("peak_rms"),
          col("peak_win"), r4(col("clip_ratio")).as("clip_ratio"))
        .orderBy(col("doc_id"))
    })

  val all: Seq[QueryDef] = Seq(mmBinaryMeta, mmDecodeFeatures, mmFrameSample,
    mmPhashNeardup, mmAudioEnergy)
}
