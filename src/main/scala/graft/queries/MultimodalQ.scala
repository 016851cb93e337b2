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
    * RMS amplitude over the true samples.
    *
    * FULLY DuckDB-ORACLED via the generators' closed forms: the encoders
    * derive every pixel/sample from the text's UTF-8 bytes
    * (Multimodal.mediaBytesFor), so the oracle re-derives each feature
    * INDEPENDENTLY in SQL — bytes extracted by hex-digit arithmetic,
    * brightness as the cyclic modular sum the pixel generator implies,
    * sizes from the container math (54+stride·h BMP, 44+2n WAV,
    * 8+138·nf GFV1). A decode that mis-parses any header field, reads
    * padding as pixels, or drops a frame diverges from the closed form
    * and hash-mismatches. The container FNV checksum stays pinned
    * byte-exact in MlMultimodalSpec (re-encoding headers in SQL would
    * test the oracle, not the engine).
    */
  val mmDecodeFeatures = QueryDef(
    "mm_decode_features",
    Some("""WITH b AS (
           |  SELECT doc_id, octet_length(encode(text)) AS L,
           |         list_transform(range(1, octet_length(encode(text))+1), i ->
           |           (strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*i-1 AS INT), 1))-1)*16 +
           |            strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*i AS INT), 1))-1) AS tb
           |  FROM documents
           |),
           |img AS (
           |  SELECT doc_id, 'image' AS media_type, 'bmp' AS format,
           |         CAST(4 + (L % 13) AS INT) AS width,
           |         CAST(4 + (L % 9) AS INT) AS height,
           |         CAST(-1 AS INT) AS sample_rate, CAST(1 AS INT) AS n_frames,
           |         round(list_sum(list_transform(range(0, (4+(L%13))*(4+(L%9))*3),
           |           i -> tb[CAST(i % L AS INT) + 1]))
           |           / ((4+(L%13))*(4+(L%9))*3) / 255.0, 4) AS brightness,
           |         CAST(54 + ((((4+(L%13))*3)+3)//4*4) * (4+(L%9)) AS BIGINT) AS byte_len
           |  FROM b WHERE doc_id % 3 = 0
           |),
           |aud AS (
           |  SELECT doc_id, 'audio' AS media_type, 'wav' AS format,
           |         CAST(-1 AS INT) AS width, CAST(-1 AS INT) AS height,
           |         CAST(8000 AS INT) AS sample_rate,
           |         CAST(64 + (L % 512) AS INT) AS n_frames,
           |         round(sqrt(list_sum(list_transform(range(0, 64 + (L % 512)),
           |           i -> ((tb[CAST(i % L AS INT) + 1] - 128.0)/128.0)^2))
           |           / (64 + (L % 512))), 4) AS brightness,
           |         CAST(44 + 2*(64 + (L % 512)) AS BIGINT) AS byte_len
           |  FROM b WHERE doc_id % 3 = 1
           |),
           |vid AS (
           |  SELECT doc_id, 'video' AS media_type, 'gfv1' AS format,
           |         CAST(6 AS INT) AS width, CAST(4 AS INT) AS height,
           |         CAST(-1 AS INT) AS sample_rate,
           |         CAST(1 + (L % 4) AS INT) AS n_frames,
           |         round(list_avg(list_transform(range(0, 1 + (L % 4)), f ->
           |           list_sum(list_transform(range(0, 72),
           |             i -> tb[CAST((i + f) % L AS INT) + 1])) / 72.0 / 255.0)), 4) AS brightness,
           |         CAST(8 + 138*(1 + (L % 4)) AS BIGINT) AS byte_len
           |  FROM b WHERE doc_id % 3 = 2
           |)
           |SELECT * FROM img UNION ALL SELECT * FROM aud
           |UNION ALL SELECT * FROM vid""".stripMargin),
    (spark, dir) => {
      val media = Multimodal.attachMediaPayloads(Tables.documents(spark, dir))
      Multimodal.decodeFeatures(media).toDF()
        .select(col("doc_id"), col("media_type"), col("format"),
          col("width"), col("height"), col("sample_rate"), col("n_frames"),
          r4(col("brightness")).as("brightness"), col("byte_len"))
        .orderBy(col("doc_id"))
    })

  /** The 4×4 thumbnail grid's 16 cell expressions as DuckDB SQL — the
    * CLOSED FORM of `Multimodal.resizeBmpGrid` over the generated GFV1
    * payloads (w=6, h=4, side=4): cell (cy,cx) floor-partitions columns
    * as {0,1},{2},{3,4},{5} and rows 1:1, so each cell is the mean of
    * its block's raw pixel bytes, where pixel byte p of frame f is
    * text-byte (p+f) mod L (Multimodal.mediaBytesFor). `round_even`
    * mirrors `math.rint`'s half-even; the VARCHAR cast was verified to
    * match Java's `Double.toString` over the whole k/100 cell domain.
    */
  private val thumbCellsSql: String = {
    val xs = Map(0 -> Seq(0, 1), 1 -> Seq(2), 2 -> Seq(3, 4), 3 -> Seq(5))
    (for (cy <- 0 until 4; cx <- 0 until 4) yield {
      val pos = for (x <- xs(cx); c <- 0 until 3) yield (cy * 6 + x) * 3 + c
      s"CAST(round_even(CAST(list_sum(list_transform([${pos.mkString(", ")}]," +
        s" p -> tb[CAST((p + f) % L AS INT) + 1])) AS DOUBLE) / ${pos.size}" +
        " * 100, 0) / 100 AS VARCHAR)"
    }).mkString(",\n       ")
  }

  /** Frame-sample + resize over the video payloads: every 2nd GFV1
    * frame decoded through the real BMP parser and downscaled to a 4×4
    * mean-luma thumbnail grid — the vision-pipeline pre-embedding chain.
    * The grid ships as a comma-joined string, not array<double>: the
    * harness compare sorts result frames in pandas, where ndarray cells
    * are unhashable.
    *
    * FULLY DuckDB-ORACLED via the generators' closed forms (see
    * [[thumbCellsSql]] and the mm_decode_features oracle): frame
    * dimensions, sampled indices, global brightness AND all 16 thumb
    * cells re-derive independently in SQL from the text bytes — a
    * decode that misreads the bottom-up row order, counts stride
    * padding, or mis-partitions the grid blocks hash-mismatches. Grid
    * exactness on crafted BMPs stays additionally pinned in
    * MlMultimodalSpec.
    */
  val mmFrameSample = QueryDef(
    "mm_frame_sample",
    Some(s"""WITH b AS (
           |  SELECT doc_id, octet_length(encode(text)) AS L,
           |         list_transform(range(1, octet_length(encode(text))+1), i ->
           |           (strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*i-1 AS INT), 1))-1)*16 +
           |            strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*i AS INT), 1))-1) AS tb
           |  FROM documents
           |),
           |fr AS (
           |  SELECT doc_id, L, tb,
           |         unnest(list_filter(range(0, 1 + (L % 4)), x -> x % 2 = 0)) AS f
           |  FROM b WHERE doc_id % 3 = 2
           |)
           |SELECT doc_id, CAST(f AS INT) AS frame_idx,
           |       CAST(6 AS INT) AS width, CAST(4 AS INT) AS height,
           |       round(list_sum(list_transform(range(0, 72),
           |         i -> tb[CAST((i + f) % L AS INT) + 1])) / 72.0 / 255.0, 4) AS brightness,
           |       concat_ws(',',
           |       $thumbCellsSql) AS thumb
           |FROM fr""".stripMargin),
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
    * runs before any embedding model is spent on it.
    *
    * FULLY DuckDB-ORACLED via the generators' closed forms: the oracle
    * re-derives every 8×8 average-hash cell from the text bytes (cell
    * (cy,cx) floor-partitions the w×h pixel grid; pixel byte p of the
    * image is text-byte p mod L), rebuilds the 64-bit signature as a
    * HUGEINT→signed-BIGINT, and emits ALL pairs at Hamming ≤ 3 by
    * brute xor/bit_count — so the banding's ≤3-exactness claim is
    * checked against an implementation that never bands, on every
    * verify run. A mis-decoded pixel, a wrong grid block, or a banding
    * false-negative is a hash mismatch.
    */
  val mmPhashNeardup = QueryDef(
    "mm_phash_neardup",
    Some("""WITH b AS (
           |  SELECT doc_id, octet_length(encode(text)) AS L,
           |         list_transform(range(1, octet_length(encode(text))+1), i ->
           |           (strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*i-1 AS INT), 1))-1)*16 +
           |            strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*i AS INT), 1))-1) AS tb
           |  FROM documents WHERE doc_id % 3 = 0
           |),
           |dims AS (SELECT doc_id, L, tb, 4 + (L % 13) AS w, 4 + (L % 9) AS h FROM b),
           |px AS (
           |  SELECT doc_id,
           |    flatten(list_transform(range(0, h), r ->
           |      list_transform(range(0, w), x -> struct_pack(
           |        cell := least(r*8//h, 7)*8 + least(x*8//w, 7),
           |        s := tb[CAST(((r*w+x)*3 + 0) % L AS INT) + 1]
           |           + tb[CAST(((r*w+x)*3 + 1) % L AS INT) + 1]
           |           + tb[CAST(((r*w+x)*3 + 2) % L AS INT) + 1])))) AS px
           |  FROM dims
           |),
           |cells AS (
           |  SELECT doc_id,
           |    list_transform(range(0, 64), ci ->
           |      CASE WHEN len(list_filter(px, p -> p.cell = ci)) = 0 THEN 0.0
           |           ELSE CAST(list_sum(list_transform(list_filter(px, p -> p.cell = ci), p -> p.s)) AS DOUBLE)
           |                / (3 * len(list_filter(px, p -> p.cell = ci)))
           |      END) AS c
           |  FROM px
           |),
           |usig AS (
           |  SELECT doc_id,
           |    COALESCE(list_sum(list_transform(range(0,64), i ->
           |      CASE WHEN c[CAST(i AS INT)+1] > list_sum(c)/64
           |           THEN CAST(pow(2, i) AS HUGEINT) ELSE 0::HUGEINT END)),
           |      0::HUGEINT) AS u
           |  FROM cells
           |),
           |sigs AS (
           |  SELECT doc_id,
           |    CASE WHEN u >= 9223372036854775808::HUGEINT
           |         THEN CAST(u - 18446744073709551616::HUGEINT AS BIGINT)
           |         ELSE CAST(u AS BIGINT) END AS sig
           |  FROM usig
           |)
           |SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
           |       CAST(bit_count(xor(a.sig, b2.sig)) AS INT) AS hamming
           |FROM sigs a JOIN sigs b2 ON a.doc_id < b2.doc_id
           |WHERE bit_count(xor(a.sig, b2.sig)) <= 3""".stripMargin),
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
    * video frame-sample, audio energy).
    *
    * FULLY DuckDB-ORACLED via the generators' closed forms: sample i is
    * (text-byte i mod L − 128)·256, so each window's RMS re-derives in
    * SQL exactly (v² = k²/16384 is a dyadic rational — the window sums
    * are EXACT doubles in any summation order), as do the silence /
    * peak / clipping censuses. A chunk-walk bug, an off-by-one window
    * boundary, or a partial-trailing-window mistake hash-mismatches.
    */
  val mmAudioEnergy = QueryDef(
    "mm_audio_energy",
    Some("""WITH b AS (
           |  SELECT doc_id, octet_length(encode(text)) AS L,
           |         list_transform(range(1, octet_length(encode(text))+1), i ->
           |           (strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*i-1 AS INT), 1))-1)*16 +
           |            strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*i AS INT), 1))-1) AS tb
           |  FROM documents WHERE doc_id % 3 = 1
           |),
           |au AS (
           |  SELECT doc_id, L, tb, CAST(64 + (L % 512) AS INT) AS n,
           |         CAST((64 + (L % 512) + 127) // 128 AS INT) AS nw
           |  FROM b
           |),
           |win AS (
           |  SELECT doc_id, n, nw,
           |    list_transform(range(0, nw), w ->
           |      sqrt(list_sum(list_transform(
           |        range(CAST(w*128 AS INT), CAST(least(w*128+128, n) AS INT)),
           |        i -> ((tb[CAST(i % L AS INT) + 1] - 128.0)/128.0)^2))
           |        / (least(w*128+128, n) - w*128))) AS rms,
           |    CAST(len(list_filter(range(0, n),
           |      i -> tb[CAST(i % L AS INT) + 1] = 0)) AS DOUBLE) / n AS clip
           |  FROM au
           |)
           |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, n AS n_samples,
           |       nw AS n_windows,
           |       round(CAST(len(list_filter(rms, r -> r < 0.01)) AS DOUBLE) / nw, 4) AS silence_ratio,
           |       round(list_sum(rms) / nw, 4) AS mean_rms,
           |       round(list_max(rms), 4) AS peak_rms,
           |       CAST(list_position(rms, list_max(rms)) - 1 AS INT) AS peak_win,
           |       round(clip, 4) AS clip_ratio
           |FROM win""".stripMargin),
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
