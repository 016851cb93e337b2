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

  /** Stubbed decode + feature extraction over the binary column
    * (mapPartitions batch shape) — rows-only; determinism and frame
    * sampling are asserted in MultimodalSpec.
    */
  val mmDecodeFeatures = QueryDef(
    "mm_decode_features",
    None,
    (spark, dir) => {
      import spark.implicits._
      val media = Multimodal.attachPayloads(Tables.documents(spark, dir))
        .as[Multimodal.MediaRow]
      Multimodal.decodeStub(media).toDF()
        .select(col("doc_id"), col("media_type"), col("byte_len"),
          col("checksum"), r4(col("brightness")).as("brightness"), col("n_frames"))
        .orderBy(col("doc_id"))
    })

  val all: Seq[QueryDef] = Seq(mmBinaryMeta, mmDecodeFeatures)
}
