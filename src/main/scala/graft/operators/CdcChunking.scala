package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Content-defined chunking (FastCDC/rsync-style, on tokens): chunk
  * boundaries fall where a rolling fingerprint of the trailing `gramN`
  * tokens hits 0 mod `modulus` — so an insertion early in a document
  * only reshapes chunks up to the next boundary, and every identical
  * passage re-chunks identically REGARDLESS of its offset. That is the
  * property fixed-size chunking (tx_chunks) lacks, and why CDC is the
  * standard sub-document dedup key for shifted/edited corpora.
  *
  * The boundary decision uses the same md5-uniform variate as the
  * sampling family (Sampling.hexVal) rather than a rolling Rabin hash:
  * deterministic, engine-portable (the oracle recomputes it from SQL),
  * and per-position O(gramN) on a BOUND token-array column — the gram
  * never re-tokenizes the document (the LambdaLint discipline).
  *
  * Scale: one scan → per-token explode (O(total tokens), the unavoidable
  * payload), per-document window for the running chunk index (partitioned
  * by doc — horizontally scalable), one groupBy(doc, chunk) to assemble
  * chunk fingerprints. The cross-doc duplicate roll-up then shuffles
  * (fp, doc) pairs only — never chunk text.
  */
object CdcChunking {

  /** Per-chunk fingerprints: (doc_id, chunk, fp, n_tok). Expected chunk
    * length ≈ `modulus` tokens.
    */
  def chunkFingerprints(docs: DataFrame, gramN: Int = 3, modulus: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(gramN >= 1 && modulus >= 2, "need gramN >= 1, modulus >= 2")
    val d = docs.select(col(idCol).as("doc_id"),
        TextFns.tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= 1)
    // cut AFTER position i when the gram ending at i hashes to 0 mod m
    // (positions < gramN can't host a full gram — never cut)
    val cuts = transform(sequence(lit(1), size(col("w"))), i =>
      when(i >= gramN,
        (Sampling.hexVal(
          array_join(slice(col("w"), i - (gramN - 1), lit(gramN)), " "))
          % modulus === 0).cast("int"))
        .otherwise(lit(0)))
    val cum = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("cuts", cuts)
      .select(col("doc_id"),
        posexplode(arrays_zip(col("w"), col("cuts"))).as(Seq("pos0", "z")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        col("z.w").as("tok"), col("z.cuts").as("cut"))
      .withColumn("chunk", coalesce(sum(col("cut")).over(cum), lit(0L)))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok")), " ").cast("binary")).as("fp"),
        count(lit(1)).as("n_tok"))
  }

  /** Cross-document duplicate chunks: fingerprints seen in ≥ 2 distinct
    * docs, with doc/occurrence counts — the shared-passage inventory.
    */
  def duplicateChunks(docs: DataFrame, gramN: Int = 3,
      modulus: Int = 16): DataFrame =
    chunkFingerprints(docs, gramN, modulus)
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("n_tok")).as("tok_len"))
      .filter(col("n_docs") >= 2)
}
