package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - `bruteForceKnn`: exact cosine top-k of probes × corpus. Correct
  *     baseline; O(|probes|·|corpus|) — only for bounded probe sets.
  *   - `lshKnn`: sign-random-projection buckets (the IVF-style scale
  *     path): corpus is hashed once into 2^p buckets on the sign pattern
  *     of p leading dimensions; probes only scan their own bucket. At
  *     100 TB the bucketed corpus is written bucketBy(bucket) so probe
  *     lookups are partition-pruned scans, no shuffle of the corpus.
  *
  * Embeddings are cast to double before arithmetic: float accumulation
  * is not associative enough for cross-engine reproducibility.
  */
object Similarity {

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  /** Exact top-k neighbors per probe (cosine, self excluded, deterministic
    * vec_id tiebreak on the 6-decimal-rounded similarity).
    */
  def bruteForceKnn(
      probes: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
    val c = corpus.select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
    val sims = p.join(c, col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        round(graft.plans.VectorFunctions.cosine_sim(col("pv"), col("cv")), 6).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    sims.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Sign-random-projection bucket id: p-bit pattern of leading-dimension
    * signs. With learned centroids this becomes IVF; sign-of-dimension is
    * the deterministic, model-free variant.
    */
  def srpBucket(vec: org.apache.spark.sql.Column, p: Int): org.apache.spark.sql.Column =
    (0 until p).map { i =>
      when(element_at(vec, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Bucketed ANN: probes scan only their own SRP bucket. Recall < 1 by
    * construction; raise p for smaller buckets, lower it for recall.
    */
  def lshKnn(
      probes: DataFrame,
      corpus: DataFrame,
      k: Int,
      p: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val pr = probes.select(col(idCol).as("probe_id"),
      asDouble(col(vecCol)).as("pv"), srpBucket(col(vecCol), p).as("bucket"))
    val cp = corpus.select(col(idCol).as("cand_id"),
      asDouble(col(vecCol)).as("cv"), srpBucket(col(vecCol), p).as("bucket"))
    val sims = pr.join(cp, Seq("bucket"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        round(graft.plans.VectorFunctions.cosine_sim(col("pv"), col("cv")), 6).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    sims.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
