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

  /** Fitted-centroid cache: IVF is train-once-probe-many, so repeated
    * probe queries within a session skip the k-means fit. BOUNDED
    * (access-ordered LRU, `KmeansCacheMax` entries) so a long-lived
    * service can't leak models, with an explicit `clearKmeansCache()`
    * mirroring `RewriteToMaterialized`'s registry discipline. Access is
    * synchronized; fits run OUTSIDE the lock (a duplicate concurrent fit
    * is benign — seed-fixed k-means is deterministic, last put wins).
    */
  private[graft] val KmeansCacheMax = 16
  private[graft] val kmeansCache =
    new java.util.LinkedHashMap[String, org.apache.spark.ml.clustering.KMeansModel](
      KmeansCacheMax, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, org.apache.spark.ml.clustering.KMeansModel]): Boolean =
        size() > KmeansCacheMax
    }
  private[graft] def kmeansCacheSize: Int =
    kmeansCache.synchronized(kmeansCache.size())
  def clearKmeansCache(): Unit = kmeansCache.synchronized(kmeansCache.clear())

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  /** Coarse quantizer fit, cached per (corpus plan, nCells) — index
    * build is train-once-probe-many (seed fixed → deterministic). The
    * fit runs on a deterministic 1-in-4 sample: IVF centroids only need
    * the corpus's density shape, not every vector (at 100 TB you'd never
    * fit on the full corpus); cell ASSIGNMENT still covers all vectors.
    */
  private def fitCoarseModel(corpus: DataFrame, withVec: DataFrame,
      nCells: Int): org.apache.spark.ml.clustering.KMeansModel = {
    import org.apache.spark.ml.clustering.KMeans
    val cacheKey =
      s"${corpus.queryExecution.analyzed.semanticHash()}:$nCells"
    kmeansCache.synchronized(Option(kmeansCache.get(cacheKey)))
      .getOrElse {
        val sample = withVec.filter(pmod(col("cand_id"), lit(4)) === 0)
        val m = new KMeans().setK(nCells).setSeed(42).setFeaturesCol("fv")
          .fit(sample)
        kmeansCache.synchronized(kmeansCache.put(cacheKey, m))
        m
      }
  }

  /** Per-probe ranked cell list of the coarse quantizer, computed
    * DISTRIBUTED: the centroid table is tiny (nCells × dim doubles) so
    * it ships to every task as a literal array; assignment is a map-only
    * projection — no shuffle, no driver collect, any probe-table size.
    * Distance accumulates element-wise left-to-right (zip_with +
    * aggregate), deterministic; ties break on the lower cell id.
    */
  private def nearestCells(
      model: org.apache.spark.ml.clustering.KMeansModel,
      pv: org.apache.spark.sql.Column,
      nProbe: Int): org.apache.spark.sql.Column = {
    val centLit = array(model.clusterCenters.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cell"),
        array(c.toArray.toIndexedSeq.map(lit): _*).as("cv"))
    }.toIndexedSeq: _*)
    val ranked = array_sort(transform(centLit, cent =>
      struct(
        aggregate(
          zip_with(cent.getField("cv"), pv, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v).as("dist"),
        cent.getField("cell").as("cell"))))
    transform(slice(ranked, 1, nProbe), s => s.getField("cell"))
  }

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

  /** True IVF (inverted-file) ANN: k-means centroids learned over the
    * corpus; each vector is assigned to its nearest centroid's cell, and
    * probes scan `nProbe` nearest cells. At 100 TB the cell assignment is
    * the bucketing key of the stored corpus (`bucketBy(cell)`), so a probe
    * reads only its cells' files. MLlib KMeans trains on a sample; seed
    * fixed for reproducibility.
    */
  def ivfKnn(
      probes: DataFrame,
      corpus: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    val cp = corpus.select(col(idCol).as("cand_id"),
      asDouble(col(vecCol)).as("cv"))
    val withVec = cp.withColumn("fv", array_to_vector(col("cv")))
    val model = fitCoarseModel(corpus, withVec, nCells)
    val assigned = model.transform(withVec)
      .select(col("cand_id"), col("cv"), col("prediction").as("cell"))

    val pr = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
    val prWithCells = pr.withColumn("cell",
      explode(nearestCells(model, col("pv"), nProbe)))

    val sims = prWithCells.join(assigned, Seq("cell"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        round(graft.plans.VectorFunctions.cosine_sim(col("pv"), col("cv")), 6).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    sims.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic local Lloyd's k-means for codebook training: evenly
    * spaced initial centers over the (id-ordered) sample, nearest-center
    * assignment with lower-index tiebreak, fixed iteration count; an
    * empty cluster keeps its previous center. Runs on the driver over a
    * bounded sample — no RNG, no Spark jobs.
    */
  private[graft] def lloyd(points: Array[Array[Double]], k: Int,
      iters: Int = 15): Array[Array[Double]] = {
    val n = points.length
    val dim = points(0).length
    val kEff = math.min(k, n)
    val centers = Array.tabulate(kEff)(i => points((i.toLong * n / kEff).toInt).clone())
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      points.foreach { p =>
        var best = 0; var bestD = sq(p, centers(0)); var c = 1
        while (c < kEff) {
          val dd = sq(p, centers(c))
          if (dd < bestD) { best = c; bestD = dd }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      var c = 0
      while (c < kEff) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) { centers(c)(i) = sums(c)(i) / counts(c); i += 1 }
        } // empty cluster: keep the previous center
        c += 1
      }
      it += 1
    }
    centers
  }

  /** Product-quantization ANN (the PQ/ADC scheme of Jégou et al. 2011):
    * the d dims split into `m` subspaces; per subspace a `kSub`-codeword
    * codebook is learned (deterministic driver-side Lloyd on a bounded
    * id-ordered sample — the published PQ practice; see `lloyd`); every
    * corpus vector is
    * ENCODED as m small codes; a probe answers by asymmetric distance
    * (ADC) — ONE m×kSub squared-distance table per probe, then m table
    * lookups per candidate. Compression IS the speed: candidates carry
    * m codes instead of d floats (~8-30× less scan/shuffle volume) and
    * the per-pair cost is m adds instead of d multiplies. The scan stays
    * exhaustive by contract — compose with `ivfKnn`'s cells when pruning
    * is wanted too. The top `rerank` ADC hits per probe re-score with
    * exact cosine over the full vectors (a probes×rerank-sized join),
    * so the output contract matches the other sim_knn_* queries.
    *
    * Distributed shape: codebooks and the per-probe distance tables ride
    * the (tiny) probe side into a broadcast join; the candidate stream
    * projects to (cand_id, codes) before any join; the rank shuffle
    * carries (probe_id, cand_id, adist) scalars only.
    */
  /** PQ codebook training — the id-smallest 4096 of a deterministic
    * 1-in-4 slice: a BOUNDED driver collect (≤ 4096 × d doubles, ~2 MB)
    * that plans as TakeOrderedAndProject. Training PQ codebooks on a
    * capped sample is the published practice (codebooks need the density
    * shape, not every vector); the driver-side Lloyd fit on it replaces
    * m distributed KMeans pipelines — one bounded Spark job total,
    * milliseconds of local arithmetic, fully deterministic (ordered
    * sample, fixed init, fixed iteration count). Returns (subspace dim,
    * m codebooks of kSub codewords).
    */
  private def trainCodebooks(cp: DataFrame, m: Int,
      kSub: Int): (Int, Seq[Array[Array[Double]]]) = {
    // bounded probe: one row to learn d (the array length is not in the
    // schema). limit+collect instead of head() so an EMPTY corpus gets
    // the intended diagnostic rather than head's NoSuchElementException.
    val dRow = cp.select(size(col("cv")).as("d")).limit(1).collect()
    require(dRow.nonEmpty, "empty corpus: no codebook sample")
    val d = dRow(0).getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val sub = d / m
    val sliced: Array[Array[Double]] = cp
      .filter(pmod(col("cand_id"), lit(4)) === 0)
      .orderBy(col("cand_id")).limit(4096)
      .select(col("cv")).collect()
      .map(_.getSeq[Double](0).toArray)
    // A corpus whose ids never hit the 1-in-4 residue would leave the
    // slice empty even though the corpus isn't — fall back to the
    // unfiltered id-smallest sample rather than fail.
    val sample: Array[Array[Double]] =
      if (sliced.nonEmpty) sliced
      else cp.orderBy(col("cand_id")).limit(4096)
        .select(col("cv")).collect()
        .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty corpus: no codebook sample")
    (sub, (0 until m).map { j =>
      lloyd(sample.map(v =>
        java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub)), kSub)
    })
  }

  /** The per-probe ADC table — m×kSub squared distances, computed ONCE
    * per probe as a bound column (it rides the broadcast, never per
    * pair).
    */
  private def adcTable(codebooks: Seq[Array[Array[Double]]], sub: Int,
      pv: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def cbLit(j: Int) = array(codebooks(j).zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("code"),
        array(c.toIndexedSeq.map(lit): _*).as("cw"))
    }.toIndexedSeq: _*)
    def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    array(codebooks.indices.map(j =>
      transform(cbLit(j), cent =>
        sqDist(cent.getField("cw"), slice(pv, j * sub + 1, sub)))): _*)
  }

  def pqKnn(
      probes: DataFrame,
      corpus: DataFrame,
      k: Int,
      m: Int = 8,
      kSub: Int = 16,
      rerank: Int = 20,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cp = corpus.select(col(idCol).as("cand_id"),
      asDouble(col(vecCol)).as("cv"))
    val (sub, codebooks) = trainCodebooks(cp, m, kSub)

    // encode: per subspace the argmin codeword. Native codegen'd
    // expression (graft.plans.PqEncode) — arithmetic-identical to the
    // declarative `array_sort(transform(cbLit, struct(sqDist, code)))`
    // argmin (same sequential accumulation, same lowest-code tiebreak)
    // but one primitive loop per row instead of m·kSub interpreted
    // lambda frames (PqExpressionsSpec pins the equivalence).
    val cbArr: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.clone()).toArray).toArray
    val encoded = cp.select(col("cand_id"),
      graft.plans.PqFunctions.pq_encode(col("cv"), cbArr).as("codes"))

    val pr = probes.select(col(idCol).as("probe_id"),
        asDouble(col(vecCol)).as("pv"))
      .withColumn("dtab", adcTable(codebooks, sub, col("pv")))

    // ADC score: m table lookups per candidate, the probes×corpus hot
    // loop — native codegen'd adc_score (≡ `aggregate(zip_with(dtab,
    // codes, element_at), +)` bit-for-bit); project to scalars before
    // the rank shuffle
    val adist = graft.plans.PqFunctions.adc_score(col("dtab"), col("codes"))
    val wAdc = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist"), col("cand_id"))
    val shortlist = broadcast(pr).join(encoded, col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"), adist.as("adist"))
      .withColumn("ark", row_number().over(wAdc))
      .filter(col("ark") <= rerank)
      .select("probe_id", "cand_id")

    // exact re-rank of the probes×rerank shortlist
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    shortlist
      .join(pr.select(col("probe_id"), col("pv")), Seq("probe_id"))
      .join(cp, Seq("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        round(graft.plans.VectorFunctions.cosine_sim(col("pv"), col("cv")), 6).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** IVF-PQ composed ANN (the FAISS IVFPQ serving shape): the k-means
    * coarse quantizer prunes the candidate set to each probe's `nProbe`
    * nearest cells, PQ/ADC scores ONLY those candidates (m table lookups
    * each), and the top `rerank` hits re-score with exact cosine. This
    * is the 100 TB layout: cells are the stored corpus's partitioning
    * (a probe reads only its cells' files — the [[ivfKnn]] pruning leg)
    * while candidates cross the join as m byte-codes instead of d
    * floats (the [[pqKnn]] compression leg). Codebooks encode RAW
    * vectors, not residuals: residual encoding (Jégou et al. §IV.B)
    * buys accuracy at equal code budget but couples every codebook to
    * the coarse quantizer (retrain both or neither); the recall gates
    * measure this variant directly and the exact re-rank restores
    * final-order correctness either way.
    */
  def ivfPqKnn(
      probes: DataFrame,
      corpus: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      kSub: Int = 16,
      rerank: Int = 40,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val cp = corpus.select(col(idCol).as("cand_id"),
      asDouble(col(vecCol)).as("cv"))
    val withVec = cp.withColumn("fv", array_to_vector(col("cv")))
    val model = fitCoarseModel(corpus, withVec, nCells)
    val (sub, codebooks) = trainCodebooks(cp, m, kSub)
    val cbArr: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.clone()).toArray).toArray
    // the stored index: (cell, cand_id, m codes) — at rest this is the
    // cell-partitioned, 8-byte-per-vector table the probe scan reads
    val indexed = model.transform(withVec)
      .select(col("prediction").as("cell"), col("cand_id"),
        graft.plans.PqFunctions.pq_encode(col("cv"), cbArr).as("codes"))

    val pr = probes.select(col(idCol).as("probe_id"),
        asDouble(col(vecCol)).as("pv"))
      .withColumn("dtab", adcTable(codebooks, sub, col("pv")))
    // each candidate lives in exactly ONE cell, so the cell equi-join
    // cannot duplicate a (probe, cand) pair across probed cells
    val prCells = pr.withColumn("cell",
      explode(nearestCells(model, col("pv"), nProbe)))
    val adist = graft.plans.PqFunctions.adc_score(col("dtab"), col("codes"))
    val wAdc = Window.partitionBy(col("probe_id"))
      .orderBy(col("adist"), col("cand_id"))
    val shortlist = broadcast(prCells).join(indexed, Seq("cell"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"), adist.as("adist"))
      .withColumn("ark", row_number().over(wAdc))
      .filter(col("ark") <= rerank)
      .select("probe_id", "cand_id")

    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    shortlist
      .join(pr.select(col("probe_id"), col("pv")), Seq("probe_id"))
      .join(cp, Seq("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        round(graft.plans.VectorFunctions.cosine_sim(col("pv"), col("cv")), 6).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Nearest-centroid (Rocchio) label model: the per-label element-wise
    * MEAN embedding is each class's prototype; every vector is assigned
    * the label of its highest-cosine prototype. The classical centroid
    * classifier for embedding spaces — and the building block for
    * label-guided domain bucketing of a training corpus (assign every
    * document's embedding to the nearest curated-domain centroid).
    *
    * Scale design: the prototype build is posexplode → (label, pos)
    * partial-aggregated means (distributes over any corpus size; the
    * shuffle carries (label, pos, sum, count) only) → one #labels-row
    * table, which BROADCASTS to the assignment pass; assignment is a
    * map-side cross join (#labels small by contract) + the codegen'd
    * native cosine, and the per-vector argmax window sees exactly
    * #labels rows per partition key. Deterministic: 6-decimal rounding
    * with label-id tiebreak (the `sim_knn_*` convention).
    */
  def centroidAssign(
      vectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val exp = vectors
      .select(col(labelCol).as("clabel"), posexplode(asDouble(col(vecCol))))
      .groupBy("clabel", "pos").agg(avg(col("col")).as("m"))
    val cent = exp.groupBy("clabel")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cosine").desc, col("clabel"))
    vectors
      .select(col(idCol), col(labelCol), asDouble(col(vecCol)).as("pv"))
      .crossJoin(broadcast(cent))
      .withColumn("cosine",
        round(graft.plans.VectorFunctions.cosine_sim(col("pv"), col("cv")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col(idCol), col(labelCol),
        col("clabel").as("pred_label"), col("cosine"))
  }

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
