package graft

import org.apache.spark.sql.DataFrame

/** Generation-bounded caching for lazy query definitions.
  *
  * A `QueryDef` returns a lazy plan, so a bare `.cache()` inside one can
  * never be unpersisted by the query itself — every invocation leaks one
  * more cached copy into the shared session (the q7_profile_table leak
  * class: the CacheManager entry then competes with every later query's
  * memory). `replace(key, df)` keeps AT MOST ONE live generation per key:
  * the previous holder is unpersisted (its consumers have finished — a
  * registry runs queries to completion before the next invocation) before
  * the new plan is cached.
  *
  * Unpersist-then-cache ordering matters: Spark's CacheManager matches by
  * logical plan, so re-invoking the same query re-caches the same plan —
  * caching first and unpersisting the old handle second would drop the
  * entry the new handle just deduplicated onto.
  *
  * At 100 TB the discipline is the same but the decision is sharper: only
  * intermediates that are (a) reused within one job and (b) far smaller
  * than their input earn a cache; anything input-sized gets recomputed or
  * checkpointed to storage instead. Callers document that choice at the
  * call site.
  */
object ScopedCache {
  private val live =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Cache `df` under `key`, unpersisting the key's previous generation.
    *
    * Same-plan re-invocations (the common case: the same query re-run on
    * the same fixture) return the LIVE previous generation instead of
    * replacing it — canonicalized-plan equality, the same match the
    * CacheManager uses — so repeats still hit the cache; only a genuinely
    * different plan (new fixture dir, changed query) pays a rebuild.
    */
  def replace(key: String, df: DataFrame): DataFrame = {
    val prev = live.get(key)
    if (prev != null &&
        prev.queryExecution.analyzed.canonicalized ==
          df.queryExecution.analyzed.canonicalized) {
      prev
    } else {
      if (prev != null) prev.unpersist(blocking = false)
      val c = df.cache()
      live.put(key, c)
      c
    }
  }

  /** Number of live cached generations (spec hook). */
  private[graft] def liveCount: Int = live.size()

  /** Drop every live generation (spec hook / session teardown). */
  def clear(): Unit = {
    live.values.forEach(_.unpersist(false))
    live.clear()
  }
}
