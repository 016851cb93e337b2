package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager one-shot materialization for frames that serve BOTH a driver
  * census (a bounded count/size probe) and a downstream join — the LM
  * scorer's count tables and the decontaminator's flagged-id set.
  *
  * Strategy, in order of preference:
  *   - reliable `checkpoint(eager = true)` when the session has a
  *     checkpoint directory configured: blocks land on shared storage and
  *     survive executor loss / dynamic deallocation. At-scale runs should
  *     always `sparkContext.setCheckpointDir(...)` so these operators
  *     recover instead of failing the job.
  *   - `localCheckpoint(eager = true)` otherwise (local / test runs): it
  *     materializes through normal AQE execution and its blocks are
  *     ContextCleaner-released once the frame is unreferenced — but the
  *     blocks live on executors only, so a lost executor fails the query
  *     (lineage is truncated, nothing can recompute).
  *
  * Deliberately NOT `persist(MEMORY_AND_DISK)`: the cache fill compiles
  * without AQE (`canChangeCachedPlanOutputPartitioning` defaults false —
  * measured 2× slower on skew-sensitive plans in this repo), and
  * CacheManager pins a persisted frame for the whole session once it is
  * returned to a caller (no unpersist hook after the operator returns).
  *
  * Callers of either checkpoint flavor are EAGER: constructing the
  * returned DataFrame runs a Spark job. Operators built on this helper
  * (`Text.lmScores`, `Decontaminate.clean`, the dedup closure) document
  * that construction-time cost in their own scaladoc.
  */
object Materialize {
  def stable(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)
}
