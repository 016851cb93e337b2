package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** Package-placement shim for the one `private[sql]` seam a v1 streaming
  * Source needs: `getBatch` must return a frame whose logical plan is
  * flagged `isStreaming = true` (the stream executor asserts it), and
  * the only constructor for such a frame over an arbitrary batch plan is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * `private[sql]`, so third-party sources (this is the long-standing
  * recipe OSS connectors use) expose it from a class under
  * `org.apache.spark.sql`. Nothing else private is touched.
  */
object StreamingFrames {
  /** Re-wrap a batch-built frame as a streaming one over its own
    * InternalRow RDD (execution is unchanged and stays lazy — `toRdd`
    * is a plan handle, not a materialization).
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The mirror seam for a v1 streaming SINK: `addBatch` hands the sink
    * a frame bound to the micro-batch's IncrementalExecution, which
    * refuses batch writers — re-wrap it over its own InternalRow RDD as
    * a plain batch frame (the same recipe transactional-format sinks
    * use). Lazy; the batch executes once, when the sink's commit writes.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
