package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** misra_gries(col, k): heavy-hitter summary as a custom Catalyst
  * AGGREGATE function (TypedImperativeAggregate — the extension point for
  * stateful aggregation with map-side partial buffers and merge).
  *
  * Algorithm: Misra/Gries frequent-items summary (Misra & Gries,
  * "Finding repeated elements", Sci. Comp. Prog. 1982) with the mergeable
  * formulation of Agarwal et al., "Mergeable summaries" (PODS 2012):
  * each buffer keeps ≤ k counters; inserting an unseen item into a full
  * buffer decrements every counter by the evicted minimum; merging sums
  * counters then re-shrinks to k. Guarantees, for n total items:
  *
  *   - every item with true frequency > n/k IS in the summary;
  *   - each estimate obeys  true − n/k ≤ est ≤ true;
  *
  * and both survive arbitrary partitioning/merge order — which is exactly
  * why it distributes: constant-size state per partition, one merge tree,
  * no shuffle of raw values. The built-ins cover distinct counts (HLL)
  * and quantiles (GK); this fills the frequent-items slot of the sketch
  * toolbox.
  *
  * Returned as map<string,bigint> of surviving items → estimates. Exact
  * per-item values depend on merge order (like any MG deployment); the
  * guarantees above are order-independent and spec-asserted.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"misra_gries needs k >= 2, got $k")

  override def prettyName: String = "misra_gries"
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string column, got ${other.sql}")
  }

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long](k * 2)

  private def add(buf: java.util.HashMap[UTF8String, Long],
      key: UTF8String, c: Long): Unit = {
    val cur = buf.get(key)
    if (cur != 0L || buf.containsKey(key)) buf.put(key, cur + c)
    else {
      buf.put(key.clone(), c) // copy: eval'd keys view a reused row buffer
      if (buf.size > k) shrink(buf)
    }
  }

  /** Decrement all counters by the minimum and evict non-positives until
    * at most k survive (the classic MG eviction, batched).
    */
  private def shrink(buf: java.util.HashMap[UTF8String, Long]): Unit = {
    while (buf.size > k) {
      var min = Long.MaxValue
      val it0 = buf.values().iterator()
      while (it0.hasNext) { val v = it0.next(); if (v < min) min = v }
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - min
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
    }
  }

  override def update(buf: java.util.HashMap[UTF8String, Long],
      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[UTF8String, Long],
      other: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  def misra_gries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k)
        .toAggregateExpression())
}
