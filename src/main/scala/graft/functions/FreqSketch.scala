package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary over a BIGINT key stream:
  * bounded state of at most k (key, counter) pairs per aggregation
  * buffer, with the mergeable-summaries combine (sum counters, then
  * subtract the (k+1)-th largest and drop non-positive) that preserves
  * the deterministic guarantee regardless of partitioning or merge
  * order: every key with true frequency > n/(k+1) is present in the
  * final summary. The counters themselves DO depend on arrival order,
  * so callers must treat the output as a candidate SUPERSET and
  * re-count exactly (see TextOps t12) — which is why eval() returns
  * only the keys.
  *
  * Scale shape: per-partition state is ≤ k longs×2 however many rows
  * stream through; the exchange carries one ≤k-entry summary per
  * partition. The decrement sweep is O(k) but fires at most n/k times
  * per buffer (each sweep burns k units of total count), so updates
  * stay amortized O(1).
  */
private[graft] final class MgBuffer(val k: Int) {
  // plain open-addressing long->long map would be ideal; a JDK map is
  // fine at k ≤ 8192 (bounded, rehash-free after warmup)
  val counts = new java.util.HashMap[Long, Long](k * 2)

  def add(key: Long, by: Long): Unit = {
    val cur = counts.get(key)
    if (cur != 0L || counts.containsKey(key)) {
      counts.put(key, cur + by)
    } else if (counts.size < k) {
      counts.put(key, by)
    } else {
      // full and unseen: decrement-all by the new arrival's weight,
      // capped at the current minimum so no counter goes negative in
      // one sweep; leftovers recurse (weights here are 1 in practice)
      var remaining = by
      while (remaining > 0 && !counts.containsKey(key) && counts.size >= k) {
        var min = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) min = math.min(min, it0.next())
        val dec = math.min(min, remaining)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - dec
          if (nv <= 0) it.remove() else e.setValue(nv)
        }
        remaining -= dec
      }
      if (remaining > 0) add(key, remaining)
    }
  }

  /** Mergeable-summaries combine: pointwise sum, then trim back to k
    * by subtracting the (k+1)-th largest counter from every entry.
    */
  def mergeFrom(other: MgBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - cut
        if (nv <= 0) ei.remove() else e.setValue(nv)
      }
    }
  }

  /** Surviving candidate keys, sorted for a deterministic layout. */
  def keysSorted: Array[Long] = {
    val out = new Array[Long](counts.size)
    var i = 0
    val it = counts.keySet().iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    out
  }
}

case class MisraGriesKeys(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  require(k > 0 && k <= 65536, s"misra_gries_keys: k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"misra_gries_keys expects bigint, got ${t.catalogString}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MgBuffer): Any =
    new GenericArrayData(buf.keysSorted.map(v => v: Any))

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * buf.counts.size)
    bb.putInt(buf.k)
    bb.putInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val bufK = bb.getInt
    val n = bb.getInt
    val buf = new MgBuffer(bufK)
    var i = 0
    while (i < n) {
      val key = bb.getLong
      val cnt = bb.getLong
      buf.counts.put(key, cnt)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesKeys =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesKeys =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def prettyName: String = "misra_gries_keys"
}

object FreqSketch {
  /** Candidate frequent keys (guaranteed superset of every key with
    * frequency > n/(k+1)) as a sorted BIGINT array column.
    */
  def misraGriesKeys(key: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesKeys(ColumnBridge.expression(key), k).toAggregateExpression())
}
