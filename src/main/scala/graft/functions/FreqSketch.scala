package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Minimal primitive long→long open-addressing hash map (linear
  * probing, power-of-2 capacity, occupancy flags) — the Misra–Gries
  * buffer's hot store. A JDK HashMap boxes every key and value on the
  * update path that runs ONCE PER INPUT ROW (t12 streams millions of
  * token hashes through it), and distinguishing "absent" from "maps to
  * 0" needed a fragile null-unboxing idiom; this probe is
  * allocation-free and absence is the occupancy flag. There is no
  * remove(): the only shrink the sketch performs is the decrement
  * sweep, which is already O(capacity), so [[decrementAll]] rebuilds
  * into fresh arrays and open-addressing tombstones never exist.
  */
private[graft] final class LongLongOpenMap(capacityHint: Int) {
  private def nextPow2(x: Int): Int = {
    var c = 16
    while (c < x) c <<= 1
    c
  }
  // load factor <= 0.5: start at 2x the hint, grow doubles
  private var cap = nextPow2(math.max(16, capacityHint * 2))
  private var ks = new Array[Long](cap)
  private var vs = new Array[Long](cap)
  private var occ = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  /** splitmix64-style finalizer so sequential/low-entropy keys still
    * spread across slots.
    */
  private def slotOf(k: Long): Int = {
    var h = k * 0x9E3779B97F4A7C15L
    h ^= h >>> 32
    var i = (h & (cap - 1)).toInt
    while (occ(i) && ks(i) != k) i = (i + 1) & (cap - 1)
    i // the key's slot, or the first empty slot on its probe path
  }

  def contains(k: Long): Boolean = occ(slotOf(k))

  def get(k: Long, default: Long): Long = {
    val i = slotOf(k)
    if (occ(i)) vs(i) else default
  }

  /** counts(k) += by, inserting at `by` when absent. */
  def addTo(k: Long, by: Long): Unit = {
    val i = slotOf(k)
    if (occ(i)) { vs(i) += by; return }
    occ(i) = true; ks(i) = k; vs(i) = by; n += 1
    if (n * 2 > cap) grow()
  }

  def minValue(): Long = {
    var m = Long.MaxValue
    var j = 0
    while (j < cap) { if (occ(j) && vs(j) < m) m = vs(j); j += 1 }
    m
  }

  /** Subtract `dec` from every counter and drop non-positive results,
    * rebuilding the table in place (same capacity — entry count only
    * shrinks here).
    */
  def decrementAll(dec: Long): Unit = {
    val oks = ks; val ovs = vs; val oocc = occ; val ocap = cap
    ks = new Array[Long](cap); vs = new Array[Long](cap); occ = new Array[Boolean](cap)
    n = 0
    var j = 0
    while (j < ocap) {
      if (oocc(j)) {
        val nv = ovs(j) - dec
        if (nv > 0) {
          val i = slotOf(oks(j))
          occ(i) = true; ks(i) = oks(j); vs(i) = nv; n += 1
        }
      }
      j += 1
    }
  }

  private def grow(): Unit = {
    val oks = ks; val ovs = vs; val oocc = occ; val ocap = cap
    cap <<= 1
    ks = new Array[Long](cap); vs = new Array[Long](cap); occ = new Array[Boolean](cap)
    n = 0
    var j = 0
    while (j < ocap) {
      if (oocc(j)) {
        val i = slotOf(oks(j))
        occ(i) = true; ks(i) = oks(j); vs(i) = ovs(j); n += 1
      }
      j += 1
    }
  }

  def foreachEntry(f: (Long, Long) => Unit): Unit = {
    var j = 0
    while (j < cap) { if (occ(j)) f(ks(j), vs(j)); j += 1 }
  }

  def keysArray: Array[Long] = {
    val out = new Array[Long](n)
    var i = 0
    foreachEntry((k, _) => { out(i) = k; i += 1 })
    out
  }

  def valuesArray: Array[Long] = {
    val out = new Array[Long](n)
    var i = 0
    foreachEntry((_, v) => { out(i) = v; i += 1 })
    out
  }
}

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
  // transiently up to ~2k entries during mergeFrom (before the trim);
  // the map grows itself past the hint when that happens
  val counts = new LongLongOpenMap(math.min(k, 1 << 16))

  def add(key: Long, by: Long): Unit = {
    if (counts.contains(key) || counts.size < k) {
      counts.addTo(key, by)
    } else {
      // full and unseen: decrement-all by the new arrival's weight,
      // capped at the current minimum so no counter goes negative in
      // one sweep; leftovers recurse (weights here are 1 in practice)
      var remaining = by
      while (remaining > 0 && !counts.contains(key) && counts.size >= k) {
        val dec = math.min(counts.minValue(), remaining)
        counts.decrementAll(dec)
        remaining -= dec
      }
      if (remaining > 0) add(key, remaining)
    }
  }

  /** Mergeable-summaries combine: pointwise sum, then trim back to k
    * by subtracting the (k+1)-th largest counter from every entry.
    */
  def mergeFrom(other: MgBuffer): Unit = {
    other.counts.foreachEntry((key, v) => counts.addTo(key, v))
    if (counts.size > k) {
      val vals = counts.valuesArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      counts.decrementAll(cut)
    }
  }

  /** Surviving candidate keys, sorted for a deterministic layout. */
  def keysSorted: Array[Long] = {
    val out = counts.keysArray
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
    buf.counts.foreachEntry { (key, cnt) =>
      bb.putLong(key)
      bb.putLong(cnt)
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
      buf.counts.addTo(key, cnt)
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
