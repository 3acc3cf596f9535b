package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer

/** Misra-Gries heavy-hitters buffer: at most `k` counters plus the number
  * of items processed. Mutable, task-local.
  */
final class MGBuffer {
  val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
  var n: Long = 0L
}

/** Space-bounded frequent-items aggregate (Misra-Gries summary, merged per
  * Agarwal et al., "Mergeable Summaries", PODS'12): at most `k` counters
  * per buffer, ever — each mapper ships ≤ k (item, count) pairs into the
  * shuffle no matter how large its input or vocabulary. The estimates are
  * UNDERCOUNTS with error ≤ n/(k+1) (n = total items aggregated), and every
  * item with true frequency > n/(k+1) is guaranteed present — the vocab /
  * hot-n-gram question at 100 TB without a full-vocabulary census shuffle
  * (word n-gram vocabularies grow into the billions; an exact census
  * shuffles all of it, this ships k rows per mapper).
  *
  * update: present → +1; room → insert 1; full → decrement ALL counters by
  * one, dropping zeros (amortized O(1): each decrement event cancels k+1
  * prior increments). merge: add counts, then subtract the (k+1)-th largest
  * value and drop non-positives — the standard mergeable-summaries trim that
  * preserves both guarantees under ANY merge order (which is why a
  * nondeterministic reduce order still yields contract-true results; the
  * exact estimates may vary, the guarantees cannot).
  *
  * Returns `array<struct<item, est>>` sorted (est DESC, item ASC). Because
  * the non-guaranteed TAIL of the summary is merge-order-dependent, an
  * engine-stable consumer must filter to items whose exact count clears the
  * n/(k+1) bar (see `q_heavy_hitters`, which joins back to exact counts and
  * asserts the error contract itself).
  */
case class FreqItemsAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_items_mg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v == null) return buf
    buf.n += 1
    val cur = buf.counts.get(v)
    if (cur != null) {
      buf.counts.put(v, cur + 1L)
    } else if (buf.counts.size < k) {
      // eval may return a pointer into a reused row buffer — detach it
      buf.counts.put(v.clone(), 1L)
    } else {
      // decrement-all: the arriving item's single count cancels against it
      val it = buf.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - 1L
        if (nv == 0L) it.remove() else e.setValue(nv)
      }
    }
    buf
  }

  override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
    a.n += b.n
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.counts.get(e.getKey)
      a.counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    val s = a.counts.size
    if (s > k) {
      val vals = new Array[Long](s)
      var i = 0
      val vi = a.counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val m = vals(s - 1 - k) // the (k+1)-th largest
      val ei = a.counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - m
        if (nv <= 0L) ei.remove() else e.setValue(nv)
      }
    }
    a
  }

  override def eval(buf: MGBuffer): Any = {
    val entries = buf.counts.entrySet()
      .toArray(new Array[java.util.Map.Entry[UTF8String, java.lang.Long]](0))
    java.util.Arrays.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[UTF8String, java.lang.Long]] {
        override def compare(x: java.util.Map.Entry[UTF8String, java.lang.Long],
                             y: java.util.Map.Entry[UTF8String, java.lang.Long]): Int = {
          val c = java.lang.Long.compare(y.getValue, x.getValue)
          if (c != 0) c else x.getKey.compareTo(y.getKey)
        }
      })
    new GenericArrayData(entries.map(e =>
      new GenericInternalRow(Array[Any](e.getKey, e.getValue.longValue())): Any))
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    var total = 8 + 4
    val it0 = buf.counts.keySet().iterator()
    while (it0.hasNext) total += 4 + it0.next().numBytes() + 8
    val bb = ByteBuffer.allocate(total)
    bb.putLong(buf.n)
    bb.putInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MGBuffer
    buf.n = bb.getLong
    val size = bb.getInt
    var i = 0
    while (i < size) {
      val len = bb.getInt
      val chunk = new Array[Byte](len)
      bb.get(chunk)
      buf.counts.put(UTF8String.fromBytes(chunk), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
