package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Bounded top-k-rows aggregate: keeps the `k` SMALLEST `ord` structs seen
  * (encode a descending field by negating it) and returns their `payload`
  * structs in ascending `ord` order.
  *
  * Why it matters at 100 TB — stated at its real size (measured, see the
  * README skew probe): Spark 4's own `InferWindowGroupLimit` already
  * rescues the literal `row_number() <= k`-filter-above-window pattern by
  * inserting a partial `WindowGroupLimit` before the exchange, so for THAT
  * exact shape the window also forwards ≤ k rows/key/mapper. What this
  * aggregate still buys: (a) no map-side sort — `WindowGroupLimit` sits on
  * a full local sort of every input row (O(n log n) per mapper) where the
  * heap admits in O(n log k) and rejected rows allocate nothing; (b) one
  * PACKED record per (mapper, key) through the shuffle vs k loose rows
  * (measured 5× fewer records at k=5); (c) robustness under composition —
  * the optimizer rule fires only on the verbatim rank-filter pattern, and
  * any variation (rank consumed in an expression, a second window function,
  * composition before the filter) silently reverts the window plan to
  * full-shuffle + hot-key single-task sort, while this aggregate's bounded
  * contract is structural. As a `TypedImperativeAggregate` it
  * partial-aggregates, so each mapper sends AT MOST k rows per group into
  * the shuffle and no task ever sorts a whole hot key.
  * The buffer is a bounded binary heap with the WORST element at the head
  * (O(log k) admission/eviction), and the admission test runs before any
  * copy, so rejected rows — the overwhelming majority once the heap warms
  * up — allocate nothing. Serialization is length-prefixed UnsafeRow bytes.
  *
  * Ordering over `ord` is Catalyst's interpreted struct ordering (field by
  * field, ascending, nulls first) — include a tiebreak field that makes
  * rows unique when deterministic output is required.
  */
case class TopKStructsAgg(ord: Expression, payload: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(InternalRow, InternalRow)]] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(ord, payload)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = false)
  override def prettyName: String = "top_k_rows"

  override def checkInputDataTypes(): TypeCheckResult = (ord.dataType, payload.dataType) match {
    case (o: StructType, _: StructType)
      if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(o) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an orderable struct ord and a struct payload, got " +
        s"${ord.dataType.simpleString} / ${payload.dataType.simpleString}")
  }

  private def ordFields = ord.dataType.asInstanceOf[StructType].length
  private def payFields = payload.dataType.asInstanceOf[StructType].length

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(ord.dataType)
  // worst (largest) element at the head so eviction is poll()
  @transient private lazy val cmp =
    new java.util.Comparator[(InternalRow, InternalRow)] {
      override def compare(a: (InternalRow, InternalRow),
                           b: (InternalRow, InternalRow)): Int =
        ordering.compare(b._1, a._1)
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[(InternalRow, InternalRow)] =
    new java.util.PriorityQueue[(InternalRow, InternalRow)](k + 1, cmp)

  private def offer(buf: java.util.PriorityQueue[(InternalRow, InternalRow)],
                    o: InternalRow, p: InternalRow): Unit = {
    if (buf.size < k) { buf.offer((o, p)); () }
    else if (ordering.compare(o, buf.peek()._1) < 0) { buf.poll(); buf.offer((o, p)); () }
  }

  override def update(buf: java.util.PriorityQueue[(InternalRow, InternalRow)],
                      input: InternalRow): java.util.PriorityQueue[(InternalRow, InternalRow)] = {
    val o = ord.eval(input).asInstanceOf[InternalRow]
    if (o == null) return buf
    // admission test BEFORE copying: a rejected row allocates nothing
    if (buf.size >= k && ordering.compare(o, buf.peek()._1) >= 0) return buf
    val p = payload.eval(input).asInstanceOf[InternalRow]
    // skip null payloads like null ords: dataType declares containsNull=false
    // and serialize() projects through payload.dataType's field count, so a
    // stored InternalRow.empty would throw at partial-agg serialization
    // (reachable via the registered SQL function, not the typed API)
    if (p == null) return buf
    offer(buf, o.copy(), p.copy())
    buf
  }

  override def merge(a: java.util.PriorityQueue[(InternalRow, InternalRow)],
                     b: java.util.PriorityQueue[(InternalRow, InternalRow)]): java.util.PriorityQueue[(InternalRow, InternalRow)] = {
    val it = b.iterator()
    while (it.hasNext) { val e = it.next(); offer(a, e._1, e._2) }
    a
  }

  override def eval(buf: java.util.PriorityQueue[(InternalRow, InternalRow)]): Any = {
    val arr = buf.toArray(new Array[(InternalRow, InternalRow)](buf.size))
    java.util.Arrays.sort(arr, new java.util.Comparator[(InternalRow, InternalRow)] {
      override def compare(x: (InternalRow, InternalRow),
                           y: (InternalRow, InternalRow)): Int =
        ordering.compare(x._1, y._1)
    })
    new GenericArrayData(arr.map(_._2.asInstanceOf[Any]))
  }

  @transient private lazy val pairProj = UnsafeProjection.create(
    StructType(Seq(StructField("o", ord.dataType), StructField("p", payload.dataType))))

  override def serialize(buf: java.util.PriorityQueue[(InternalRow, InternalRow)]): Array[Byte] = {
    val pairRow = new GenericInternalRow(2)
    val chunks = new scala.collection.mutable.ArrayBuffer[Array[Byte]](buf.size)
    var total = 4
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      pairRow.update(0, e._1)
      pairRow.update(1, e._2)
      val bytes = pairProj(pairRow).copy().getBytes
      chunks += bytes
      total += 4 + bytes.length
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(chunks.length)
    chunks.foreach { c => bb.putInt(c.length); bb.put(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(InternalRow, InternalRow)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val chunk = new Array[Byte](len)
      bb.get(chunk)
      val row = new UnsafeRow(2)
      row.pointTo(chunk, len)
      // copy() detaches the structs from the backing chunk before reuse
      buf.offer((row.getStruct(0, ordFields).copy(), row.getStruct(1, payFields).copy()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), payload = newChildren(1))
}
