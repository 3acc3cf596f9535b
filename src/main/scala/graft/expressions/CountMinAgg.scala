package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer

/** Count-Min sketch buffer: `depth × width` counters plus the stream
  * length. Mutable, task-local.
  */
final class CMBuffer(size: Int) {
  var n: Long = 0L
  val table: Array[Long] = new Array[Long](size)
}

/** Shared bucket derivation for the Count-Min aggregate and its
  * DataFrame-side probe: both MUST compute identical row indices or the
  * estimates are garbage, so the formula lives in one place and the probe
  * ([[graft.functions.TextFunctions.cmEstimate]]) replays it with stock
  * codegen'd expressions (`fnv1a64`, `pmod`, `element_at`).
  *
  * Double hashing (Kirsch–Mitzenmacher, ESA'06): row i probes bucket
  * `(b1 + i·b2) mod width` where `b1 = fnv1a64(item) mod width` and
  * `b2 = 1 + 2·(fnv1a64(item ++ "#cm2") mod width/2)`. Width is required
  * to be a power of two and the stride is forced ODD, so (a) the stride
  * is coprime to width — the d rows never collapse onto one bucket — and
  * (b) every modulus is a power of two, where unsigned-mod and signed
  * floorMod agree on the low bits: an oracle replaying the hash in
  * unsigned HUGEINT arithmetic (DuckDB) lands on bit-identical buckets.
  * All intermediates stay below `depth · width²` (≪ 2⁶³), so the
  * arithmetic is overflow-free under ANSI mode on both engines.
  */
object CountMin {
  val Salt = "#cm2"
  private val SaltBytes = Salt.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** (b1, stride) bucket seeds for an item's UTF-8 bytes. */
  def seeds(bytes: Array[Byte], width: Int): (Long, Long) = {
    val h1 = Fnv1a.hash(bytes)
    // fnv1a64(item ++ salt) continues the fold from h1 — no reallocation
    var h2 = h1
    var i = 0
    while (i < SaltBytes.length) {
      h2 = (h2 ^ (SaltBytes(i) & 0xffL)) * Fnv1a.Prime
      i += 1
    }
    (java.lang.Math.floorMod(h1, width.toLong),
      1L + 2L * java.lang.Math.floorMod(h2, width.toLong / 2L))
  }
}

/** Mergeable Count-Min sketch aggregate (Cormode & Muthukrishnan, J.
  * Algorithms 2005): a `depth × width` table of counters where each item
  * increments one counter per row; the point estimate for an item is the
  * MIN over its d counters. Guarantees (deterministic given the hash
  * family): `est ≥ exact` always, and `est ≤ exact + ε·n` with
  * probability ≥ 1 − (1/(w·ε))^d per probe — the frequency-table
  * question at 100 TB in `depth·width` longs per mapper (80 KB at the
  * default 5×2048), with NO dependence on key cardinality: where
  * Misra-Gries ([[FreqItemsAgg]]) keeps the top-k identities, Count-Min
  * answers point queries for ANY later-chosen key from the stored table.
  *
  * merge is element-wise addition — associative, commutative, and
  * EXACTLY order-invariant (unlike MG's trim, the merged table is
  * bit-identical under any partitioning; spec-pinned), which also makes
  * the sketch a safe streaming accumulator.
  *
  * Returns `struct<n: bigint, table: array<bigint>>` (row-major,
  * `table[i·width + b]` = row i bucket b). Probe with
  * [[graft.functions.TextFunctions.cmEstimate]], which replays
  * [[CountMin.seeds]] with codegen'd stock expressions.
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CMBuffer] {
  require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
  require(width >= 2 && width <= (1 << 22) && (width & (width - 1)) == 0,
    s"width must be a power of two in [2, 2^22]: $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("table", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "countmin_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): CMBuffer = new CMBuffer(depth * width)

  override def update(buf: CMBuffer, input: InternalRow): CMBuffer = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v == null) return buf
    buf.n += 1L
    val (b1, b2) = CountMin.seeds(v.getBytes, width)
    var i = 0
    while (i < depth) {
      buf.table(i * width + ((b1 + i * b2) % width).toInt) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: CMBuffer, b: CMBuffer): CMBuffer = {
    a.n += b.n
    var i = 0
    while (i < a.table.length) { a.table(i) += b.table(i); i += 1 }
    a
  }

  override def eval(buf: CMBuffer): Any =
    new GenericInternalRow(Array[Any](buf.n, new GenericArrayData(buf.table)))

  override def serialize(buf: CMBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.table.length)
    bb.putLong(buf.n)
    var i = 0
    while (i < buf.table.length) { bb.putLong(buf.table(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CMBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CMBuffer(depth * width)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.table.length) { buf.table(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
