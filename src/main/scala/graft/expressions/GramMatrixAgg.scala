package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Second-moment (Gram) accumulator over an `array<double>` column — the
  * covariance-fitting primitive behind [[graft.similarity.Whitening]]: one
  * pass emits `[n, Σx (dim), upper-tri Σ x_i·x_j (dim·(dim+1)/2)]` as a flat
  * `array<double>` the driver decodes into mean + covariance.
  *
  * Why an aggregate and not an explode: pairing dimensions row-side costs
  * n·d²/2 shuffle rows (10¹² at corpus scale for d = 64) where this buffer
  * is d·(d+3)/2 + 1 doubles (~17 KB at d = 64) PER MAPPER — mergeable,
  * map-side partial, the [[VectorSumAgg]] shape widened to second moments.
  * The inner update loop is j-major over the packed upper triangle, in
  * place, no per-row allocation.
  *
  * Float-sum order varies with partition layout, so outputs are for model
  * FITTING (whitening, PCA) and invariant-form gates that round — never
  * for hash-replayed oracles (the embedDimStats lesson).
  */
case class GramMatrixAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_gram"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val buf =
      if (buffer.isEmpty) new Array[Double](1 + d + d * (d + 1) / 2) else buffer
    // uniform-dim contract like VectorSumAgg: a row of a different dim than
    // the first seen contributes nothing (silently mixed dims would corrupt
    // the packed triangle layout)
    if (buf.length != 1 + d + d * (d + 1) / 2) return buf
    buf(0) += 1.0
    var i = 0
    while (i < d) { buf(1 + i) += arr.getDouble(i); i += 1 }
    var k = 1 + d
    i = 0
    while (i < d) {
      val xi = arr.getDouble(i)
      var j = i
      while (j < d) { buf(k) += xi * arr.getDouble(j); j += 1; k += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    if (a.length != b.length) return a // mixed-dim inputs: first dim wins
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
