package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-set aggregate (Apache DataSketches theta family —
  * the KMV/theta construction of Dasgupta, Lang et al.): like HLL it
  * estimates a group's distinct count from a bounded register set, but the
  * sketch retains SET STRUCTURE — serialized sketches compose under
  * union, INTERSECTION, and difference, answering "distinct users who did
  * A and B" from two stored 4 KB sketches where HLL can only union. The
  * buffer is a DataSketches `Union` (register-wise θ/hash-set merge:
  * associative, commutative, idempotent — layout-independent), shuffled as
  * the compact ordered byte image. Accepts long/int or string inputs.
  *
  * Scale shape: each mapper ships ≤ 2^lgK 8-byte hashes regardless of
  * input size (partial aggregation applies); set algebra over the emitted
  * binaries is driver-side arithmetic on KBs ([[thetaEstimate]] /
  * [[thetaIntersect]]). lgK = 12 → relative standard error ≈ 1/√2¹² ≈
  * 1.6% in estimation mode; below 2^lgK distinct values the sketch is
  * EXACT. Intersection error grows as overlap shrinks (error is relative
  * to the UNION's θ), so gates use generous bands, not value equality.
  */
case class ThetaSketchAgg(child: Expression, lgK: Int = 12,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {
  require(lgK >= 4 && lgK <= 26, s"lgK out of DataSketches range: $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long/int/string column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case StringType  => buf.update(v.asInstanceOf[UTF8String].toString)
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult())
    a
  }

  // compact ORDERED image: canonical bytes for a given retained-hash set,
  // so downstream consumers may hash/compare the binaries
  override def eval(buf: Union): Any = buf.getResult().toByteArray()

  override def serialize(buf: Union): Array[Byte] = buf.getResult().toByteArray()

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Driver-side set algebra over serialized theta sketches (KB-sized compact
  * images — this is arithmetic, not a distributed step).
  */
object ThetaOps {
  def estimate(sketch: Array[Byte]): Double =
    Sketches.wrapSketch(Memory.wrap(sketch)).getEstimate

  /** Estimated |A ∩ B ∩ …| over the serialized sketches. */
  def intersect(sketches: Seq[Array[Byte]]): Double = {
    require(sketches.nonEmpty, "intersect needs at least one sketch")
    val ix = SetOperation.builder().buildIntersection()
    sketches.foreach(b => ix.intersect(Sketches.wrapSketch(Memory.wrap(b))))
    ix.getResult().getEstimate
  }
}
