package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Shard id of a composite sort key against frozen range boundaries —
  * `|{b ∈ boundaries : b <lex key}|` under ascending NULLS FIRST
  * lexicographic order (null < any value; equal fields descend to the next),
  * found by BINARY SEARCH over the ascending boundary table.
  *
  * This replaces the previous Column-tree formulation (a sum of B nested
  * `(k > l) || ((k <=> l) && …)` terms) whose cost was O(B·K) re-evaluated
  * comparisons per row AND whose generated code grew with B — measured on
  * q_zorder_layout (B = 31, K = 3, with a z-order key the optimizer inlined
  * into every term): 28 CPU-seconds for a 600k-row pass, dominated by the
  * expression itself. Here the key expressions are evaluated ONCE as
  * ordinary children, the per-row cost is O(K·log B), and the generated
  * code is a single bounded call — at 100 TB, where boundary counts reach
  * the thousands (B ≈ shuffle partitions), the log factor is the difference
  * between a scan-side scalar and a scan-side bottleneck.
  *
  * Monotone in the key order by construction (a count of an ascending
  * prefix), so equal sort keys always land in the same shard and shard id
  * order equals key order — the two invariants [[graft.operators.RangeShard]]
  * consumers (two-pass global ranking / budgeted packing) rely on. The
  * previous formulation treated a null on ONE side of a field comparison as
  * "not greater, stop" (so null-valued boundaries were invisible to non-null
  * keys); this expression uses true nulls-first order instead — both are
  * monotone, so consumers (shard-invariant, spec-pinned) see identical
  * results; the boundary semantics are now also exactly the sample sort's.
  *
  * `boundaries` hold CATALYST values (UTF8String, Decimal, …) row-major;
  * orderings are rebuilt per JVM from `keyTypes` (they are not serializable).
  */
case class RangeShardId(children: Seq[Expression],
                        boundaries: IndexedSeq[IndexedSeq[Any]],
                        keyTypes: Seq[DataType])
    extends Expression {

  require(children.nonEmpty && children.size == keyTypes.size,
    "RangeShardId: one key type per key expression required")
  require(boundaries.forall(_.size == children.size),
    "RangeShardId: every boundary row must have one value per key")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "range_shard_id"

  @transient private lazy val ords: Array[Ordering[Any]] =
    keyTypes.map(TypeUtils.getInterpretedOrdering).toArray

  /** Lexicographic boundary-vs-key compare, ascending nulls first. */
  private def cmpBound(b: IndexedSeq[Any], key: Array[Any]): Int = {
    var i = 0
    while (i < key.length) {
      val bv = b(i); val kv = key(i)
      val c =
        if (bv == null && kv == null) 0
        else if (bv == null) -1
        else if (kv == null) 1
        else ords(i).compare(bv, kv)
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Binary search: first boundary index NOT strictly below `key` = the
    * count of boundaries strictly below it = the shard id.
    */
  def shardIdOf(key: Array[Any]): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmpBound(boundaries(mid), key) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def eval(input: InternalRow): Any = {
    val key = new Array[Any](children.size)
    var i = 0
    while (i < key.length) {
      key(i) = children(i).eval(input)
      i += 1
    }
    shardIdOf(key)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rangeShard", this, classOf[RangeShardId].getName)
    val arr = ctx.freshName("shardKey")
    val evals = children.map(_.genCode(ctx))
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |${e.code}
         |$arr[$i] = ${e.isNull} ? null : (Object) ${e.value};
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |Object[] $arr = new Object[${children.size}];
        |$fill
        |final int ${ev.value} = $ref.shardIdOf($arr);
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
