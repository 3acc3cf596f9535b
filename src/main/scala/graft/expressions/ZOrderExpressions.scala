package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Z-order (Morton) bit interleave of two long dimensions.
  *
  * `z = Σ_{i<bits} ((x>>i & 1) << 2i) | ((y>>i & 1) << (2i+1))` over the low
  * `bits` bits of each input — the space-filling-curve clustering key behind
  * multi-dimensional data layout: range-partitioning a table by `z` and
  * writing files in that order gives every file a narrow min/max zone map in
  * BOTH dimensions simultaneously, so predicates on either column skip
  * files (a linear sort bounds only its leading column). The curve key is a
  * scan-side scalar — layout never needs a second pass over the data.
  *
  * Interleaving is a per-row bit shuffle with no data dependence, so it
  * stays inside whole-stage codegen as a tight loop; 2·bits ≤ 64 keeps the
  * result a single long. [[graft.sources.Tables.zorder2]] is the fused
  * shift/mask-ladder formulation of the SAME key fixed at 32 bits
  * (spec-pinned equal); this expression adds the parametric bit count the
  * range-id construction wants and a single scalar node that boundary-shard
  * comparisons can reference.
  */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 32, s"bits must be in [1, 32]: $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val z = ctx.freshName("z")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >>> $i) & 1L) << (2 * $i);
         |  $z |= (($b >>> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
