package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Jaro–Winkler similarity, pinned BIT-EXACT to DuckDB's
  * `jaro_winkler_similarity` (verified on 20k random pairs in r9):
  *  - match window `max(0, max(|a|,|b|)/2 − 1)` — the clamp matters:
  *    the textbook unclamped window scores equal 1-char strings 0;
  *  - J = (m/|a| + m/|b| + (m−t)/m) / 3 in that left-to-right order;
  *  - Winkler boost only when J > 0.7: J + ℓ·0.1·(1−J), prefix ℓ ≤ 4.
  * Byte-wise comparison is exact for 1-byte (ASCII) text; multi-byte
  * UTF-8 compares as byte sequences, which also matches DuckDB.
  * Empty inputs: ANY empty side — including both-empty — scores 0.0,
  * matching DuckDB 1.0.0 (`jaro_winkler_similarity('','') = 0.0`,
  * verified against the oracle binary; rapidfuzz's 1.0 convention for
  * both-empty is NOT what DuckDB ships). Pinned in ExpressionParitySpec.
  */
object StringSimUtil {

  def jaroWinkler(sa: UTF8String, sb: UTF8String): Double = {
    val a = sa.getBytes; val b = sb.getBytes
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + win)
      var j = math.max(0, i - win)
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && b(j) == a(i)) { m1(i) = true; m2(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    val j0 = (m.toDouble / l1 + m.toDouble / l2 + (m - tr).toDouble / m) / 3.0
    if (j0 <= 0.7) return j0
    var l = 0
    val maxp = math.min(4, math.min(l1, l2))
    while (l < maxp && a(l) == b(l)) l += 1
    j0 + l * 0.1 * (1.0 - j0)
  }
}

/** `jaro_winkler(left, right)` as a codegen'd scalar — Spark has no
  * builtin; a UDF would box every row. Null-safe, one static call per row.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs two strings, got ${left.dataType} and ${right.dataType}")
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimUtil.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) =>
      s"${ev.value} = graft.expressions.StringSimUtil.jaroWinkler($c1, $c2);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
