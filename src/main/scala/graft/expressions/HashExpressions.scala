package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native MinHash signature over an `array<string>` shingle set.
  *
  * Semantics identical to the HOF formulation in
  * [[graft.dedup.Dedup.minhashSignature]]'s original form:
  * `sig[j] = min over shingles s of (a_j * (xxhash64(s) mod p) + b_j) mod p`
  * with p = 2^31-1 and coefficients < 2^31 (so `a*h + b < 2^63`, no
  * overflow). The HOF version (`aggregate` + `zip_with`) interprets a lambda
  * and allocates a 128-element array per shingle; this compiles to a tight
  * `|shingles| × numHashes` primitive loop in whole-stage codegen.
  */
case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  private val p = 2147483647L // 2^31 - 1, prime
  private val numHashes = as.length
  require(bs.length == numHashes, "as/bs length mismatch")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val raw = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val h = ((raw % p) + p) % p
        var j = 0
        while (j < numHashes) {
          val v = (as(j) * h + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $c.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    $h = (($h % ${p}L) + ${p}L) % ${p}L;
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $v = ($asRef[$j] * $h + $bsRef[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 64-bit SimHash over an `array<string>` token column: each token's
  * xxhash64 votes ±1 per bit position; the sign vector packs MSB-first
  * (bit 63 of the hash → bit 63 of the result, matching the original HOF
  * `aggregate(reverse(votes))` packing). One `|tokens| × 64` primitive loop
  * in codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var k = 0
        while (k < 64) { votes(k) += ((h >>> k) & 1L) * 2L - 1L; k += 1 }
      }
      i += 1
    }
    var packed = 0L
    var k = 63
    while (k >= 0) { packed = (packed << 1) | (if (votes(k) >= 0) 1L else 0L); k -= 1 }
    packed
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val packed = ctx.freshName("packed")
      s"""
         |final int $n = $c.numElements();
         |final long[] $votes = new long[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $k = 0; $k < 64; $k++) {
         |      $votes[$k] += (($h >>> $k) & 1L) * 2L - 1L;
         |    }
         |  }
         |}
         |long $packed = 0L;
         |for (int $k = 63; $k >= 0; $k--) {
         |  $packed = ($packed << 1) | ($votes[$k] >= 0 ? 1L : 0L);
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
