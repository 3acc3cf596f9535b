package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The hot loop of every similarity/dedup operator (cosine, hyperplane LSH
  * signatures, brute-force top-k) is a dense dot product. Spark's
  * higher-order functions (`aggregate`/`zip_with`) express it but do NOT
  * participate in whole-stage codegen — each evaluation allocates an
  * intermediate array and interprets a lambda per element. This expression
  * compiles to a tight primitive `for` loop inside WholeStageCodegen
  * (~20× over the HOF formulation on 64-dim vectors; see BENCH notes).
  *
  * Summation is strict left-to-right double accumulation — identical order
  * to the HOF version and to the DuckDB oracle's `list_sum`, so results are
  * bit-compatible.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static hot loop shared by interpreted eval and codegen of [[CosineByIds]]. */
object VectorUtil {
  /** Cosine of corpus vectors `a` and `b` addressed by id against a flat
    * replicated store (`ids` sorted ascending, `flat` row-major `n×dim`,
    * `norms` per-vector L2). Arithmetic is identical to
    * `VectorFunctions.cosinePrenormed` (left-to-right dot, `0.0` on zero
    * norms) so results match the join-based verify bit-for-bit. An unknown
    * id is a hard error: verification candidates come from the same corpus
    * the store was built from, so a miss means the store is stale — fail
    * loudly, never silently mis-score.
    */
  def cosineByIds(a: Long, b: Long, ids: Array[Long], flat: Array[Double],
                  norms: Array[Double], dim: Int): Double = {
    val i = java.util.Arrays.binarySearch(ids, a)
    val j = java.util.Arrays.binarySearch(ids, b)
    if (i < 0 || j < 0) throw new IllegalStateException(
      s"vector id ${if (i < 0) a else b} not in the replicated store (stale store?)")
    var s = 0.0
    val oi = i * dim
    val oj = j * dim
    var k = 0
    while (k < dim) { s += flat(oi + k) * flat(oj + k); k += 1 }
    val nn = norms(i) * norms(j)
    // bad-vector contract (shared with VectorFunctions.cosine, spec-pinned):
    // NaN/Inf-poisoned vectors score 0.0, never NaN — Java's `NaN > 0` is
    // already false (NaN norms → 0.0 here), but Inf/Inf slips through the
    // division as NaN, and a NaN score sorts ABOVE every real score in
    // Spark, floating corrupt pairs to the top of a descending top-k
    val c = if (nn > 0) s / nn else 0.0
    if (java.lang.Double.isNaN(c)) 0.0 else c
  }
}

/** Cosine similarity of two corpus vectors addressed BY ID against a
  * replicated flat vector store — the verification kernel for candidate-pair
  * pipelines when the corpus fits in memory (FAISS-style id → offset
  * indexing, the columnar analog of a replicated ANN index).
  *
  * Why it exists: scoring a candidate (a, b) through two broadcast hash
  * joins costs two 8·dim-byte row materializations plus probe overhead per
  * pair (~7 µs/row measured at dim 64) — 15-30× the arithmetic itself. This
  * expression makes the verify a pure projection: two binary searches into a
  * shared sorted id array and one fused dot loop (~0.3 µs/row), keeping the
  * whole candidate stage inside one WholeStageCodegen span with zero joins.
  *
  * Scale posture: the store is `n·dim` doubles replicated per executor —
  * callers gate on that product (same memory contract as a broadcast join's
  * build side, minus the row headers). Above the gate, use the join-based
  * verify.
  *
  * Fields are immutable `ArraySeq` so two instances built from the same
  * store compare structurally (Catalyst canonicalization / CSE); the
  * unwrapped primitive arrays are cached transiently for the hot path.
  */
case class CosineByIds(left: Expression, right: Expression,
                       ids: scala.collection.immutable.ArraySeq[Long],
                       flat: scala.collection.immutable.ArraySeq[Double],
                       norms: scala.collection.immutable.ArraySeq[Double],
                       dim: Int)
    extends BinaryExpression {
  require(dim > 0 && ids.length.toLong * dim == flat.length.toLong &&
    ids.length == norms.length, "replicated store layout mismatch")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_by_ids"

  @transient private lazy val idArr: Array[Long] =
    ids.unsafeArray.asInstanceOf[Array[Long]]
  @transient private lazy val flatArr: Array[Double] =
    flat.unsafeArray.asInstanceOf[Array[Double]]
  @transient private lazy val normArr: Array[Double] =
    norms.unsafeArray.asInstanceOf[Array[Double]]

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint id arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.cosineByIds(a.asInstanceOf[Long], b.asInstanceOf[Long],
      idArr, flatArr, normArr, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cosIds", idArr, "long[]")
    val flatRef = ctx.addReferenceObj("cosFlat", flatArr, "double[]")
    val normsRef = ctx.addReferenceObj("cosNorms", normArr, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VectorUtil.cosineByIds(" +
        s"$a, $b, $idsRef, $flatRef, $normsRef, $dim);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over two `array<tinyint>` quantized vectors —
  * integer multiply-accumulate in a tight codegen loop (no byte→double
  * widening per element in the plan). Returns BIGINT: 127·127·dim stays far
  * below 2^63 for any practical dim.
  */
case class DotProductInt8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_dot_i8"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<tinyint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getByte(i).toLong * y.getByte(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getByte($i) * $b.getByte($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native symmetric int8 quantization of an `array<double>` vector: ONE
  * pass computes `s = max|v| / 127` (1.0 when the max is 0 or undefined)
  * and the rounded codes, returned as `struct<scale double, q array<tinyint>>`.
  *
  * The HOF formulation (`transform(v, x -> round(x / scale))` with `scale`
  * built from `array_max(transform(v, abs))`) embeds the O(d) max reduction
  * inside the per-element lambda — O(d²) per row, measured 766 ms of a
  * 1.7 s q_ndcg on a 2000×128 corpus. Here the max is found once and the
  * quantization loop is compiled Scala behind a single generated call, so
  * the pass stays inside whole-stage codegen.
  *
  * Rounding is HALF_UP away from zero via BigDecimal — exactly Spark's
  * `round(double)` and DuckDB's `round`, element for element (the oracle
  * replays the codes value-exactly, so cheaper `floor(|x|+0.5)` float
  * tricks are not an option: they disagree with decimal HALF_UP on values
  * like 0.49999999999999994). Null elements stay null; an empty or all-null
  * vector gets scale 1.0 and its elements unchanged — the exact `when`
  * ladder of the HOF version.
  *
  * NaN contract (pinned in ExpressionParitySpec): a NaN element poisons
  * the max per Spark's comparison semantics (NaN orders above every
  * double), so the scale is NaN and every code is 0. This is DEFINED and
  * total where the ANSI HOF would throw (CAST_OVERFLOW casting NaN to
  * tinyint) — one bad vector must not kill a 100 TB job, and the NaN
  * scale is loud downstream (any dequantize yields NaN, never a silent
  * wrong number).
  */
case class Quantize8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("q",
      ArrayType(org.apache.spark.sql.types.ByteType,
        containsNull = child.dataType match {
          case ArrayType(_, n) => n
          case _ => true
        }))))
  override def prettyName: String = "vec_quantize8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = Quantize8.quantizeRow(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Quantize8.quantizeRow($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Quantize8 {
  def quantizeRow(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var mx = Double.NegativeInfinity
    var seen = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = math.abs(v.getDouble(i))
        // Spark comparison semantics order NaN ABOVE every other double
        // (array_max of a NaN-bearing vector is NaN, and `NaN > 0` is true
        // in SQL), while Java's `x > mx` is false for NaN — mirror Spark:
        // a NaN element poisons the max, the scale goes NaN, and every
        // code truncates to 0 exactly like the HOF round-then-cast did
        if (x.isNaN || x > mx) mx = x
        seen = true
      }
      i += 1
    }
    val scale = if (seen && (mx.isNaN || mx > 0)) mx / 127.0 else 1.0
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = v.getDouble(i) / scale
        // BigDecimal.valueOf throws on non-finite input; Spark's
        // round-then-cast pipeline passes NaN/Inf through round and
        // truncates in the tinyint cast — mirror that (NaN → 0)
        q(i) = if (java.lang.Double.isFinite(x))
          java.math.BigDecimal.valueOf(x)
            .setScale(0, java.math.RoundingMode.HALF_UP).byteValue()
        else x.toByte
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      scale, new org.apache.spark.sql.catalyst.util.GenericArrayData(q)))
  }
}

/** Static hot loop shared by interpreted eval and codegen of [[ZcaWhiten]]. */
object MatVecUtil {
  /** y = W·(x − μ) with W a row-major d×d flat array: per output row i,
    * `s += w(i·d + j) · (x(j) − mean(j))` left-to-right in j — the identical
    * IEEE accumulation (subtract, multiply, add, same operand order) as the
    * zip_with-center + per-dim [[DotProduct]] formulation this replaces, so
    * results are bit-for-bit unchanged. Input length must equal d and
    * elements must be non-null: the HOF form silently zip_with-padded a
    * short vector with nulls and scored null slots as garbage; a dimension
    * mismatch or a null element is a broken pipeline, so fail loudly
    * instead (on unsafe rows a null slot would otherwise read as 0.0 and
    * mis-score silently). The null probe runs once per element in the
    * O(d) centering loop — noise next to the O(d²) multiply loop.
    */
  def whiten(x: ArrayData, w: Array[Double], mean: Array[Double]): ArrayData = {
    val d = mean.length
    require(x.numElements() == d,
      s"zca_whiten: vector length ${x.numElements()} != fitted dim $d")
    val c = new Array[Double](d)
    var j = 0
    while (j < d) {
      if (x.isNullAt(j)) throw new IllegalArgumentException(
        s"zca_whiten: null element at position $j — whitening needs dense vectors")
      c(j) = x.getDouble(j) - mean(j); j += 1
    }
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val off = i * d
      var s = 0.0
      var k = 0
      while (k < d) { s += w(off + k) * c(k); k += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<double>` → `array<double>`: one fused centered mat-vec against a
  * broadcast-referenced W — the whole ZCA apply as ONE codegen'd node. The
  * per-dim formulation it replaces (`array(dot(lit(w_0), c), …,
  * dot(lit(w_{d-1}), c))` over a zip_with-centered column) embedded d
  * literal rows of d doubles each in the projection: O(d²) literals that
  * blow the JVM 64 KB method limit / constant pool in WholeStageCodegen at
  * production dims (512–1024) and take quadratic time to even construct.
  * Here W and μ ride as `ctx.addReferenceObj` arrays ([[graft.expressions
  * .HyperplaneBuckets]]' pattern) — codegen size is constant in d, the
  * arithmetic is the identical left-to-right IEEE loop (parity + a d=512
  * compile pinned in WhiteningSpec).
  *
  * Fields are immutable `ArraySeq` so two instances built from the same
  * model compare structurally (Catalyst canonicalization / CSE — the
  * [[CosineByIds]] precedent); the unwrapped primitive arrays are cached
  * transiently for the hot path.
  */
case class ZcaWhiten(child: Expression,
                     mean: scala.collection.immutable.ArraySeq[Double],
                     w: scala.collection.immutable.ArraySeq[Double])
    extends UnaryExpression {
  require(w.length == mean.length.toLong * mean.length,
    s"zca_whiten: |w|=${w.length} != d²=${mean.length.toLong * mean.length}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "zca_whiten"

  // case-class hashCode walks all d² elements and is recomputed per call
  // (Catalyst consults it for CSE set membership / canonicalization maps);
  // cache it once — the fields are immutable, so this is pure memoization
  @transient override lazy val hashCode: Int =
    scala.runtime.ScalaRunTime._hashCode(this)

  // zero-copy when the ArraySeq is primitive-backed (ofDouble — the engine
  // call site); a generically-built boxed ArraySeq (ofRef) falls back to a
  // one-time copy instead of a first-row ClassCastException
  @transient private lazy val meanArr: Array[Double] = mean.unsafeArray match {
    case a: Array[Double] => a
    case _ => mean.toArray
  }
  @transient private lazy val wArr: Array[Double] = w.unsafeArray match {
    case a: Array[Double] => a
    case _ => w.toArray
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MatVecUtil.whiten(input.asInstanceOf[ArrayData], wArr, meanArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("zcaW", wArr, "double[]")
    val mRef = ctx.addReferenceObj("zcaMean", meanArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MatVecUtil.whiten($c, $wRef, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
