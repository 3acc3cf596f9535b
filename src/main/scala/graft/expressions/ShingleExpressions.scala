package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy loop bodies for the shingle/bucket expressions, compiled Scala
  * called from thin generated code — keeps whole-stage codegen units small
  * (fast Janino compiles) while the hot loop runs JIT-compiled.
  */
object ShingleUtil {
  private val space = UTF8String.fromString(" ")

  /** Distinct word n-gram shingles from a token array, first-occurrence
    * order. Semantics match
    * `array_distinct(transform(sequence(0, len-n), i -> concat_ws(' ', slice(toks, i+1, n))))`.
    */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val numToks = tokens.numElements()
    if (numToks < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= numToks - n) {
      var j = 0
      while (j < n) { window(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Windowed skip-gram pairs, canonical byte order within each pair —
    * the [[SkipGramPairs]] kernel. UTF8String.compareTo is byte-wise,
    * exactly Spark's binary string `<=`.
    */
  def skipGramPairs(tokens: ArrayData, window: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = tokens.getUTF8String(i); i += 1 }
    // clamp the hint: n * window as an Int can go negative on pathological
    // token arrays (n > MaxInt/window) and the constructor would throw
    // before any useful guard fires — the list still GROWS past the hint
    val out = new java.util.ArrayList[Any](
      math.min(n.toLong * window, 1L << 20).toInt)
    i = 0
    while (i < n - 1) {
      val hi = math.min(i + window, n - 1)
      var j = i + 1
      while (j <= hi) {
        val (a, b) =
          if (toks(i).compareTo(toks(j)) <= 0) (toks(i), toks(j))
          else (toks(j), toks(i))
        out.add(new GenericInternalRow(Array[Any](a, b)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Top-bigram frequency stats in one per-row pass: returns
    * `[max count of any word bigram, total bigram count]` over consecutive
    * (non-distinct) token pairs. Counting is per-DOCUMENT state, so doing it
    * inside the row (a small hashmap) instead of `explode` + two `groupBy`s
    * removes the only shuffles from the repetition-signal query — at 100 TB
    * that is the difference between a scan and re-shuffling the corpus's
    * full bigram stream twice.
    */
  def bigramStats(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 2) return new GenericArrayData(Array[Long](0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var top = 0
    var i = 0
    while (i < n - 1) {
      val bg = UTF8String.concatWs(space, tokens.getUTF8String(i), tokens.getUTF8String(i + 1))
      val c = counts.merge(bg, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array[Long](top.toLong, (n - 1).toLong))
  }

  /** Per-row top-n-gram stats `[top_count, top_chars, total_grams]`: the
    * occurrence count of the most frequent word n-gram (ties broken by the
    * lexicographically SMALLEST gram — deterministic on any engine), the
    * character length of that gram (tokens joined with single spaces), and
    * the number of n-gram positions. Same per-row-state argument as
    * [[bigramStats]]: this is a HashMap per row, not a corpus shuffle.
    */
  def topNgramStats(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array[Long](0L, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      val gram = UTF8String.concatWs(space, parts: _*)
      counts.merge(gram, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      i += 1
    }
    var top: UTF8String = null
    var topC = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      if (c > topC || (c == topC && (top == null || e.getKey.compareTo(top) < 0))) {
        topC = c; top = e.getKey
      }
    }
    new GenericArrayData(Array[Long](topC.toLong, top.numChars().toLong, (len - n + 1).toLong))
  }

  /** Per-row hashed-bigram negative log-likelihood: Σ over positions of
    * `lnBi(bucket(prev⌣' '⌣tok)) − lnCtx(bucket(prev))`, negated and
    * divided by the position count (0 for <2 tokens). FNV-1a is
    * byte-sequential, so the bigram hash CONTINUES from the context hash
    * (one byte pass per token serves both buckets, and position i's token
    * hash is position i+1's context hash) — no string concatenation, no
    * per-position re-hash of the prefix. The log tables arrive precomputed
    * (ln(c+1), ln(c+B)) so the loop is pure lookups and adds.
    */
  def bigramNll(tokens: ArrayData, lnBi: Array[Double], lnCtx: Array[Double],
                buckets: Int): Double = {
    val n = tokens.numElements()
    if (n < 2) return 0.0
    def fnvOf(s: UTF8String): Long = graft.expressions.Fnv1a.hash(s.getBytes)
    var sum = 0.0
    var hPrev = fnvOf(tokens.getUTF8String(0))
    var i = 1
    while (i < n) {
      val tok = tokens.getUTF8String(i)
      val hTok = fnvOf(tok)
      var h = hPrev
      h ^= (' ' & 0xffL); h *= graft.expressions.Fnv1a.Prime
      val tb = tok.getBytes
      var j = 0
      while (j < tb.length) { h ^= (tb(j) & 0xffL); h *= graft.expressions.Fnv1a.Prime; j += 1 }
      sum += lnBi(java.lang.Math.floorMod(h, buckets.toLong).toInt) -
        lnCtx(java.lang.Math.floorMod(hPrev, buckets.toLong).toInt)
      hPrev = hTok
      i += 1
    }
    -sum / (n - 1)
  }

  /** Coverage-mask span rewrite: the tokens NOT covered by any
    * `[start, start + window)` cut, re-joined with single spaces. Cut starts
    * are copied out, sorted once, and swept alongside the token index with a
    * running `coveredUntil` watermark, so a document that is mostly cuts
    * costs O(tokens + cuts·log cuts) — not the O(tokens × cuts) of the
    * per-token `exists(cuts, …)` HOF formulation this replaces (which also
    * interpreted two lambdas per token).
    */
  def spanCutRewrite(tokens: ArrayData, cuts: ArrayData, window: Int,
                     sep: UTF8String): UTF8String = {
    val n = tokens.numElements()
    val m = cuts.numElements()
    val starts = new Array[Long](m)
    var i = 0
    while (i < m) { starts(i) = cuts.getLong(i); i += 1 }
    java.util.Arrays.sort(starts)
    val kept = new Array[UTF8String](n)
    var k = 0
    var j = 0
    var coveredUntil = Long.MinValue
    i = 0
    while (i < n) {
      while (j < m && starts(j) <= i) {
        val end = starts(j) + window
        if (end > coveredUntil) coveredUntil = end
        j += 1
      }
      if (i >= coveredUntil) { kept(k) = tokens.getUTF8String(i); k += 1 }
      i += 1
    }
    UTF8String.concatWs(sep,
      (if (k == n) kept else java.util.Arrays.copyOfRange(kept, 0, k)): _*)
  }

  /** Stride-1 span fingerprints: FNV-1a over each `window`-token run's
    * LOWERED space-joined text, one long per start position. Byte-identical
    * to `fnv1a64(lower(array_join(slice(toks, s+1, window), ' ')))` per
    * position, but each token is lowercased ONCE (not once per covering
    * window) and the hash runs straight over token bytes with a literal
    * space between — no slice array, no joined string, no lowered copy per
    * window. The HOF chain allocated ~3 objects × ~100 B per position;
    * this allocates one long array per row.
    */
  def spanFingerprints(tokens: ArrayData, window: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < window) return new GenericArrayData(Array.empty[Long])
    val low = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { low(i) = tokens.getUTF8String(i).toLowerCase.getBytes; i += 1 }
    val out = new Array[Long](n - window + 1)
    var s = 0
    while (s <= n - window) {
      var h = Fnv1a.Offset
      var j = 0
      while (j < window) {
        if (j > 0) { h ^= (' ' & 0xffL); h *= Fnv1a.Prime }
        val b = low(s + j)
        var k = 0
        while (k < b.length) { h ^= (b(k) & 0xffL); h *= Fnv1a.Prime; k += 1 }
        j += 1
      }
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane bucket ids, one per table. `planes` is laid out flat
    * as [table][bit][dim]; bucket bit b is set iff dot(v, plane) >= 0,
    * packed MSB-first (matches
    * [[graft.functions.VectorFunctions.hyperplaneBucket]]).
    */
  def hyperplaneBuckets(v: ArrayData, planes: Array[Double],
                        tables: Int, bits: Int, dim: Int): ArrayData = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var d = 0.0
        var i = 0
        while (i < n) { d += v.getDouble(i) * planes(off + i); i += 1 }
        acc = acc * 2 + (if (d >= 0) 1L else 0L)
        b += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct word n-gram shingle set per row over an `array<string>` token
  * column — native replacement for the `transform`+`slice`+`concat_ws`+
  * `array_distinct` HOF chain (which interprets four lambdas and allocates
  * O(tokens) intermediate arrays per row).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleUtil.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row top-bigram stats `[top_count, total]` over an `array<string>`
  * token column — native replacement for the explode → groupBy(doc, bigram)
  * → groupBy(doc) pipeline, whose two corpus-wide string shuffles implement
  * what is really per-row state (see [[ShingleUtil.bigramStats]]).
  */
case class BigramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bigram_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.bigramStats(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleUtil.bigramStats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row top-n-gram stats `[top_count, top_chars, total_grams]` over an
  * `array<string>` token column — the generalization of [[BigramStats]] the
  * Gopher A1.2 repetition rules need (n = 2, 3, 4), with a deterministic
  * smallest-gram tie-break so the numbers replay on any engine.
  */
case class TopNgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_ngram_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.topNgramStats(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleUtil.topNgramStats($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row hashed-bigram LM negative log-likelihood over an `array<string>`
  * token column — the scoring kernel of
  * [[graft.pipeline.TrainingData.perplexityScore]]. A native expression
  * because the higher-order-function formulation (`aggregate` +
  * `element_at` on 16k-entry literal arrays + two string hashes per
  * position) is CodegenFallback-interpreted and measured 8.4 s at sf0.1;
  * this is one byte-level loop per row with the log tables as reference
  * objects.
  */
case class BigramNll(child: Expression, lnBi: Array[Double], lnCtx: Array[Double],
                     buckets: Int) extends UnaryExpression {
  require(lnBi.length == buckets && lnCtx.length == buckets, "table size mismatch")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "bigram_nll"

  // primitive arrays compare by reference, which would defeat Catalyst
  // canonicalization / CSE (two plan rewrites rebuilding this expression
  // would never compare equal and the per-row loop would run twice) —
  // content equality + an O(1) consistent hash, the BloomMightContain
  // pattern
  override def equals(other: Any): Boolean = other match {
    case o: BigramNll =>
      child == o.child && buckets == o.buckets &&
        java.util.Arrays.equals(lnBi, o.lnBi) && java.util.Arrays.equals(lnCtx, o.lnCtx)
    case _ => false
  }
  override def hashCode(): Int = {
    def s(a: Array[Double]): Long =
      if (a.isEmpty) 0L
      else java.lang.Double.doubleToLongBits(a(0)) ^
        java.lang.Double.doubleToLongBits(a(a.length - 1)) ^ a.length
    java.util.Objects.hash(child, Integer.valueOf(buckets),
      java.lang.Long.valueOf(s(lnBi)), java.lang.Long.valueOf(s(lnCtx)))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.bigramNll(input.asInstanceOf[ArrayData], lnBi, lnCtx, buckets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val biRef = ctx.addReferenceObj("bigramLnBi", lnBi, "double[]")
    val ctxRef = ctx.addReferenceObj("bigramLnCtx", lnCtx, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleUtil.bigramNll($c, $biRef, $ctxRef, $buckets);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `tables` random-hyperplane LSH bucket ids in one expression over an
  * `array<double>` vector — native replacement for `tables × bits` separate
  * dot-product column trees (which bloat the codegen unit and recompute the
  * input cast per plane).
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Double],
                             tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {
  require(planes.length == tables * bits * dim, "planes layout mismatch")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.hyperplaneBuckets(input.asInstanceOf[ArrayData], planes, tables, bits, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleUtil.hyperplaneBuckets(" +
        s"$c, $planesRef, $tables, $bits, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Stride-1 span fingerprints over an `array<string>` token column — the
  * generator behind `TrainingData.spanFingerprints` (batch census +
  * decontamination) and the streaming span gate's per-row probe. Native for
  * the same reason as [[WordShingles]]: the HOF formulation
  * (`transform(sequence, s -> fnv1a64(lower(array_join(slice(...)))))`)
  * interprets a lambda and allocates slice + joined-string + lowered-copy
  * per position; this is one primitive loop per row.
  */
case class SpanFingerprints(child: Expression, window: Int) extends UnaryExpression {
  require(window >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.spanFingerprints(input.asInstanceOf[ArrayData], window)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleUtil.spanFingerprints($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Windowed skip-gram co-occurrence pairs over an `array<string>` token
  * column, canonically ordered (byte-wise min first — Spark's binary
  * string comparison): the generator behind
  * [[graft.operators.Analytics.pmiPairs]]. Native for the TripleCombos
  * reason: the HOF formulation (`flatten(transform(sequence(1, n-1), i ->
  * transform(sequence(i+1, min(i+w, n)), j -> IF(t_i <= t_j, struct(t_i,
  * t_j), struct(t_j, t_i)))))`) allocates two sequence arrays, closure
  * frames, and a flatten copy per POSITION per row; this is one O(n·w)
  * primitive loop.
  */
case class SkipGramPairs(child: Expression, window: Int) extends UnaryExpression {
  require(window >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType), StructField("b", StringType))),
    containsNull = false)
  override def prettyName: String = "skipgram_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.skipGramPairs(input.asInstanceOf[ArrayData], window)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleUtil.skipGramPairs($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Coverage-mask span rewrite over `(tokens array<string>, cut starts
  * array<bigint>)` — the ONE rewrite kernel shared by
  * [[graft.pipeline.TrainingData.removeRepeatedSpans]],
  * [[graft.pipeline.TrainingData.decontaminateSpans]], and the streaming
  * [[graft.pipeline.TrainingData.decontaminateSpansGate]]. Native because the
  * HOF formulation (`filter(toks, (t,i) => !exists(cuts, p => …))`) is
  * O(tokens × cuts) per row — quadratic on a document that is mostly
  * repeated/contaminated spans, the exact worst case a span remover exists
  * for — and because one definition keeps the three call sites from
  * diverging (they were three verbatim copies of the lambda tree).
  */
case class SpanCutRewrite(left: Expression, right: Expression, window: Int,
                          sep: String = " ")
    extends BinaryExpression {
  require(window > 0, "window must be positive")

  // the joiner is a parameter so the SAME kernel serves token-level span
  // removal (space) and line-level boilerplate removal (newline)
  private lazy val sepU = UTF8String.fromString(sep)

  override def dataType: DataType = StringType
  override def prettyName: String = "span_cut_rewrite"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(toks: Any, cuts: Any): Any =
    ShingleUtil.spanCutRewrite(
      toks.asInstanceOf[ArrayData], cuts.asInstanceOf[ArrayData], window, sepU)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("cutSep", sepU,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.expressions.ShingleUtil.spanCutRewrite($t, $c, $window, $sepRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
