package graft.expressions

import graft.SparkSpec
import graft.dedup.Dedup
import graft.functions.VectorFunctions
import graft.similarity.Ann
import org.apache.spark.sql.functions._

/** Native-expression parity tests: each custom codegen'd expression must
  * produce exactly the value of the declarative (HOF) formulation it
  * replaced — both in codegen and interpreted (eval) mode. Property-style
  * inputs come from a seeded generator (one Spark job for all cases).
  */
class ExpressionParitySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private def randVec(n: Int = 8): List[Double] =
    List.fill(n)(rng.nextDouble() * 20 - 10)

  test("DotProduct matches the aggregate/zip_with formulation (50 random vectors)") {
    val cases = List.fill(50)((randVec(), randVec()))
    val df = cases.toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("hof")
    ).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("DotProduct interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val a = Seq(1.5, -2.0, 3.25)
    val litA = Literal.create(a, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    // interpreted eval path (nullSafeEval), bypassing codegen entirely
    assert(DotProduct(litA, litA).eval(null) === a.map(x => x * x).sum)
  }

  test("WordShingles matches the transform/slice/concat_ws/array_distinct chain") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a a",               // heavy repetition → distinct shrinks
      "one two three four",          // < n tokens for n=5 → empty
      "  leading  and   trailing   whitespace  mess ",
      "")
    val df = texts.toDF("text")
    val n = 5
    val toks = filter(split(trim(lower(col("text"))), "\\s+"), t => length(t) > 0)
    val hof = when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
    val rows = df.select(
      Dedup.wordShingles(col("text"), n).as("native"), hof.as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0).toSet === r.getSeq[String](1).toSet)
      assert(r.getSeq[String](0).length === r.getSeq[String](1).length)
    }
  }

  test("SpanFingerprints matches the fnv1a64(lower(array_join(slice))) chain; SpanCutRewrite matches the exists mask") {
    import org.apache.spark.sql.graft.ColumnBridge
    val texts = Seq(
      "The Quick Brown Fox Jumps Over The Lazy Dog Again And Again",
      "a b c d e",                            // exactly window tokens at w=5
      "one two three",                        // < window → empty fps
      "  MIXED   Case  Tokens   with   Runs   of   whitespace  here  now ",
      "")
    val w = 5
    val df = texts.toDF("text")
    val toks = filter(split(trim(col("text")), "\\s+"), t => length(t) > 0)
    def fpsNative(c: org.apache.spark.sql.Column) =
      ColumnBridge.column(SpanFingerprints(ColumnBridge.expression(c), w))
    val hof = when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        s => graft.functions.TextFunctions.fnv1a64(
          lower(array_join(slice(toks, s + 1, lit(w)), " ")))))
      .otherwise(array().cast("array<bigint>"))
    df.select(fpsNative(toks).as("native"), hof.as("hof")).collect().foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    // SpanCutRewrite == the per-token exists() coverage mask it replaced,
    // including unsorted/overlapping/duplicate cuts
    val cutCases = Seq(
      (Seq("t1","t2","t3","t4","t5","t6","t7","t8"), Seq(4L, 0L, 4L)), // dup + overlap, unsorted
      (Seq("a","b","c"), Seq(0L)),                                      // full coverage
      (Seq("x","y","z"), Seq.empty[Long]))                              // no cuts
    val cw = 3
    val cdf = cutCases.toDF("toks", "cuts")
    def rwNative = ColumnBridge.column(SpanCutRewrite(
      ColumnBridge.expression(col("toks")), ColumnBridge.expression(col("cuts")), cw))
    val rwHof = array_join(
      filter(col("toks"), (t, i) =>
        !exists(col("cuts"), p => i >= p && i < p + cw)), " ")
    cdf.select(rwNative.as("native"), rwHof.as("hof")).collect().foreach { r =>
      assert(r.getString(0) === r.getString(1))
    }
    // interpreted eval path (nullSafeEval), bypassing codegen entirely
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
    val litToks = Literal.create(Seq("Aa", "Bb", "Cc"), ArrayType(StringType))
    val evalFps = SpanFingerprints(litToks, 2).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(evalFps.toSeq === Seq(
      Fnv1a.hash("aa bb".getBytes("UTF-8")), Fnv1a.hash("bb cc".getBytes("UTF-8"))))
    val evalRw = SpanCutRewrite(litToks,
      Literal.create(Seq(0L), ArrayType(LongType)), 2).eval(null).toString
    assert(evalRw === "Cc")
  }

  test("MinHashSignature matches the affine-min HOF formulation") {
    val params = Dedup.MinHashParams(numHashes = 16, bands = 8)
    val df = Seq(
      Seq("alpha beta", "beta gamma", "gamma delta"),
      Seq("x"),
      Seq.empty[String]).toDF("shingles")
    val coefs = arrays_zip(lit(params.as).as("a"), lit(params.bs).as("b"))
    val hs = transform(col("shingles"), s => pmod(xxhash64(s), lit(params.p)))
    val hof = aggregate(hs,
      array_repeat(lit(Long.MaxValue), params.numHashes),
      (acc, x) => zip_with(acc, coefs,
        (m, ab) => least(m, pmod(ab.getField("a") * x + ab.getField("b"), lit(params.p)))))
    val rows = df.select(
      Dedup.minhashSignature(col("shingles"), params).as("native"), hof.as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("SimHash64 matches the vote/pack HOF formulation") {
    val texts = Seq("the quick brown fox", "the quick brown fox", "completely different words here", "x")
    val df = texts.toDF("text")
    val toks = filter(split(trim(lower(col("text"))), "\\s+"), t => length(t) > 0)
    val th = transform(toks, t => xxhash64(t))
    val votes = aggregate(th,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(k =>
          (shiftright(h, k).bitwiseAND(1) * 2 - 1).cast("long")): _*),
        (a, v) => a + v))
    val hof = aggregate(reverse(votes), lit(0L),
      (packed, s) => shiftleft(packed, 1).bitwiseOR(when(s >= 0, 1L).otherwise(0L)))
    val rows = df.select(Dedup.simhash64(col("text"), useFnv = false).as("native"), hof.as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // identical texts → identical simhash (hamming 0)
    assert(rows(0).getLong(0) === rows(1).getLong(0))
  }

  test("SimHash64 FNV variant matches a driver-side recomputation; Fnv1a64 matches Fnv1a.hash") {
    val texts = Seq("the quick brown fox", "pack my box with five dozen liquor jugs", "x y x y x")
    val df = texts.toDF("text")
    def simRef(t: String): Long = {
      val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val votes = new Array[Long](64)
      toks.foreach { tk =>
        val h = graft.expressions.Fnv1a.hash(tk.getBytes("UTF-8"))
        (0 until 64).foreach(k => votes(k) += ((h >>> k) & 1L) * 2L - 1L)
      }
      (63 to 0 by -1).foldLeft(0L)((p, k) => (p << 1) | (if (votes(k) >= 0) 1L else 0L))
    }
    val got = df.select(col("text"), Dedup.simhash64(col("text")).as("sim"),
      graft.functions.TextFunctions.fnv1a64(col("text")).as("fh")).collect()
    got.foreach { r =>
      assert(r.getLong(1) === simRef(r.getString(0)))
      assert(r.getLong(2) === graft.expressions.Fnv1a.hash(r.getString(0).getBytes("UTF-8")))
    }
  }

  test("QualityScoreRaw one-pass matches the declarative four-signal formulation") {
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog, and then it naps.",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",       // one giant token
      "a b c d e f g h",                                 // tiny tokens
      "lots!!! of??? punctuation...,,, here;;; ok:::",
      "   leading and trailing whitespace   ",
      "tabs\tand\nnewlines\rsplittokens\ftoo",
      "的 了 unicode tokens mixed with the and of",       // non-ASCII path
      "x",
      "")
    val df = texts.toDF("text")
    val rows = df.select(
      graft.functions.TextFunctions.qualityScore(col("text")).as("native"),
      graft.functions.TextFunctions.qualityScoreHof(col("text")).as("hof")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getDouble(0) === r.getDouble(1), s"mismatch on: '$t'")
    }
  }

  test("expressions with list/bitmap parameters keep structural equality (CSE-able)") {
    // Array fields in a case class compare by reference, which silently
    // defeats Catalyst canonicalization — two identical score/probe columns
    // built separately would never be recognized as common subexpressions
    import org.apache.spark.sql.graft.ColumnBridge
    val child = ColumnBridge.expression(col("s"))
    val stops = graft.functions.TextFunctions.stopwords("en")
    val q1 = graft.expressions.QualityScoreRaw(child, stops)
    val q2 = graft.expressions.QualityScoreRaw(child, stops.toList) // distinct Seq instance
    assert(q1 == q2 && q1.hashCode == q2.hashCode)
    val b1 = graft.expressions.BloomMightContain(child, Array(1L, 2L, 3L), 4, 192L)
    val b2 = graft.expressions.BloomMightContain(child, Array(1L, 2L, 3L), 4, 192L)
    val b3 = graft.expressions.BloomMightContain(child, Array(1L, 2L, 9L), 4, 192L)
    assert(b1 == b2 && b1.hashCode == b2.hashCode)
    assert(b1 != b3)
    // MinHash coefficients: two equal-seed MinHashParams produce distinct
    // array objects — the expressions must still be one computation
    val p1 = Dedup.MinHashParams(numHashes = 8, bands = 4, seed = 7L)
    val p2 = Dedup.MinHashParams(numHashes = 8, bands = 4, seed = 7L)
    val m1 = graft.expressions.MinHashSignature(child, p1.as, p1.bs)
    val m2 = graft.expressions.MinHashSignature(child, p2.as, p2.bs)
    val bsEdited = p1.bs.clone(); bsEdited(0) += 1L
    val m3 = graft.expressions.MinHashSignature(child, p1.as, bsEdited)
    assert(m1 == m2 && m1.hashCode == m2.hashCode)
    assert(m1 != m3)
  }

  test("HyperplaneBuckets matches the driver-side bucketOf for every table") {
    val idx = Ann.LshIndex(dim = 8, bits = 4, tables = 6, seed = 11L)
    val vs = List.fill(25)(randVec())
    val df = vs.map(Tuple1(_)).toDF("v")
    val got = idx.withBuckets(df, "v").select("v", "buckets").collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) === idx.bucketsOf(r.getSeq[Double](0)))
    }
  }

  test("hamming distance via bit_count(xor)") {
    val df = Seq((0L, -1L), (5L, 4L), (7L, 7L)).toDF("a", "b")
    val got = df.select(Dedup.hamming(col("a"), col("b"))).collect().map(_.getInt(0)).toSeq
    assert(got === Seq(64, 1, 0))
  }

  // --- CosineByIds: the replicated-flat-store verify kernel -----------------

  private def flatStore(vecs: Map[Long, Array[Double]], dim: Int) = {
    import scala.collection.immutable.ArraySeq
    val ids = vecs.keys.toArray.sorted
    val flat = new Array[Double](ids.length * dim)
    val norms = new Array[Double](ids.length)
    ids.zipWithIndex.foreach { case (id, i) =>
      val v = vecs(id)
      v.copyToArray(flat, i * dim)
      norms(i) = math.sqrt(v.map(x => x * x).sum)
    }
    (ArraySeq.unsafeWrapArray(ids), ArraySeq.unsafeWrapArray(flat),
      ArraySeq.unsafeWrapArray(norms))
  }

  test("CosineByIds matches the join-based cosinePrenormed verify (codegen path)") {
    import org.apache.spark.sql.graft.ColumnBridge
    val dim = 8
    val vecs = (1L to 30L).map(i => i -> Array.fill(dim)(rng.nextDouble() * 2 - 1)).toMap +
      (99L -> Array.fill(dim)(0.0)) // zero vector → cosine defined as 0.0
    val (ids, flat, norms) = flatStore(vecs, dim)
    val pairs = (for { a <- vecs.keys; b <- vecs.keys if a < b } yield (a, b)).toSeq
    val pairDf = pairs.toDF("a", "b")
    val byIds = CosineByIds(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")),
      ids, flat, norms, dim)
    val got = pairDf.select(col("a"), col("b"), ColumnBridge.column(byIds).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // reference: the broadcast-join arithmetic (left-to-right dot / na*nb)
    pairs.foreach { case (a, b) =>
      val (va, vb) = (vecs(a), vecs(b))
      var s = 0.0; var k = 0
      while (k < dim) { s += va(k) * vb(k); k += 1 }
      val nn = math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum)
      val want = if (nn > 0) s / nn else 0.0
      assert(got((a, b)) === want, s"pair ($a,$b)")
    }
  }

  test("CosineByIds interpreted eval matches codegen and fails loudly on unknown ids") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val dim = 4
    val vecs = Map(1L -> Array(1.0, 0.0, 0.0, 0.0), 2L -> Array(0.6, 0.8, 0.0, 0.0))
    val (ids, flat, norms) = flatStore(vecs, dim)
    val e = CosineByIds(Literal(1L), Literal(2L), ids, flat, norms, dim)
    assert(e.eval(null) === 0.6) // dot=0.6, norms 1·1
    val stale = CosineByIds(Literal(1L), Literal(42L), ids, flat, norms, dim)
    intercept[IllegalStateException](stale.eval(null))
  }

  test("DotProductInt8 matches the widened-double formulation, interpreted and codegen") {
    import org.apache.spark.sql.graft.ColumnBridge
    val rng2 = new scala.util.Random(13)
    val cases = List.fill(40)((
      List.fill(16)((rng2.nextInt(255) - 127).toByte),
      List.fill(16)((rng2.nextInt(255) - 127).toByte)))
    val df = cases.toDF("a", "b")
    val i8 = ColumnBridge.column(DotProductInt8(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
    val rows = df.select(i8.as("native"),
      aggregate(zip_with(col("a").cast("array<long>"), col("b").cast("array<long>"),
        (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // interpreted eval path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    val a = Seq[Byte](127, -127, 5)
    val lit8 = Literal.create(a, ArrayType(ByteType))
    assert(DotProductInt8(lit8, lit8).eval(null) === a.map(x => x.toLong * x).sum)
  }

  test("CosineByIds keeps structural equality across instances from the same store") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val dim = 4
    val vecs = Map(1L -> Array(1.0, 0.0, 0.0, 0.0), 2L -> Array(0.0, 1.0, 0.0, 0.0))
    val (ids1, flat1, norms1) = flatStore(vecs, dim)
    val (ids2, flat2, norms2) = flatStore(vecs, dim) // rebuilt: distinct arrays
    val e1 = CosineByIds(Literal(1L), Literal(2L), ids1, flat1, norms1, dim)
    val e2 = CosineByIds(Literal(1L), Literal(2L), ids2, flat2, norms2, dim)
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
  }

  test("NaN/Inf sweep: DotProduct propagates NaN exactly like the HOF formulation") {
    val cases = Seq(
      (Seq(Double.NaN, 1.0), Seq(1.0, 1.0)),   // NaN element → NaN
      (Seq(Double.PositiveInfinity, 0.0), Seq(0.0, 1.0)), // Inf·0 → NaN
      (Seq(Double.PositiveInfinity, 1.0), Seq(1.0, 1.0)), // Inf·1 → +Inf
      (Seq(1.0, 2.0), Seq(3.0, 4.0)))          // finite control
    val rows = cases.toDF("a", "b").select(
        graft.functions.VectorFunctions.dot(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    rows.foreach { r =>
      val (n, h) = (r.getDouble(0), r.getDouble(1))
      assert(n.isNaN === h.isNaN && (n.isNaN || n === h), s"native $n vs hof $h")
    }
    assert(rows(0).getDouble(0).isNaN && rows(1).getDouble(0).isNaN)
    assert(rows(2).getDouble(0) === Double.PositiveInfinity)
  }

  test("NaN/Inf sweep: cosine kernels score corrupt vectors 0.0 — CosineByIds, " +
      "cosine, and cosinePrenormed agree (a NaN score would float to the top of a desc top-k)") {
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.functions.{VectorFunctions => VF}
    val dim = 2
    val vecs = Map(
      1L -> Array(1.0, 0.0),                      // clean
      2L -> Array(Double.NaN, 1.0),               // NaN-poisoned
      3L -> Array(Double.PositiveInfinity, 0.0),  // Inf-poisoned
      4L -> Array(0.0, 1.0))                      // clean
    val (ids, flat, norms) = flatStore(vecs, dim)
    val pairs = (for { a <- vecs.keys; b <- vecs.keys if a < b } yield (a, b)).toSeq
    val byIds = pairs.toDF("a", "b").select(col("a"), col("b"),
        ColumnBridge.column(CosineByIds(
          ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")),
          ids, flat, norms, dim)).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val vdf = pairs.map { case (a, b) => (a, b, vecs(a).toSeq, vecs(b).toSeq) }
      .toDF("a", "b", "va", "vb")
    val joined = vdf.select(col("a"), col("b"),
        VF.cosine(col("va"), col("vb")).as("c1"),
        VF.cosinePrenormed(VF.dot(col("va"), col("vb")),
          VF.norm(col("va")), VF.norm(col("vb"))).as("c2"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    pairs.foreach { case (a, b) =>
      val (c1, c2) = joined((a, b))
      assert(!byIds((a, b)).isNaN && !c1.isNaN && !c2.isNaN, s"NaN escaped on ($a,$b)")
      assert(byIds((a, b)) === c1 && c1 === c2, s"($a,$b): byIds ${byIds((a, b))} cosine $c1 prenormed $c2")
      // any pair touching a poisoned vector scores exactly 0.0
      if (a == 2L || b == 2L || a == 3L || b == 3L)
        assert(byIds((a, b)) === 0.0, s"corrupt pair ($a,$b) must score 0.0")
    }
    assert(byIds((1L, 4L)) === 0.0) // orthogonal clean pair, sanity
  }

  test("NaN/Inf sweep: Quantize8 ∘ DotProductInt8 — NaN vector quantizes to zero codes, " +
      "the int8 dot is 0, and the rescaled score is loud-NaN (pinned, not silent)") {
    import org.apache.spark.sql.graft.ColumnBridge
    val df = Seq(
      (Seq(Double.NaN, 2.0), Seq(127.0, -1.0)),
      (Seq(Double.PositiveInfinity, 1.0), Seq(3.0, 4.0)))
      .toDF("bad", "good")
    val q = (c: org.apache.spark.sql.Column) => Ann.quantize8(c)
    val rows = df.select(q(col("bad")).as("qb"), q(col("good")).as("qg"))
      .select(col("qb.scale").as("sb"), col("qg.scale").as("sg"),
        ColumnBridge.column(DotProductInt8(
          ColumnBridge.expression(col("qb.q")),
          ColumnBridge.expression(col("qg.q")))).as("idot"))
      .withColumn("score", col("sb") * col("sg") * col("idot").cast("double"))
      .collect()
    // NaN row: scale NaN, codes 0 → idot 0 → score NaN (loud, documented)
    assert(rows(0).getDouble(0).isNaN && rows(0).getLong(2) === 0L)
    assert(rows(0).getDouble(3).isNaN)
    // Inf row: max is +Inf → scale +Inf; Inf-scaled codes are 0 (x/Inf
    // rounds to 0), finite elements quantize to 0 too → idot 0, score NaN
    // via Inf·0 — same loud contract, never a silent finite score
    assert(rows(1).getDouble(0) === Double.PositiveInfinity)
    assert(rows(1).getLong(2) === 0L && rows(1).getDouble(3).isNaN)
  }

  test("JaroWinkler: literature values, boost threshold, window clamp, nulls") {
    import graft.functions.{TextFunctions => TF}
    val cases = Seq(
      ("martha", "marhta", (0.9444444444444445 + 3 * 0.1 * (1.0 - 0.9444444444444445))),
      ("dixon", "dicksonx", (0.7666666666666666 + 2 * 0.1 * (1.0 - 0.7666666666666666))),
      ("jellyfish", "smellyfish", 0.8962962962962964), // no shared prefix
      ("crate", "trace", 0.7333333333333334),          // J > 0.7 but prefix 0
      ("aaxxxxxxxx", "aayyyyyyyy", 0.4666666666666666),// J <= 0.7: no boost
      ("b", "b", 1.0),                                  // window clamp case
      ("ab", "ba", 0.0),
      ("", "abc", 0.0),
      // both-empty pins the ORACLE's convention: DuckDB 1.0.0
      // jaro_winkler_similarity('','') = 0.0 (verified), unlike
      // rapidfuzz's 1.0 — bit-exactness is to the oracle, not rapidfuzz
      ("", "", 0.0))
    val out = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(TF.jaroWinkler(col("a"), col("b"))).as[Double].collect()
    out.zip(cases).foreach { case (got, (a, b, want)) =>
      assert(got === want, s"jw($a, $b)")
    }
    // interpreted eval path agrees with the codegen'd column path
    import org.apache.spark.unsafe.types.UTF8String
    cases.foreach { case (a, b, want) =>
      assert(StringSimUtil.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b)) === want)
    }
    // null safety
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(TF.jaroWinkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("Quantize8 matches the HOF round(x/scale) formulation (60 random vectors + edges)") {
    // finite-domain parity only: on a NaN-bearing vector the ANSI HOF
    // THROWS (CAST_OVERFLOW casting NaN to tinyint) — the native NaN
    // contract is pinned separately below as defined, total behavior
    val cases = List.fill(60)(randVec(16)) ++
      List(List.fill(8)(0.0), List(127.0), List(-3.2), Nil)
    val df = cases.map(v => Tuple1(v)).toDF("v")
    val vd = col("v").cast("array<double>")
    val mx = array_max(transform(vd, x => abs(x)))
    val scale = when(mx > 0, mx / 127.0).otherwise(lit(1.0))
    val rows = df.select(
        Ann.quantize8(col("v")).as("native"),
        struct(scale.as("scale"),
          transform(vd, x => round(x / scale).cast("tinyint")).as("q")).as("hof"))
      .collect()
    rows.foreach { r =>
      val nat = r.getStruct(0); val hof = r.getStruct(1)
      assert(nat.getDouble(0) === hof.getDouble(0))
      assert(nat.getSeq[Byte](1) === hof.getSeq[Byte](1))
    }
  }

  test("Quantize8 NaN contract: NaN poisons the max, scale goes NaN, codes 0 — total, never throws") {
    // Spark comparison semantics put NaN above every double (array_max of
    // a NaN-bearing vector is NaN), so the scale is NaN and every
    // quantized element is NaN → byte 0. The ANSI round-cast formulation
    // would THROW here (CAST_OVERFLOW); the native expression stays TOTAL
    // — at 100 TB one bad vector must not kill the job, and a (NaN, 0...)
    // row is loud downstream (any dequantize yields NaN, never a silent
    // wrong number).
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    for (v <- Seq(Seq(1.0, Double.NaN, -5.0), Seq(Double.NaN))) {
      val row = Quantize8(Literal.create(v, ArrayType(DoubleType))).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      assert(row.getDouble(0).isNaN)
      assert(row.getArray(1).toByteArray().toSeq === Seq.fill(v.length)(0: Byte))
    }
    // the codegen'd column path agrees
    val got = Seq(Tuple1(Seq(1.0, Double.NaN))).toDF("v")
      .select(Ann.quantize8(col("v"))).head.getStruct(0)
    assert(got.getDouble(0).isNaN)
    assert(got.getSeq[Byte](1) === Seq[Byte](0, 0))
  }

  test("TripleCombos matches the nested-HOF comprehension (40 random arrays + edges)") {
    // n >= 3 only: the HOF's sequence(1, n-2) goes DESCENDING below n=3 and
    // element_at throws — production filters size >= 3 before the generator,
    // so parity is defined on that domain (sub-3 inputs covered natively in
    // the interpreted-eval test below: empty output, no throw)
    val cases = List.fill(40)(List.fill(3 + rng.nextInt(9))(rng.nextLong())) ++
      List(List(1L, 2L, 3L), (1L to 12L).toList)
    val df = cases.map(v => Tuple1(v)).toDF("__arr")
    val rows = df.select(
        org.apache.spark.sql.graft.ColumnBridge.column(graft.expressions.TripleCombos(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("__arr")))).as("native"),
        expr(
          """flatten(transform(sequence(1, size(__arr) - 2), x ->
            |  flatten(transform(sequence(x + 1, size(__arr) - 1), y ->
            |    transform(sequence(y + 1, size(__arr)), z ->
            |      struct(element_at(__arr, x) AS a, element_at(__arr, y) AS b,
            |             element_at(__arr, z) AS c))))))""".stripMargin).as("hof"))
      .collect()
    rows.foreach { r =>
      // the HOF yields an EMPTY sequence() (not empty array) below n=3 —
      // normalize both sides to Seq of (a,b,c) triples
      def tri(i: Int) = r.getSeq[org.apache.spark.sql.Row](i)
        .map(s => (s.getLong(0), s.getLong(1), s.getLong(2)))
      assert(tri(0) === tri(1))
    }
  }

  test("SkipGramPairs matches the windowed sequence/transform HOF with canonical ordering") {
    val vocab = Vector("spark", "join", "window", "the", "a", "agg", "zz", "")
    val cases = List.fill(40)(List.fill(2 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))) ++
      List(List("b", "a"), List("x", "x", "x"))
    for (w <- Seq(1, 3, 5)) {
      val df = cases.map(v => Tuple1(v)).toDF("__t")
      val rows = df.select(
          org.apache.spark.sql.graft.ColumnBridge.column(graft.expressions.SkipGramPairs(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("__t")), w)).as("native"),
          expr(
            s"""flatten(transform(sequence(1, size(__t) - 1), i ->
               |  transform(sequence(i + 1, least(i + $w, size(__t))), j ->
               |    IF(element_at(__t, i) <= element_at(__t, j),
               |       struct(element_at(__t, i) AS a, element_at(__t, j) AS b),
               |       struct(element_at(__t, j) AS a, element_at(__t, i) AS b)))))"""
              .stripMargin).as("hof"))
        .collect()
      rows.foreach { r =>
        def prs(i: Int) = r.getSeq[org.apache.spark.sql.Row](i)
          .map(s => (s.getString(0), s.getString(1)))
        assert(prs(0) === prs(1))
      }
    }
    // sub-2 inputs: empty, never a throw (the HOF's descending sequence
    // domain starts at n=2, so this is native-only)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    for (v <- Seq(Seq.empty[String], Seq("one"))) {
      val got = graft.expressions.SkipGramPairs(
          Literal.create(v, ArrayType(StringType)), 3).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      assert(got.numElements() === 0)
    }
  }

  test("PairCombos matches the transform/slice/flatten pair comprehension") {
    val cases = List.fill(40)(List.fill(2 + rng.nextInt(9))(rng.nextLong())) ++
      List(List(1L, 2L), (1L to 12L).toList)
    val df = cases.map(v => Tuple1(v)).toDF("__arr")
    val rows = df.select(
        org.apache.spark.sql.graft.ColumnBridge.column(graft.expressions.PairCombos(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("__arr")))).as("native"),
        expr(
          """flatten(transform(__arr, (x, i) ->
            |  transform(slice(__arr, i + 2, size(__arr)), y ->
            |    struct(x AS p1, y AS p2))))""".stripMargin).as("hof"))
      .collect()
    rows.foreach { r =>
      def prs(i: Int) = r.getSeq[org.apache.spark.sql.Row](i)
        .map(s => (s.getLong(0), s.getLong(1)))
      assert(prs(0) === prs(1))
    }
    // string element type (the generic-element path) + sub-2 edges
    val sdf = Seq(Tuple1(Seq("b", "a", "c")), Tuple1(Seq("x")), Tuple1(Seq.empty[String]))
      .toDF("__arr")
    val got = sdf.select(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.PairCombos(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("__arr")))).as("p"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(s => (s.getString(0), s.getString(1))))
    assert(got(0) === Seq(("b", "a"), ("b", "c"), ("a", "c")))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("TripleCombos interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val arr = Literal.create(Seq(5L, 1L, 9L, 7L), ArrayType(LongType))
    val got = graft.expressions.TripleCombos(arr).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val triples = (0 until got.numElements()).map { i =>
      val s = got.getStruct(i, 3); (s.getLong(0), s.getLong(1), s.getLong(2))
    }
    // position-ordered i<j<k over the INPUT order, not value-sorted
    assert(triples === Seq((5L, 1L, 9L), (5L, 1L, 7L), (5L, 9L, 7L), (1L, 9L, 7L)))
    // sub-3 inputs: empty array out, never a throw
    for (n <- 0 to 2) {
      val small = Literal.create((1L to n).toSeq, ArrayType(LongType))
      assert(graft.expressions.TripleCombos(small).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements() === 0)
    }
  }

  test("TripleCombos rejects nullable-element arrays at analysis; PairCombos passes null slots through") {
    // TripleCombos reads primitives (getLong) — a null slot on unsafe rows
    // silently reads as 0L, so nullable element types must fail ANALYSIS,
    // not corrupt. array() of nullable longs types as containsNull=true.
    val nullable = Seq(Tuple1(1L)).toDF("x")
      .select(array(when(col("x") > 0, col("x"))).as("__arr"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      nullable.select(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.TripleCombos(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("__arr"))))).collect()
    }
    assert(e.getMessage.contains("non-nullable"))
    // PairCombos copies elements opaquely — the documented null contract:
    // a null slot emits structs with a null field, never a throw or a 0
    val prs = Seq(Tuple1(1L)).toDF("x")
      .select(array(lit(7L), when(col("x") < 0, col("x"))).as("__arr"))
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.PairCombos(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("__arr")))).as("p"))
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(prs.length === 1 && prs.head.getLong(0) === 7L && prs.head.isNullAt(1))
  }

  test("Quantize8 interpreted eval matches codegen and keeps null elements null") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit0 = Literal.create(Seq(12.7, -127.0, 0.0), ArrayType(DoubleType))
    val row = Quantize8(lit0).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getDouble(0) === 1.0)
    assert(row.getArray(1).toByteArray().toSeq === Seq[Byte](13, -127, 0))
    val withNull = Literal.create(Seq[Any](254.0, null), ArrayType(DoubleType))
    val row2 = Quantize8(withNull).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row2.getDouble(0) === 2.0)
    assert(row2.getArray(1).getByte(0) === 127.toByte)
    assert(row2.getArray(1).isNullAt(1))
    // the same values through the codegen'd column path
    val got = Seq(Tuple1(Seq(12.7, -127.0, 0.0))).toDF("v")
      .select(Ann.quantize8(col("v"))).head.getStruct(0)
    assert(got.getDouble(0) === 1.0)
    assert(got.getSeq[Byte](1) === Seq[Byte](13, -127, 0))
  }
}
