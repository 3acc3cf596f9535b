package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ZCA whitening: eigen-solver against hand-computable matrices, the
  * whitening identity on a deliberately skewed corpus, and the contracts
  * (symmetry, degenerate-direction behavior).
  */
class WhiteningSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen recovers the spectrum of a hand-computable symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1 (vectors along (1,1)/(1,-1))
    val (vals, vecs) = Whitening.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 })
    // columns are orthonormal: VᵀV == I
    for (a <- 0 until 2; b <- 0 until 2) {
      val dot = (0 until 2).map(i => vecs(i)(a) * vecs(i)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-12)
    }
    // reconstruction: V Λ Vᵀ == A
    for (i <- 0 until 2; j <- 0 until 2) {
      val r = (0 until 2).map(m => vecs(i)(m) * vals(m) * vecs(j)(m)).sum
      assert(math.abs(r - (if (i == j) 2.0 else 1.0)) < 1e-12)
    }
  }

  test("fitZca + whiten produce identity covariance and zero mean on a skewed corpus") {
    // 3-dim corpus with strong cross-correlation and wildly unequal scales:
    // x ~ base, y = 10x + noise, z independent small — deterministic LCG
    val rows = (0 until 500).map { i =>
      val a = ((i * 2654435761L) % 1000L).toDouble / 1000.0
      val b = ((i * 40503L + 17L) % 1000L).toDouble / 1000.0
      val c = ((i * 69069L + 5L) % 1000L).toDouble / 1000.0
      (i.toLong, Seq(a + 5.0, 10.0 * a + 0.3 * b, 0.01 * c - 2.0))
    }
    val df = rows.toDF("id", "v")
    val model = Whitening.fitZca(df, "v")
    // W symmetric (the ZCA property)
    val d = model.mean.length
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(model.w(i)(j) - model.w(j)(i)) < 1e-9, "W must be symmetric")
    val white = Whitening.whiten(df, "id", "v", model)
      .collect().map(_.getSeq[Double](1).toArray)
    val n = white.length.toDouble
    val mean = Array.tabulate(d)(i => white.map(_(i)).sum / n)
    mean.foreach(m => assert(math.abs(m) < 1e-9, s"whitened mean must be 0, got $m"))
    for (i <- 0 until d; j <- 0 until d) {
      val cov = white.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov - want) < 1e-6, s"cov($i,$j)=$cov != $want")
    }
  }

  test("a degenerate (constant) dimension whitens toward zero, not infinity") {
    val df = (0 until 100).map(i =>
      (i.toLong, Seq(i.toDouble / 100.0, 7.0))).toDF("id", "v")
    val model = Whitening.fitZca(df, "v")
    val white = Whitening.whiten(df, "id", "v", model)
      .collect().map(_.getSeq[Double](1).toArray)
    // dim 1 is constant: centered value is exactly 0, and the eps-bounded
    // scale keeps the output finite and ~0 (the stated contract)
    white.foreach { v =>
      assert(java.lang.Double.isFinite(v(1)))
      assert(math.abs(v(1)) < 1e-3)
    }
  }

  test("plan audit: whiten() is MAP-ONLY — zero exchanges in the apply stage") {
    val df = (0 until 50).map(i =>
      (i.toLong, Seq(i.toDouble, 2.0 * i, 1.0 - i))).toDF("id", "v")
    val model = Whitening.fitZca(df, "v")
    val plan = Whitening.whiten(df, "id", "v", model)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"whitening apply must not shuffle, got ${exchanges.length} exchange(s)")
  }

  test("q_embed_whiten emits the exact invariant literal on the real corpus (sf0.001)") {
    // the driver oracle is a literal (mean 0 / var 1 / offdiag 0 at 4 dp);
    // this pins the Spark side to it BEFORE the driver gate does, on the
    // same corpus family the gate uses
    val out = graft.SparkEntry.queries("q_embed_whiten")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length === 64)
    assert(out.map(_._1).sorted.toSeq === (0L until 64L))
    out.foreach { case (dim, m, v, o) =>
      assert(m === 0.0, s"mean_w($dim)")
      assert(v === 1.0, s"var_w($dim)")
      assert(o === 0.0, s"max_abs_offdiag($dim)")
    }
  }

  test("whiten at production dims (d=512): codegen compiles and matches a " +
       "driver-side mat-vec") {
    // the per-dim DotProduct formulation embedded d² literal doubles in one
    // projection — at d=512 that risks the 64 KB JVM method limit in
    // WholeStageCodegen; the fused ZcaWhiten expression carries W/μ as
    // referenced arrays, so this spec pins both "it compiles at real dims"
    // and bit-parity with the naive loop
    val d = 512
    val rnd = new scala.util.Random(7)
    val n = 20
    val rows = (0 until n).map(i =>
      (i.toLong, Seq.fill(d)(rnd.nextDouble() - 0.5)))
    val df = rows.toDF("id", "v")
    // a dense non-trivial Whitener (not fitted — fit is O(d³) driver time
    // and already covered; apply is what changes shape at d=512)
    val mean = Array.fill(d)(rnd.nextDouble() * 0.1)
    val w = Array.fill(d, d)(0.0)
    for (i <- 0 until d; j <- 0 to i) {
      val x = (rnd.nextDouble() - 0.5) / d
      w(i)(j) = x; w(j)(i) = x // symmetric like any real ZCA matrix
    }
    val model = Whitening.Whitener(mean, w, Array.fill(d)(1.0))
    val got = Whitening.whiten(df, "id", "v", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    rows.foreach { case (id, v) =>
      val c = Array.tabulate(d)(j => v(j) - mean(j))
      val want = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += w(i)(j) * c(j); j += 1 }
        s
      }
      val g = got(id)
      assert(g.length === d)
      var i = 0
      while (i < d) {
        assert(g(i) === want(i), s"row $id dim $i") // bit-exact, same IEEE order
        i += 1
      }
    }
  }

  test("two whiten plans from the same model are structurally equal " +
       "(ArraySeq fields — canonicalization/CSE can dedupe them)") {
    val df = (0 until 10).map(i =>
      (i.toLong, Seq(i.toDouble, 1.0 - i))).toDF("id", "v")
    val model = Whitening.fitZca(df, "v")
    val a = Whitening.whiten(df, "id", "v", model).queryExecution
      .analyzed.canonicalized
    val b = Whitening.whiten(df, "id", "v", model).queryExecution
      .analyzed.canonicalized
    assert(a === b,
      "raw Array fields would compare by reference and break this")
  }

  test("the mat-vec kernel rejects null vector elements loudly") {
    // on unsafe rows a null slot would read as 0.0 and mis-score silently;
    // the kernel's contract is dense vectors, enforced, never guessed
    val e = intercept[IllegalArgumentException] {
      graft.expressions.MatVecUtil.whiten(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](1.0, null)),
        Array(1.0, 0.0, 0.0, 1.0), Array(0.0, 0.0))
    }
    assert(e.getMessage.contains("null element"), e.getMessage)
  }

  test("whiten rejects a vector whose length differs from the fitted dim") {
    val model = Whitening.Whitener(Array(0.0, 0.0),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), Array(1.0, 1.0))
    val df = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val e = intercept[Exception] {
      Whitening.whiten(df, "id", "v", model).collect()
    }
    assert(e.getMessage != null)
  }

  test("GramMatrixAgg matches a driver-side exact accumulation") {
    val vecs = (0 until 200).map(i =>
      Seq(i.toDouble, (i % 7).toDouble, math.sin(i.toDouble)))
    val g = vecs.map(v => (0L, v)).toDF("k", "v")
      .repartition(8) // force real merges across partial buffers
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.GramMatrixAgg(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            col("v").cast("array<double>")))).as("g"))
      .head().getSeq[Double](0).toArray
    assert(g(0) === 200.0)
    for (i <- 0 until 3)
      assert(math.abs(g(1 + i) - vecs.map(_(i)).sum) < 1e-8)
    var k = 4
    for (i <- 0 until 3; j <- i until 3) {
      val want = vecs.map(v => v(i) * v(j)).sum
      assert(math.abs(g(k) - want) < 1e-7, s"xx($i,$j)")
      k += 1
    }
  }
}
