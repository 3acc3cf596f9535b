package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the exact-moment statistics operators (olsTrend, corrPairs)
  * and the deterministic journey operators (positionAttribution,
  * modePerKey). All expectations are hand-computed closed forms.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("olsTrend: exact line recovers slope/intercept/r2 = 1 exactly") {
    val df = Seq(("g", 1L, 3.0), ("g", 2L, 5.0), ("g", 3L, 7.0), ("g", 4L, 9.0))
      .toDF("grp", "x", "y")
    val r = Analytics.olsTrend(df, Seq(col("grp")), col("x"), col("y")).head()
    assert(r.getAs[Long]("n_obs") === 4L)
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === 1.0)
    assert(r.getAs[Double]("r2") === 1.0)
  }

  test("olsTrend: noisy group matches the hand-computed closed form") {
    // x=(0,1,2), y=(0,1,4): num=12, dx=6, dy=26
    val df = Seq(("g", 0L, 0.0), ("g", 1L, 1.0), ("g", 2L, 4.0)).toDF("grp", "x", "y")
    val r = Analytics.olsTrend(df, Seq(col("grp")), col("x"), col("y")).head()
    assert(r.getAs[Double]("slope") === 2.0)
    assert(r.getAs[Double]("intercept") === math.rint(-1.0 / 3 * 1e6) / 1e6)
    assert(r.getAs[Double]("r2") === math.rint(144.0 / (6 * 26) * 1e6) / 1e6)
  }

  test("olsTrend groups are independent") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 1L, 2.0), ("b", 2L, 1.0))
      .toDF("grp", "x", "y")
    val out = Analytics.olsTrend(df, Seq(col("grp")), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("slope")).toMap
    assert(out("a") === 1.0 && out("b") === -1.0)
  }

  test("olsTrend: degenerate groups yield NULL, not Inf/NaN") {
    // constant x → dx=0 (vertical line: slope undefined); constant y →
    // dy=0 (r2 undefined, slope/intercept still exist)
    val df = Seq(("cx", 5L, 1.0), ("cx", 5L, 2.0),
                 ("cy", 1L, 3.0), ("cy", 2L, 3.0)).toDF("grp", "x", "y")
    val rows = Analytics.olsTrend(df, Seq(col("grp")), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val cx = rows("cx")
    assert(cx.isNullAt(cx.fieldIndex("slope")) &&
      cx.isNullAt(cx.fieldIndex("intercept")) && cx.isNullAt(cx.fieldIndex("r2")))
    val cy = rows("cy")
    assert(cy.getAs[Double]("slope") === 0.0)
    assert(cy.getAs[Double]("intercept") === 3.0)
    assert(cy.isNullAt(cy.fieldIndex("r2")))
  }

  test("corrPairs: perfect, anti, and independent pairs") {
    // a ↑ with b (corr 1), anti with c (corr −1)
    val df = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0))
      .toDF("a", "b", "c")
    val out = Analytics.corrPairs(df,
        Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr_v")).toMap
    assert(out.size === 3)
    assert(out(("a", "b")) === 1.0)
    assert(out(("a", "c")) === -1.0)
    assert(out(("b", "c")) === -1.0)
  }

  test("corrPairs is one aggregate pass: no join or second scan in the plan") {
    val df = Seq((1.0, 2.0), (2.0, 1.0)).toDF("a", "b")
    val plan = Analytics.corrPairs(df, Seq("a" -> col("a"), "b" -> col("b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"corr matrix must not self-join:\n$plan")
  }

  test("positionAttribution: U-shape 40/20/40 with 1- and 2-touch renormalization") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "b"), (1L, 4L, "a"), // 4-touch
      (2L, 1L, "c"),                                              // 1-touch
      (3L, 1L, "d"), (3L, 2L, "e")                                // 2-touch
    ).toDF("user_id", "seq", "etype")
    val out = Analytics.positionAttribution(df, "user_id", Seq(col("seq")), "etype")
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("credit"), r.getAs[Long]("n_touches"))).toMap
    assert(out("a") === ((0.8, 2L)))  // first 0.4 + last 0.4
    assert(out("b") === ((0.2, 2L)))  // two interiors × 0.2/2
    assert(out("c") === ((1.0, 1L)))
    assert(out("d") === ((0.5, 1L)))
    assert(out("e") === ((0.5, 1L)))
  }

  test("positionAttribution: non-terminating interior share truncates at picocredits") {
    // 5 touches → 3 interiors of 0.2/3 each: 200000000000 div 3 picocredits
    val df = Seq((1L, 1L, "f"), (1L, 2L, "i1"), (1L, 3L, "i2"), (1L, 4L, "i3"),
      (1L, 5L, "l")).toDF("user_id", "seq", "etype")
    val out = Analytics.positionAttribution(df, "user_id", Seq(col("seq")), "etype")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("credit")).toMap
    val interior = math.rint((200000000000L / 3) / 1e12 * 1e6) / 1e6
    assert(out("i1") === interior && out("i2") === interior && out("i3") === interior)
    assert(out("f") === 0.4 && out("l") === 0.4)
  }

  test("emaTrunc: head rows renormalize over available history; full frame matches closed form") {
    // α=0.1: row1 = x1; row2 = (x2 + 0.9·x1)/1.9
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0)).toDF("k", "seq", "v")
    val out = Analytics.emaTrunc(df, "k", Seq(col("seq")), col("v"))
      .orderBy("seq").select("ema").as[Double].collect()
    assert(out(0) === 10.0)
    assert(out(1) === math.rint((20.0 + 0.9 * 10.0) / 1.9 * 1e6) / 1e6)
    assert(out(2) === math.rint((30.0 + 0.9 * 20.0 + 0.81 * 10.0) / 2.71 * 1e6) / 1e6)
  }

  test("emaTrunc: depth cuts the history — row depth+1 ignores the first value") {
    val df = (1 to 4).map(i => (1L, i.toLong, if (i == 1) 1000.0 else 1.0))
      .toDF("k", "seq", "v")
    val out = Analytics.emaTrunc(df, "k", Seq(col("seq")), col("v"), depth = 3)
      .orderBy("seq").select("ema").as[Double].collect()
    // row 4 sees only rows 2..4 (all 1.0) → exactly 1.0; row 3 still sees row 1
    assert(out(3) === 1.0)
    assert(out(2) > 1.0)
  }

  test("gapFillDaily: zero rows on gap days, span bounded per key") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1), (1L, "2024-01-03 09:00:00", 2),
      (1L, "2024-01-03 10:00:00", 3),
      (2L, "2024-02-10 00:00:00", 4)
    ).toDF("user_id", "s", "event_id").withColumn("ts", col("s").cast("timestamp"))
    val out = Analytics.gapFillDaily(df, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    assert(out.size === 4) // 3 days for key 1, 1 day for key 2 — no cross-key spine
    assert(out((1L, "2024-01-01")) === 1L)
    assert(out((1L, "2024-01-02")) === 0L)
    assert(out((1L, "2024-01-03")) === 2L)
    assert(out((2L, "2024-02-10")) === 1L)
  }

  test("madOutliers: hand-computed median/MAD and the single planted outlier") {
    // values 1..5 plus 100: median 3.5; adev {2.5,1.5,.5,.5,1.5,96.5} median 1.5
    // threshold 3·1.4826·1.5 = 6.6717 → only 100 is out
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0)).map(("g", _)).toDF("grp", "v")
    val r = Analytics.madOutliers(df, "grp", col("v")).head()
    assert(r.getAs[Double]("med") === 3.5)
    assert(r.getAs[Double]("mad") === 1.5)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Long]("n_total") === 6L)
  }

  test("marketBasket: pair counts, lift, and the support floor") {
    // baskets: {1,2,3}, {1,2}, {1,2}, {3}; N=4, n1=3, n2=3, n3=2, n12=3, n13=1, n23=1
    val df = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (30L, 2L), (40L, 3L)).toDF("basket", "item")
    val out = Analytics.marketBasket(df, "basket", "item", minPairCount = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getAs[Double]("lift")))).toMap
    assert(out.size === 1) // only (1,2) reaches support 2
    assert(out((1L, 2L)) === ((3L, math.rint(3.0 * 4 / (3.0 * 3) * 1e6) / 1e6)))
  }

  test("marketBasket: duplicate items in one basket count once") {
    val df = Seq((1L, 7L), (1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L)).toDF("b", "i")
    val out = Analytics.marketBasket(df, "b", "i", minPairCount = 2, k = 10).collect()
    assert(out.length === 1 && out.head.getLong(2) === 2L)
  }

  test("paretoFrontierByDate: dominated rows drop, same-date max ties both survive") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 10.0),  // frontier (first day max)
      (2L, "2024-01-01 00:00:00", 10.0),  // tie at the max — also frontier
      (3L, "2024-01-01 00:00:00", 5.0),   // dominated same-day
      (4L, "2024-01-02 00:00:00", 10.0),  // equal to prior max, later date → dominated
      (5L, "2024-01-03 00:00:00", 20.0),  // new max → frontier
      (6L, "2024-01-04 00:00:00", 15.0)   // below running max → dominated
    ).toDF("id", "s", "v").withColumn("ts", col("s").cast("timestamp"))
    val ids = Analytics.paretoFrontierByDate(df, "ts", "v")
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 5L))
  }

  test("modePerKey: most frequent wins; ties break to the smallest value") {
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "b"), (2L, "a"),             // tie → "a"
      (3L, "z")).toDF("k", "v")
    val out = Analytics.modePerKey(df, "k", "v")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("x", 2L)))
    assert(out(2L) === (("a", 1L)))
    assert(out(3L) === (("z", 1L)))
  }

  test("vocabCoverage: ordered ranks, monotone cumulative share reaching k-coverage") {
    val toks = Seq("a","a","a","b","b","c","d").map(Tuple1(_)).toDF("tok")
    val out = Analytics.vocabCoverage(toks, "tok", k = 3)
      .orderBy("rnk").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 2L, 1L))
    val shares = out.map(_.getAs[Double]("cum_share")).toSeq
    assert(shares === Seq(math.rint(3.0/7*1e6)/1e6, math.rint(5.0/7*1e6)/1e6,
      math.rint(6.0/7*1e6)/1e6))
  }

  test("dowProfile: ISO weekday, per-group share sums to 1") {
    val df = Seq(
      ("x", "2024-01-01 10:00:00", 10.0), // Monday → 1
      ("x", "2024-01-07 10:00:00", 30.0), // Sunday → 7
      ("x", "2024-01-08 10:00:00", 50.0), // Monday → 1
      ("y", "2024-01-06 10:00:00", 7.0)   // Saturday → 6
    ).toDF("g", "s", "v").withColumn("ts", col("s").cast("timestamp"))
    val out = Analytics.dowProfile(df, "g", "ts", col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getAs[Double]("avg_v"), r.getAs[Double]("share")))).toMap
    assert(out(("x", 1L)) === ((2L, 30.0, 0.666667)))
    assert(out(("x", 7L)) === ((1L, 30.0, 0.333333)))
    assert(out(("y", 6L)) === ((1L, 7.0, 1.0)))
  }

  test("runs: islands split on state change, positions 1-based, keys independent") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "a"),
      (2L, 1L, "a")
    ).toDF("user_id", "seq", "st")
    val out = Analytics.runs(df, "user_id", Seq(col("seq")), "st")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)) -> r.getLong(2)).toMap
    // key 1: [a,a] start 1, [b] start 3, [a] start 4; key 2: [a] start 1
    assert(out === Map((1L, "a", 1L) -> 2L, (1L, "b", 3L) -> 1L,
      (1L, "a", 4L) -> 1L, (2L, "a", 1L) -> 1L))
  }

  test("hhi: monopoly is 1, an even n-way split is 1/n") {
    val df = Seq(("m", 1L), ("m", 1L), ("m", 1L),
      ("e", 1L), ("e", 2L), ("e", 3L), ("e", 4L)).toDF("g", "member")
    val out = Analytics.hhi(df, "g", "member")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getAs[Double]("hhi")))).toMap
    assert(out("m") === ((1L, 1.0)))
    assert(out("e") === ((4L, 0.25)))
  }

  test("hhi weights members by row count, not presence") {
    // shares 3/4 and 1/4 → 9/16 + 1/16 = 0.625
    val df = Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 2L)).toDF("g", "member")
    val r = Analytics.hhi(df, "g", "member").head()
    assert(r.getAs[Double]("hhi") === 0.625)
  }

  test("twoProportionZ: hand-computed z and the degenerate-pool NULL") {
    val units = (1 to 100).map(i => (i.toLong % 2, if (i % 2 == 0) (if (i <= 60) 1L else 0L)
      else (if (i <= 20) 1L else 0L)))
      .toDF("cohort", "success")
    val r = Analytics.twoProportionZ(units, col("cohort"), col("success")).head()
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na === 50L && nb === 50L)
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val pool = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    assert(r.getAs[Double]("z") === math.rint(z * 1e6) / 1e6)
    assert(r.getAs[Boolean]("significant") === (math.abs(z) > 1.96))
    // all-success pool: variance 0 → z is NULL, not an error
    val degen = Seq((0L, 1L), (1L, 1L)).toDF("cohort", "success")
    val dr = Analytics.twoProportionZ(degen, col("cohort"), col("success")).head()
    assert(dr.isNullAt(dr.fieldIndex("z")))
  }

  test("profileTable: nulls, distincts, native-type min/max, no Expand") {
    val df = Seq((1L, Some("b"), Some(10.0)), (2L, Some("a"), None),
      (3L, None, Some(2.0)), (3L, Some("a"), Some(100.0)))
      .toDF("id", "s", "v")
    val prof = Analytics.profileTable(df, Seq(
      "id" -> col("id"), "s" -> col("s"), "v" -> col("v").cast("decimal(6,1)")))
    val out = prof.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(out("id") === ((4L, 0L, 3L, "1", "3")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))
    // numeric min/max, NOT lexicographic: 2.0 < 10.0 < 100.0
    assert(out("v") === ((4L, 1L, 3L, "2.0", "100.0")))
    val plan = prof.queryExecution.executedPlan.toString
    // distincts are per-column HASH censuses: no Expand (the multi-distinct
    // plan that sorted |cols|·n expanded rows through keyed SortAggregates),
    // and the only joins are the 1-row broadcast reassembly crossjoins
    assert(!plan.contains("Expand"), s"multi-distinct Expand is back:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"reassembly must be 1-row broadcasts:\n$plan")
  }

  test("profileTable: NaN is a distinct non-null value (countDistinct semantics)") {
    // the census filters isNotNull, NOT na.drop() — na.drop would silently
    // drop NaN, undercounting n_distinct vs the countDistinct it replaced
    val df = Seq(Some(1.0), Some(Double.NaN), None, Some(1.0)).toDF("x")
    val p = Analytics.profileTable(df, Seq("x" -> col("x"))).head()
    assert(p.getLong(1) === 4L && p.getLong(2) === 1L) // n_rows, n_nulls
    assert(p.getLong(3) === 2L, "1.0 and NaN are two distinct values")
  }

  test("peakConcurrency: overlapping intervals, half-open ends, first peak instant") {
    // [0,10) [5,15) [5,8) overlap 3-deep on [5,8); [15,20) touches (not concurrent)
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val iv = Seq((0L, 10L), (5L, 15L), (5L, 8L), (15L, 20L))
      .map { case (a, b) => (ts(a * 1000000), ts(b * 1000000)) }
      .toDF("st", "en")
    val r = Analytics.peakConcurrency(iv, col("st"), col("en")).head()
    assert(r.getLong(0) === 3L)
    assert(r.getTimestamp(1).getTime === 5000000L / 1000)
  }

  test("peakConcurrency: back-to-back intervals never overlap (end releases first)") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val iv = Seq((ts(0), ts(10)), (ts(10), ts(20))).toDF("st", "en")
    assert(Analytics.peakConcurrency(iv, col("st"), col("en")).head().getLong(0) === 1L)
  }

  test("twap holds each value until the next observation") {
    // user 1: 10.0 held 3s, 40.0 held 1s → (10·3 + 40·1)/4 = 17.5
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 10.0),
      (1L, "2024-01-01 00:00:03", 2L, 40.0),
      (1L, "2024-01-01 00:00:04", 3L, 7.0)
    ).toDF("user_id", "s", "event_id", "value").withColumn("ts", col("s").cast("timestamp"))
    val out = Analytics.twap(df, "user_id", "ts", Seq(col("event_id")), col("value"))
    val r = out.head()
    assert(r.getLong(1) === 4000000L)
    assert(r.getAs[Double]("twap") === 17.5)
  }

  test("cusum changepoint: hand-computed peak on a step series") {
    // daily sums 1,1,10,10: S=22, n=4, cum=(1,2,12,22),
    // stat_k=|4*cum - k*22| = (18,36,18,0) → peak at day 2, stat 36/4 = 9
    val df = Seq(
      ("g", "2024-01-01 01:00:00", 1.0), ("g", "2024-01-02 01:00:00", 1.0),
      ("g", "2024-01-03 01:00:00", 10.0), ("g", "2024-01-04 01:00:00", 10.0)
    ).toDF("event_type", "s", "value").withColumn("ts", col("s").cast("timestamp"))
    // replicate the query shape over the fixture via the SparkEntry formula
    val daily = df.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("s"))
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("s")).as("t"), count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val r = daily
      .withColumn("cum", sum(col("s")).over(
        w.rowsBetween(Long.MinValue, 0)))
      .withColumn("k", row_number().over(w))
      .join(tot, "event_type")
      .withColumn("stat", abs(col("n").cast("decimal(10,0)") * col("cum") -
        col("k").cast("decimal(10,0)") * col("t")))
      .orderBy(col("stat").desc, col("day")).limit(1)
      .select(col("day").cast("string"), (col("stat").cast("double") / col("n")).as("v"))
      .head()
    assert(r.getString(0) === "2024-01-02")
    assert(r.getDouble(1) === 9.0)
  }

  test("ksDrift: hand-computed D, argmax bucket, and tie → smallest bucket") {
    // A buckets [1,1,2], B buckets [1,3,3]: ECDF gaps 1/3, 2/3, 0 → D at 2
    val df = Seq((1L, true), (1L, true), (2L, true),
      (1L, false), (3L, false), (3L, false)).toDF("b", "a")
    val r = Analytics.ksDrift(df, col("b"), col("a")).head()
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L)))
    assert(r.getDouble(2) === 0.666667)
    assert(r.getLong(3) === 2L)
    // A [1,3], B [2,4]: gaps .5, 0, .5, 0 — tie broken to bucket 1
    val tie = Seq((1L, true), (3L, true), (2L, false), (4L, false)).toDF("b", "a")
    val rt = Analytics.ksDrift(tie, col("b"), col("a")).head()
    assert(rt.getDouble(2) === 0.5)
    assert(rt.getLong(3) === 1L)
  }

  test("poissonBootstrapCI: constant column collapses the interval; bounds bracket the mean") {
    // constant x: every resample mean is exactly 7 regardless of weights
    val const = (1L to 50L).map(i => (i, 7L)).toDF("id", "x")
    val c = Analytics.poissonBootstrapCI(const, col("id"), col("x"), b = 100).head()
    assert((c.getDouble(1), c.getDouble(2), c.getDouble(3)) === ((7.0, 7.0, 7.0)))
    // varying x: ci_lo <= mean <= ci_hi and the bounds are distinct
    val varied = (1L to 200L).map(i => (i, i % 13)).toDF("id", "x")
    val v = Analytics.poissonBootstrapCI(varied, col("id"), col("x"), b = 100).head()
    assert(v.getDouble(2) <= v.getDouble(1) && v.getDouble(1) <= v.getDouble(3))
    assert(v.getDouble(2) < v.getDouble(3))
  }

  test("Poisson(1) CDF ppm table matches the formula") {
    // floor(1e6 · e^-1 · Σ_{j=0}^{k} 1/j!) for k = 0..7 — re-derived here
    // so the inverse-CDF ladder cannot silently drift from its definition.
    val derived = (0 to 7).map { k =>
      val partial = (0 to k).map(j => 1.0 / (1L to j).map(_.toDouble).product).sum
      math.floor(1e6 * math.exp(-1.0) * partial).toLong
    }
    assert(Analytics.PoissonCdfPpm === derived)
  }

  test("neymanAllocation: sigma-weighted seats, largest-remainder, exact-sum budget") {
    // A: [0,2] → σ=√2, w=2828427 ppm; B: [0,4] → σ=2√2, w=5656854 ppm.
    // S=10: base A=3 (rem 2828427), B=6 (rem 5656854); leftover 1 → B.
    val df = Seq(("A", 0L), ("A", 2L), ("B", 0L), ("B", 4L)).toDF("g", "x")
    val out = Analytics.neymanAllocation(df, "g", col("x"), 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out === Map("A" -> (2L, 2828427L, 3L), "B" -> (2L, 5656854L, 7L)))
    assert(out.values.map(_._3).sum === 10L) // seats sum to the budget exactly
    // a single-member stratum has zero variance: no seats, no divide error
    val deg = Seq(("A", 0L), ("A", 2L), ("C", 9L)).toDF("g", "x")
    val d2 = Analytics.neymanAllocation(deg, "g", col("x"), 10L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(d2 === Map("A" -> 10L, "C" -> 0L))
  }

  test("mannWhitney: midrank identity, tie term, and the hand-computed z") {
    // A buckets [1,2], B buckets [2,3]: ranks 1, 2.5 | 2.5, 4.
    // 2R_A = 7 → u2 = 2U_A = 7 − 2·3 = 1; ties: one pair at b=2 → 2³−2 = 6.
    // var = (4/12)·(5 − 6/12) = 1.5 → z = (1 − 4)/(2·√1.5) = −1.224745.
    val df = Seq((1L, true), (2L, true), (2L, false), (3L, false)).toDF("b", "a")
    val r = Analytics.mannWhitney(df, col("b"), col("a")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 2L, 1L, 6L)))
    assert(r.getDouble(4) === -1.224745)
    // all values tied in one bucket: variance collapses to 0 → z is NULL
    val flat = Seq((1L, true), (1L, false)).toDF("b", "a")
    assert(Analytics.mannWhitney(flat, col("b"), col("a")).head().isNullAt(4))
  }

  test("kmvDistinct: exact below k, k-th-minimum estimate above, multiplicity-invariant") {
    val df = Seq("g" -> "x", "g" -> "y", "g" -> "z", "g" -> "x").toDF("k", "v")
    val r = Analytics.kmvDistinct(df, "k", col("v"), k = 8).head()
    assert(r.getLong(1) === 3L)          // summary below k is the exact count
    assert(r.getDouble(3) === 3.0)
    // above k: summary = the 4 smallest signed FNV hashes; estimate is the
    // documented one-expression function of (k, h_k)
    val items = (0 until 10).map(i => "g" -> s"item$i")
    val withDups = items ++ items ++ items  // duplicates must not move the sketch
    val out = Analytics.kmvDistinct(withDups.toDF("k", "v"), "k", col("v"), k = 4).head()
    val hashes = (0 until 10)
      .map(i => graft.expressions.Fnv1a.hash(s"item$i".getBytes("UTF-8"))).sorted
    val hk = hashes(3)
    assert(out.getLong(1) === 4L)
    assert(out.getLong(2) === hk)
    val est = BigDecimal(3.0 / ((hk.toDouble + math.pow(2, 63)) / math.pow(2, 64)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(3) === est)
  }

  test("null scope rules: null buckets/values/ids are OUT, not skew") {
    // ksDrift: a null-bucket row must leave the totals too (it can never
    // participate in the banded cumulative)
    val df = Seq((Some(1L), true), (Some(1L), true), (Some(2L), true),
      (Some(1L), false), (Some(3L), false), (Some(3L), false),
      (None, true), (None, false)).toDF("b", "a")
    val r = Analytics.ksDrift(df, col("b"), col("a")).head()
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L))) // nulls not counted
    assert(r.getDouble(2) === 0.666667)
    // kmvDistinct: null values leave the sketch unchanged (no NULL h_k)
    val withNull = Seq("g" -> Some("x"), "g" -> None, "g" -> Some("y"))
      .toDF("k", "v")
    val kv = Analytics.kmvDistinct(withNull, "k", col("v"), k = 4).head()
    assert(kv.getLong(1) === 2L)
    assert(kv.getDouble(3) === 2.0)
    // poissonBootstrapCI: a null-id row is out of scope, not weight-8
    val ids = (1L to 50L).map(i => (Some(i), 7L)) :+ ((None: Option[Long], 999999L))
    val ci = Analytics.poissonBootstrapCI(ids.toDF("id", "x"), col("id"),
      col("x"), b = 100).head()
    assert((ci.getDouble(1), ci.getDouble(2), ci.getDouble(3)) === ((7.0, 7.0, 7.0)))
  }

  test("tCloseness: hand-computed ppm EMD; single bucket → t = 0") {
    // X all in bucket 1, Y all in bucket 2; global is 50/50 → both groups
    // are |1 − 0.5| = 0.5 away at bucket 1, 0 at bucket 2 → t = 0.5
    val df = Seq(("X", 1L), ("X", 1L), ("Y", 2L), ("Y", 2L)).toDF("g", "b")
    val out = Analytics.tCloseness(df, Seq("g"), col("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out === Map("X" -> (2L, 500000L, 0.5), "Y" -> (2L, 500000L, 0.5)))
    // one occupied bucket: EMD domain is a point → t defined as 0
    val flat = Seq(("X", 1L), ("Y", 1L)).toDF("g", "b")
    val t0 = Analytics.tCloseness(flat, Seq("g"), col("b"))
      .collect().map(r => r.getDouble(3))
    assert(t0.forall(_ === 0.0))
  }
}
