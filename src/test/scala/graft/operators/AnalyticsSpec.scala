package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: gap > threshold starts a new session; ties broken deterministically") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1),
      (1L, ts("2024-01-01 10:10:00"), 2),  // same session (10 min)
      (1L, ts("2024-01-01 11:00:00"), 3),  // 50 min gap → new session
      (2L, ts("2024-01-01 10:00:00"), 4)   // other key independent
    ).toDF("user_id", "ts", "event_id")
    val out = Analytics.sessionize(events, "ts", "user_id", gapSeconds = 1800,
        orderCols = Seq(col("event_id")))
      .select("event_id", "session_seq")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(1 -> 1L, 2 -> 1L, 3 -> 2L, 4 -> 1L))
  }

  test("sessionize compares gaps at microsecond precision") {
    val base = ts("2024-01-01 10:00:00")
    val justUnder = new Timestamp(base.getTime + 1800 * 1000); justUnder.setNanos(0)
    val justOver = new Timestamp(base.getTime + 1800 * 1000); justOver.setNanos(1000) // +1 µs
    val events = Seq((1L, base, 1), (1L, justUnder, 2), (2L, base, 3), (2L, justOver, 4))
      .toDF("user_id", "ts", "event_id")
    val out = Analytics.sessionize(events, "ts", "user_id", gapSeconds = 1800,
        orderCols = Seq(col("event_id")))
      .select("event_id", "session_seq")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(2) === 1L) // exactly the gap → same session (strict >)
    assert(out(4) === 2L) // one microsecond past the gap → new session
  }

  test("rangedRank matches the engine window functions exactly, at any shard count") {
    import org.apache.spark.sql.expressions.Window
    // 3 statuses (the q_percent_rank shape), many order-prefix ties so shard
    // boundaries land inside tie runs; event_id makes the ordering total
    val rows = (1L to 500L).map(i => (i, Seq("A", "B", "C")((i % 3).toInt), (i % 17).toInt))
    val df = rows.toDF("id", "status", "price").repartition(13)
    val w = Window.partitionBy(col("status")).orderBy(col("price"), col("id"))
    val expect = df.select(col("id"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"),
        ntile(4).over(w).cast("long").as("t4"), ntile(7).over(w).cast("long").as("t7"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    for (shards <- Seq(1, 4, 32)) {
      val got = Analytics.rangedRank(df, Seq("status"),
          Seq(col("price"), col("id")), shards = shards)
        .select(col("id"), Analytics.percentRankOf(col("rn"), col("n_part")).as("pr"),
          Analytics.cumeDistOf(col("rn"), col("n_part")).as("cd"),
          Analytics.ntileOf(col("rn"), col("n_part"), 4).as("t4"),
          Analytics.ntileOf(col("rn"), col("n_part"), 7).as("t7"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
      assert(got === expect, s"shards=$shards") // bit-identical doubles, exact tiles
    }
  }

  test("rangedRank prefix cache: same sort shares one sample; different data never does") {
    Analytics.prefixCache.clear()
    val df = (1L to 300L).map(i => (i, (i % 5).toInt)).toDF("id", "v")
    val r1 = Analytics.rangedRank(df, Nil, Seq(col("v"), col("id")), shards = 8)
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Analytics.prefixCache.size === 1)
    // second query over the SAME sort (q_ntile + q_percent_rank shape): the
    // sampling and counting passes are served from cache, rows identical
    val r2 = Analytics.rangedRank(df, Nil, Seq(col("v"), col("id")), shards = 8)
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Analytics.prefixCache.size === 1)
    assert(r2 === r1)
    // DIFFERENT data with the same shape must miss the cache and stay exact
    val df2 = (1L to 120L).map(i => (i, (i % 3).toInt)).toDF("id", "v")
    val r3 = Analytics.rangedRank(df2, Nil, Seq(col("v"), col("id")), shards = 8)
      .select("rn").collect().map(_.getLong(0)).sorted.toSeq
    assert(Analytics.prefixCache.size === 2)
    assert(r3 === (1L to 120L))
  }

  test("rangedRank prefix cache: an overwritten parquet path never serves stale offsets") {
    Analytics.prefixCache.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_rankcache").toString
    (1L to 200L).map(i => (i, (i % 7).toInt)).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    val r1 = Analytics.rangedRank(spark.read.parquet(dir), Nil,
        Seq(col("v"), col("id")), shards = 8)
      .select("rn", "n_part").collect()
    assert(r1.forall(_.getLong(1) === 200L))
    // overwrite the SAME path with different data: plan canonicalization
    // compares scans by path, so only the file-listing fingerprint in the
    // cache key keeps this from reusing the 200-row prefix table
    (1L to 80L).map(i => (i, (i % 3).toInt)).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    val r2 = Analytics.rangedRank(spark.read.parquet(dir), Nil,
        Seq(col("v"), col("id")), shards = 8)
      .select("rn", "n_part").collect()
    assert(r2.forall(_.getLong(1) === 80L))
    assert(r2.map(_.getLong(0)).sorted.toSeq === (1L to 80L))
  }

  test("rangedRank with no partition columns: a global total-order rank, sharded") {
    val df = (1L to 100L).map(i => (i, (i * 37 % 100).toInt)).toDF("id", "v")
    val out = Analytics.rangedRank(df, Nil, Seq(col("v"), col("id")), shards = 8)
      .select("rn", "n_part").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).sorted.toSeq === (1L to 100L))
    assert(out.forall(_._2 === 100L))
  }

  test("topPerKey keeps k rows per key in order") {
    val df = Seq((1, 10.0), (1, 30.0), (1, 20.0), (1, 40.0), (2, 5.0))
      .toDF("k", "v")
    val out = Analytics.topPerKey(df, col("k"), Seq(col("v").desc), 2)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getInt(2))).toSet
    assert(out === Set((1, 40.0, 1), (1, 30.0, 2), (2, 5.0, 1)))
  }

  test("asofJoin matches a brute-force per-row maximum") {
    val rng = new scala.util.Random(13)
    // right timestamps distinct per key by construction (i * 1s offsets)
    val rightRows = (1 to 80).map { i =>
      ((i % 4).toLong, new Timestamp(1700000000000L + i * 1000L), i.toDouble)
    }
    val leftRows = (1 to 60).map { i =>
      (i, rng.nextInt(4).toLong, new Timestamp(1700000000000L + rng.nextInt(100) * 1000L + 500L))
    }
    val left = leftRows.toDF("id", "k", "ts")
    val right = rightRows.toDF("k", "ts", "v")
    val got = Analytics.asofJoin(left, right, "k", "ts", "ts", Seq("v"))
      .collect().map(r => r.getInt(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    // brute force: per left row the v of the max right ts <= left ts
    leftRows.foreach { case (id, k, lts) =>
      val candidates = rightRows.filter { case (rk, rts, _) => rk == k && !rts.after(lts) }
      val expected = if (candidates.isEmpty) None
        else Some(candidates.maxBy { case (_, rts, _) => rts.getTime }._3)
      assert(got(id) === expected, s"left row $id key $k ts $lts")
    }
  }

  test("asofJoin includes right rows at exactly the left timestamp") {
    val t0 = ts("2024-01-01 00:00:00")
    val left = Seq((1, 7L, t0)).toDF("id", "k", "ts")
    val right = Seq((7L, t0, 42.0)).toDF("k", "ts", "v")
    val got = Analytics.asofJoin(left, right, "k", "ts", "ts", Seq("v")).collect()
    assert(got.head.getDouble(3) === 42.0)
  }

  test("approx_count_distinct tracks the exact distinct count within its error bound (sf0.01 events)") {
    // q_approx_distinct has no SQL oracle (HLL sketches are engine-specific);
    // this pins the estimate to the exact count on real data instead. rsd =
    // 0.01 → allow 5 sigma ≈ 5% before flagging.
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val rows = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.01).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact drifts > 5%")
    }
  }

  test("approx_percentile lands inside the rank-error band of the exact percentile (sf0.01 events)") {
    // accuracy 1000 → rank error ≤ 0.1%; the sketch's median must sit
    // between the exact 49.5th and 50.5th percentiles (generous 5x margin)
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val rows = ev.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("approx"),
        expr("percentile(value, 0.495)").as("lo"),
        expr("percentile(value, 0.505)").as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(a >= lo && a <= hi, s"${r.getString(0)}: approx median $a outside [$lo, $hi]")
    }
  }

  test("topPerKeyAgg equals the window formulation row-for-row on the sf0.01 corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val scored = docs.select(col("lang"), col("doc_id"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
    val window = Analytics.topPerKey(scored, col("lang"),
        Seq(col("quality").desc, col("doc_id")), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // repartition(13) forces multi-buffer merges AND buffer serialization
    // through the partial->final shuffle — the paths a 1-partition run skips
    val agg = Analytics.topPerKeyAgg(scored.repartition(13), "lang",
        ordAsc = Seq(negate(col("quality")), col("doc_id")),
        payload = Seq("doc_id" -> col("doc_id"), "quality" -> col("quality")), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(agg === window)
    assert(agg.size === 25) // 5 languages x top-5
  }

  test("topPerKeyAgg: k larger than the group, ties broken by the tiebreak field") {
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 2.0), ("a", 3L, 9.0), ("b", 4L, 1.0))
      .toDF("key", "id", "score")
    val out = Analytics.topPerKeyAgg(df, "key",
        ordAsc = Seq(negate(col("score")), col("id")),
        payload = Seq("id" -> col("id")), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet === Set(("a", 3L, 1), ("a", 1L, 2), ("a", 2L, 3), ("b", 4L, 1)))
  }

  test("rollupAgg labels grouping-set nulls and keeps leaf rows") {
    val df = Seq(("r1", "n1", 10.0), ("r1", "n2", 20.0), ("r2", "n3", 5.0))
      .toDF("region", "nation", "rev")
    val out = Analytics.rollupAgg(df, Seq(col("region"), col("nation")),
        Seq(sum(col("rev")).as("rev")))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(out(("r1", "n1")) === 10.0)
    assert(out(("r1", "ALL")) === 30.0)
    assert(out(("ALL", "ALL")) === 35.0)
    assert(out.size === 6) // 3 leaves + 2 region subtotals + 1 grand total
  }

  test("bm25TopK matches the closed-form score and ranks rare-term matches first") {
    val df = Seq(
      (1L, "spark spark spark filler filler filler filler filler"),
      (2L, "spark join filler filler"),
      (3L, "join filler filler filler filler filler filler filler"),
      (4L, "filler filler filler filler"),
      (5L, "SPARK and nothing else here")).toDF("doc_id", "text")
    val out = Analytics.bm25TopK(df, "doc_id", "text",
        terms = Seq("spark", "join"), k = 5, k1 = 1.5, b = 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // replay the formula by hand: N=5, avgdl=(8+4+8+4+5)/5=5.8,
    // df(spark)=3 (docs 1,2,5 — tokenizer lowers), df(join)=2
    val n = 5.0; val avgdl = 29.0 / 5.0
    def idf(dfT: Double) = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
    def part(tf: Double, dl: Double, i: Double) =
      i * (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * dl / avgdl))
    def score(tfS: Double, tfJ: Double, dl: Double) =
      part(tfS, dl, idf(3.0)) + part(tfJ, dl, idf(2.0))
    val expect = Map(
      1L -> score(3, 0, 8), 2L -> score(1, 1, 4), 3L -> score(0, 1, 8),
      4L -> score(0, 0, 4), 5L -> score(1, 0, 5))
    out.foreach { case (id, s) =>
      assert(math.abs(s - expect(id)) < 1e-6, s"doc $id: $s vs ${expect(id)}")
    }
    // doc 2 (both terms, short) outranks the single-term docs; no-term doc last
    assert(out.head._1 === 2L)
    assert(out.last._1 === 4L && out.last._2 === 0.0)
    // descending by score
    val scores = out.map(_._2).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("invertedIndex: exact df/cf, postings bounded to the k smallest doc ids") {
    val docs = Seq(
      (10L, "the cat sat"),
      (7L, "The the dog"),
      (3L, "a cat"),
      (5L, "the end")).toDF("doc_id", "text")
    val out = Analytics.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    val byTerm = out.groupBy(_._1)
    // 'the': df = 3 (docs 10, 7, 5), cf = 4 (doc 7 twice, case-folded);
    // postings capped at the 2 smallest ids — doc 10 never ships
    assert(byTerm("the").map(t => (t._2, t._3)).toSet === Set((3L, 4L)))
    assert(byTerm("the").sortBy(_._4).map(x => (x._4, x._5)).toSeq ===
      Seq((1, 5L), (2, 7L)))
    assert(byTerm("cat").sortBy(_._4).map(x => (x._4, x._5)).toSeq ===
      Seq((1, 3L), (2, 10L)))
    // a singleton term keeps df = cf = 1 and its one posting
    assert(byTerm("dog").map(x => (x._2, x._3, x._4, x._5)).toSeq ===
      Seq((1L, 1L, 1, 7L)))
    // minDf prunes the tail vocabulary
    val pruned = Analytics.invertedIndex(docs, "doc_id", "text",
        maxPostings = 2, minDf = 2L)
      .select("term").distinct().collect().map(_.getString(0)).toSet
    assert(pruned === Set("the", "cat"))
  }

  test("budgetSelect: greedy priority prefix, straddler dropped, shard-count invariant") {
    // priority = score desc (negated asc), tokens chosen so the cut is
    // mid-corpus: scores 100..1, tokens 10 each -> budget 35 keeps the top
    // 3 (cum 10, 20, 30); the 4th would hit 40 > 35 and is dropped
    val docs = (1 to 100).map(i => (i.toLong, (101 - i).toDouble, 10L))
      .toDF("id", "score", "toks")
    def run(shards: Int) = Analytics.budgetSelect(docs,
        Seq(negate(col("score")), col("id")), col("toks"),
        budget = 35L, shards = shards)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    val out = run(5)
    assert(out.toSeq === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // the sharded two-pass layout must not change the answer
    assert(run(1).toSeq === out.toSeq)
    assert(run(32).toSeq === out.toSeq)
    // budget larger than the corpus keeps everything with exact totals
    val all = Analytics.budgetSelect(docs,
        Seq(negate(col("score")), col("id")), col("toks"),
        budget = 100000L, shards = 5)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(all.length === 100)
    assert(all.toMap.apply(100L) === 1000L) // lowest priority lands last
    // zero budget keeps nothing (and returns the extended schema)
    assert(Analytics.budgetSelect(docs, Seq(negate(col("score")), col("id")),
      col("toks"), budget = 0L).count() === 0)
  }

  test("hllRollup: merged sketches are layout-independent, in-band, and match the direct sketch") {
    val ev = sfEvents()
    val fine = Seq(col("event_type"), date_trunc("day", col("ts")).as("day"))
    val coarse = Seq(col("event_type"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.hllRollup(df, fine, coarse, col("user_id"), lgK = 12)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = run(ev)
    // register-wise max is order/layout-independent: repartitioned input
    // produces the IDENTICAL estimate, not merely a close one
    assert(run(ev.repartition(17)) === est)
    // merging per-day sketches equals sketching the whole stream directly:
    // union is associative over the same lgK/type registers
    val direct = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === direct)
    // and the estimate honors the lgK=12 error contract against exact
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (k, e) =>
      assert(math.abs(e.toDouble - exact(k)) <= exact(k) * 0.08,
        s"$k: merged estimate $e vs exact ${exact(k)} outside 8% band")
    }
  }

  test("kllRollup: merged day-sketches honor the rank-error band against exact percentiles") {
    // KLL compaction is randomized — assert the CONTRACT (merged quantile
    // within the ±5%-rank exact band, 3x the k=200 rank error), never
    // value equality or repartition invariance
    val ev = sfEvents()
    val merged = Analytics.kllRollup(ev,
        Seq(col("event_type"), date_trunc("day", col("ts")).as("day")),
        Seq(col("event_type")), col("value"), k = 200)
      .select(col("event_type"),
        kll_sketch_get_quantile_double(col("sketch"), lit(0.5)).as("p50"),
        kll_sketch_get_quantile_double(col("sketch"), lit(0.95)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = ev.groupBy(col("event_type")).agg(
        expr("percentile(value, 0.45)").as("lo50"),
        expr("percentile(value, 0.55)").as("hi50"),
        expr("percentile(value, 0.90)").as("lo95"),
        max(col("value")).as("hi95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(merged.keySet === exact.keySet && merged.nonEmpty)
    merged.foreach { case (k, (p50, p95)) =>
      val (lo50, hi50, lo95, hi95) = exact(k)
      assert(p50 >= lo50 && p50 <= hi50, s"$k: merged p50 $p50 outside [$lo50, $hi50]")
      assert(p95 >= lo95 && p95 <= hi95, s"$k: merged p95 $p95 outside [$lo95, $hi95]")
    }
  }

  test("rrfFuse: reciprocal-rank fusion matches the closed-form scores, absent = no term") {
    // text list ranks: (1,2,3) = docs 10, 20, 30; vec list ranks: (1,2,3) =
    // docs 30, 10, 40. doc 10: 1/61 + 1/62; doc 30: 1/63 + 1/61;
    // doc 20: 1/62; doc 40: 1/63.
    val text = Seq((10L, 0.9), (20L, 0.8), (30L, 0.7)).toDF("id", "score")
    val vec = Seq((30L, 0.99), (10L, 0.5), (40L, 0.4)).toDF("id", "score")
    val out = Analytics.rrfFuse(Seq("text" -> text, "vec" -> vec),
        "id", "score", k = 10)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int]), r.getDouble(3)))
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val expect = Seq(
      (10L, Some(1), Some(2), r6(1.0 / 61 + 1.0 / 62)),
      (30L, Some(3), Some(1), r6(1.0 / 63 + 1.0 / 61)),
      (20L, Some(2), None, r6(1.0 / 62)),
      (40L, None, Some(3), r6(1.0 / 63)))
    assert(out.toSeq === expect) // fused-score descending, ranks carried
    // a three-list fusion adds terms in list order; k truncates
    val extra = Seq((40L, 1.0), (10L, 0.9)).toDF("id", "score")
    val three = Analytics.rrfFuse(
        Seq("text" -> text, "vec" -> vec, "x" -> extra), "id", "score", k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(three.length === 2)
    assert(three.head._1 === 10L) // 1/61 + 1/62 + 1/62 tops the board
    assert(three.head._2 === r6(1.0 / 61 + 1.0 / 62 + 1.0 / 62))
  }

  test("budgetSelect keeps zero-token rows whose shard offset equals the budget") {
    // Regression for the < vs <= shard-pruning boundary: ids 1-10 carry 10
    // tokens each (cum 10..100 = budget), ids 11-100 carry ZERO tokens, so
    // their cum is exactly 100 == budget and every row must survive. With 90
    // zero-token rows and up to 32 shards, range boundaries land inside the
    // zero-token region, producing shards whose exclusive prefix offset is
    // exactly the budget — the shards the old strict-< prune dropped.
    val docs = ((1 to 10).map(i => (i.toLong, 10L)) ++
      (11 to 100).map(i => (i.toLong, 0L))).toDF("id", "toks")
    def run(shards: Int) = Analytics.budgetSelect(docs,
        Seq(col("id")), col("toks"), budget = 100L, shards = shards)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val one = run(1) // single shard = the trivially-correct layout
    assert(one.length === 100)
    assert(one.take(10) === (1 to 10).map(i => (i.toLong, i * 10L)))
    assert(one.drop(10).forall(_._2 === 100L))
    for (shards <- Seq(2, 5, 16, 32)) assert(run(shards) === one,
      s"shards=$shards changed the budgetSelect answer")
  }

  test("seqWindows: exact cross-document 512-token layout, shard invariant") {
    // doc 1: 700 tokens -> seqs 0 (512) + 1 (188); doc 2: 200 -> seq 1
    // (188..388); doc 3: 0 -> vanishes; doc 4: 1000 -> seq 1 (tail 124),
    // seqs 2, 3 (full+partial)
    val docs = Seq((1L, 700L), (2L, 200L), (3L, 0L), (4L, 1000L))
      .toDF("doc_id", "nt")
    def run(shards: Int) = graft.pipeline.TrainingData.seqWindows(docs,
        Seq(col("doc_id")), col("nt"), seqLen = 512L, shards = shards)
      .select("seq_id", "doc_id", "doc_off", "n_toks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val out = run(4)
    assert(out === Seq(
      (0L, 1L, 0L, 512L),
      (1L, 1L, 0L, 188L), (1L, 2L, 188L, 200L), (1L, 4L, 388L, 124L),
      (2L, 4L, 0L, 512L),
      (3L, 4L, 0L, 364L)))
    // invariants: every sequence is gapless from offset 0, full seqs are
    // exactly 512, token mass is conserved, zero-token docs are gone
    val bySeq = out.groupBy(_._1)
    bySeq.foreach { case (seq, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"seq $seq starts at 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._4 === b._3, s"seq $seq gapless")
        case _ =>
      }
    }
    assert(out.map(_._4).sum === 1900L)
    // the sharded prefix sum must not change the layout
    assert(run(1) === out)
    assert(run(32) === out)
  }

  test("latestByKey keeps the single newest record per key, ties to the larger seq") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      (1L, ts("2024-01-01 12:00:00"), 2, "b", 2.0),   // newest for key 1
      (2L, ts("2024-01-01 10:00:00"), 3, "c", 3.0),
      (2L, ts("2024-01-01 10:00:00"), 4, "d", 4.0),   // same ts → larger id wins
      (3L, ts("2024-01-01 09:00:00"), 5, "e", 5.0)    // singleton key
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Analytics.latestByKey(events.repartition(7), "user_id",
        unix_micros(col("ts")), col("event_id"),
        Seq("event_id" -> col("event_id"), "event_type" -> col("event_type")))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(out === Map(1L -> (2, "b"), 2L -> (4, "d"), 3L -> (5, "e")))
  }

  test("latestByKey matches the window formulation on the sf0.001 events stream") {
    val events = sfEvents()
    val agg = Analytics.latestByKey(events, "user_id",
        unix_micros(col("ts")), col("event_id"),
        Seq("event_id" -> col("event_id"), "value" -> col("value")))
      .select("user_id", "event_id", "value")
    val win = events.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1).select("user_id", "event_id", "value")
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty)
    assert(agg.count() === events.select("user_id").distinct().count())
  }

  test("intervalJoin: inclusive bounds, band-straddling pairs, no duplicates") {
    // band width W = before + after = 60 s; buckets are minute-aligned
    val left = Seq(
      (1L, ts("2024-01-01 10:01:00"), 10),
      (2L, ts("2024-01-01 10:01:00"), 20)
    ).toDF("user_id", "ts", "l_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100), // exactly lt − before → kept (inclusive)
      (1L, ts("2024-01-01 10:00:30"), 101), // previous bucket, in window
      (1L, ts("2024-01-01 10:01:00"), 102), // exactly lt → kept (after = 0)
      (1L, ts("2024-01-01 10:01:01"), 103), // future → dropped
      (1L, ts("2024-01-01 09:59:59"), 104), // 61 s before → dropped
      (2L, ts("2024-01-01 10:00:30"), 200)  // other key
    ).toDF("user_id", "ts", "r_id")
    val out = Analytics.intervalJoin(left, right, "user_id", "ts", "ts",
        beforeUs = 60L * 1000000L, afterUs = 0L, rightCols = Seq("r_id" -> "r_id"))
      .select("l_id", "r_id").collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(out === Seq((10, 100), (10, 101), (10, 102), (20, 200)))
  }

  test("intervalJoin matches the naive range join on sf0.001 and stays an equi-join") {
    val ev = sfEvents()
    val p = ev.filter(col("event_type") === "purchase").select(
      col("event_id").as("l_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
    val banded = Analytics.intervalJoin(p, v, "user_id", "ts", "ts",
        beforeUs = 3600L * 1000000L, afterUs = 600L * 1000000L,
        rightCols = Seq("event_id" -> "r_id"))
      .select("l_id", "r_id")
    val naive = p.join(v.select(col("user_id").as("vu"), col("ts").as("vts"),
        col("event_id").as("r_id")),
        col("user_id") === col("vu") &&
          unix_micros(col("vts")) >= unix_micros(col("ts")) - 3600L * 1000000L &&
          unix_micros(col("vts")) <= unix_micros(col("ts")) + 600L * 1000000L)
      .select("l_id", "r_id")
    assert(banded.except(naive).isEmpty && naive.except(banded).isEmpty)
    assert(banded.count() === banded.distinct().count()) // no duplicate pairs
    val phys = banded.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
      s"banded join degraded to a non-equi join:\n$phys")
  }

  test("native session_window agrees with sessionize islands on sf0.001") {
    val ev = sfEvents()
    val native = ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s"), col("n"))
    val islands = Analytics.sessionize(ev, "ts", "user_id", gapSeconds = 1800,
        orderCols = Seq(col("event_id")))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("s"), count(lit(1)).as("n"))
      .select("user_id", "s", "n")
    // no exact-30-min gaps in the random-micros stream, so the >= / >
    // boundary difference cannot bite and the two formulations coincide
    assert(native.except(islands).isEmpty && islands.except(native).isEmpty)
  }

  test("scd2 chains validity intervals; the null-valid_to slice is latestByKey") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1, "a"),
      (1L, ts("2024-01-01 11:00:00"), 2, "b"),
      (1L, ts("2024-01-01 11:00:00"), 3, "c"),  // same ts → event_id orders versions
      (2L, ts("2024-01-01 09:00:00"), 4, "d")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val hist = Analytics.scd2(events.repartition(5), "user_id", col("ts"), col("event_id"))
    val byId = hist.collect().map(r =>
      r.getInt(2) -> (r.getTimestamp(4), Option(r.getTimestamp(5)))).toMap
    assert(byId(1) === (ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 11:00:00"))))
    assert(byId(2) === (ts("2024-01-01 11:00:00"), Some(ts("2024-01-01 11:00:00"))))
    assert(byId(3) === (ts("2024-01-01 11:00:00"), None))
    assert(byId(4) === (ts("2024-01-01 09:00:00"), None))
    // compacted view: the current slice equals latestByKey's survivors
    val current = hist.filter(col("valid_to").isNull)
      .select("user_id", "event_id", "event_type")
    val latest = Analytics.latestByKey(events, "user_id",
      unix_micros(col("ts")), col("event_id"),
      Seq("event_id" -> col("event_id"), "event_type" -> col("event_type")))
    assert(current.except(latest).isEmpty && latest.except(current).isEmpty)
  }

  // Schema-adaptive shared loader — same code path the driver exercises, so
  // a testdata regeneration that changes the ts physical type breaks (or
  // fixes) the specs and the driver queries together, never one without the
  // other.
  private def sfEvents() = graft.SparkEntry.t(spark, "/root/testdata/sf0.001", "events")

  test("hopping window() lands each event in exactly size/slide windows") {
    val events = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:35:00"), "click", 2.0),
      (ts("2024-01-01 23:59:00"), "view", 3.0)
    ).toDF("ts", "event_type", "value")
    val out = events
      .groupBy(window(col("ts"), "2 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("s"), col("event_type"), col("n"))
      .collect()
    // each event → 4 windows; the two clicks co-occur in 3 of them
    assert(out.map(_.getLong(2)).sum === 12L)
    val clickWins = out.filter(_.getString(1) == "click")
    assert(clickWins.count(_.getLong(2) == 2L) === 3)
    assert(clickWins.length === 5) // 4 + 4 − 3 overlapping
    // window starts are slide-aligned and cover (event − size, event]
    val starts = clickWins.map(r => r.getTimestamp(0).getTime).sorted
    assert(starts.head === ts("2024-01-01 08:30:00").getTime)
    assert(starts.last === ts("2024-01-01 10:30:00").getTime)
  }

  test("slidingAgg: inclusive trailing frame, tie rows share a frame, keys independent") {
    val events = Seq(
      (1, 1L, ts("2024-01-01 10:00:00"), 10.0),
      (2, 1L, ts("2024-01-01 10:10:00"), 20.0), // exactly size back from e3 → included
      (3, 1L, ts("2024-01-01 10:20:00"), 30.0),
      (4, 1L, ts("2024-01-01 10:20:00"), 40.0), // tie with e3: same frame both ways
      (5, 2L, ts("2024-01-01 10:20:00"), 50.0)  // other key independent
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Analytics.slidingAgg(events, "user_id", "ts", sizeSeconds = 600L,
        Seq("n" -> count(lit(1)), "total" -> sum(col("value"))))
      .select("event_id", "n", "total")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1) === ((1L, 10.0)))
    assert(out(2) === ((2L, 30.0)))   // [10:00, 10:10] inclusive lower bound
    assert(out(3) === ((3L, 90.0)))   // e2, e3, e4 (tie included) — not e1
    assert(out(4) === out(3))          // RANGE: tie rows see identical frames
    assert(out(5) === ((1L, 50.0)))
  }

  test("resampleDailyLocf: dense grid, forward fill, null before first observation") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1, 10.0),
      (1L, ts("2024-01-01 18:00:00"), 2, 11.0), // later same day wins (close)
      (1L, ts("2024-01-04 10:00:00"), 3, 40.0), // days 2-3 silent → carry 11.0
      (2L, ts("2024-01-03 10:00:00"), 4, 99.0)  // user 2 silent before day 3
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Analytics.resampleDailyLocf(events, "user_id", "ts",
        max_by(col("value"), col("event_id")), "close")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out.size === 8) // 2 users x 4 days
    assert(out((1L, "2024-01-01")) === Some(11.0))
    assert(out((1L, "2024-01-02")) === Some(11.0))
    assert(out((1L, "2024-01-03")) === Some(11.0))
    assert(out((1L, "2024-01-04")) === Some(40.0))
    assert(out((2L, "2024-01-01")) === None) // LOCF never invents data
    assert(out((2L, "2024-01-02")) === None)
    assert(out((2L, "2024-01-03")) === Some(99.0))
    assert(out((2L, "2024-01-04")) === Some(99.0))
  }

  test("funnel: stages only advance strictly after the previous stage") {
    val events = Seq(
      // user 1: clean signup → view → purchase
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:05:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: view BEFORE signup doesn't count; the later view does
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, ts("2024-01-01 11:00:00"), "view"),
      // user 3: purchase before any view → funnel stops at signup
      (3L, ts("2024-01-01 10:00:00"), "signup"),
      (3L, ts("2024-01-01 10:30:00"), "purchase"),
      // user 4: same-instant signup+view → strictly-after excludes the view
      (4L, ts("2024-01-01 10:00:00"), "signup"),
      (4L, ts("2024-01-01 10:00:00"), "view"),
      // user 5: never signs up → all stages null
      (5L, ts("2024-01-01 10:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnel(events, "user_id", "ts",
        Seq("t_signup" -> (col("event_type") === "signup"),
          "t_view" -> (col("event_type") === "view"),
          "t_purchase" -> (col("event_type") === "purchase")))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3))))).toMap
    assert(out(1L) === ((Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 10:05:00")), Some(ts("2024-01-01 10:10:00")))))
    assert(out(2L) === ((Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 11:00:00")), None)))
    assert(out(3L) === ((Some(ts("2024-01-01 10:00:00")), None, None)))
    assert(out(4L) === ((Some(ts("2024-01-01 10:00:00")), None, None)))
    assert(out(5L) === ((None, None, None)))
  }

  test("randomizedResponse: coin 0 flips, debias is (4·obs − n)/2 exactly") {
    val s = spark
    import s.implicits._
    // cohort 0: bits 1,0,1,1 with coins 1,2,3,0 → reported 1,0,1,0
    // cohort 1: bits 1,1   with coins 0,0     → reported 0,0 (all flipped)
    val df = Seq((0L, 1L, 1L), (0L, 0L, 2L), (0L, 1L, 3L), (0L, 1L, 0L),
      (1L, 1L, 0L), (1L, 1L, 0L)).toDF("cohort", "bit", "coin")
    val out = Analytics.randomizedResponse(df, col("cohort"), col("bit"), col("coin"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(0L) === ((4L, 3L, 2L, 2.0)))  // (4·2 − 4)/2 = 2.0
    assert(out(1L) === ((2L, 2L, 0L, -1.0))) // all-flipped cohort goes negative — unbiased, not clamped
  }

  test("winsorizedStats: discrete rank bounds clip exactly; singleton group degenerates to identity") {
    val s = spark
    import s.implicits._
    // group a: values 1..10 → ceil(10·0.1)=rank 1 (=1), ceil(10·0.9)=rank 9 (=9)
    // → clipped sum = 1 + 2..9 + 9 = 54, mean 5.4 (raw 5.5)
    val a = (1 to 10).map(v => ("a", v.toLong, v.toLong))
    val b = Seq(("b", 100L, 1L)) // n=1: lo=hi=100, win_mean == raw_mean
    val out = Analytics.winsorizedStats((a ++ b).toDF("g", "v", "id"),
        col("g"), col("v"), col("id"), 100, 900)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out("a") === ((10L, 1L, 9L, 5.5, 5.4)))
    assert(out("b") === ((1L, 100L, 100L, 100.0, 100.0)))
  }

  test("nucleusVocab: smallest count-desc prefix reaching p, ties broken by token") {
    val s = spark
    import s.implicits._
    // tokens: x×5 y×3 z×1 w×1 (total 10). p=0.8 → prefix x(5), y(3): before-y
    // mass 5 < 8 ✓, before-z mass 8 !< 8 ✗ → nucleus {x,y}, mass 8.
    val df = Seq(("g", "x x x x x y y y z w")).toDF("src", "text")
    val r = Analytics.nucleusVocab(df, col("src"), col("text"), 800).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) ===
      ((2L, 8L, 10L, 0.8)))
  }

  test("chiSquareIndependence: 0 for exact independence, N for a perfectly associated 2x2") {
    val s = spark
    import s.implicits._
    // independent: every cell o = r·c/N exactly → every term 0
    val ind = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val r1 = Analytics.chiSquareIndependence(ind.toDF("u", "v"), col("u"), col("v")).head()
    assert((r1.getLong(0), r1.getLong(1), r1.getDouble(2)) === ((4L, 90L, 0.0)))
    // perfect association: chi2 == N (2x2, all mass on the diagonal)
    val dep = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))
    val r2 = Analytics.chiSquareIndependence(dep.toDF("u", "v"), col("u"), col("v")).head()
    assert((r2.getLong(0), r2.getDouble(2)) === ((4L, 20.0)))
  }

  test("dpNoisyCounts: noise bounded by ±m, released clamped at 0, replay-deterministic") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(5)("en") ++ Seq.fill(1)("zz")).toDF("lang")
    val run = () => Analytics.dpNoisyCounts(df, col("lang"), "seed", 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val a = run()
    assert(a === run()) // hash noise, not RNG: identical release every time
    a.values.foreach { case (n, noise, rel) =>
      assert(noise >= -3 && noise <= 3 && rel >= 0 && rel === math.max(0L, n + noise))
    }
  }

  test("funnelWindowed: inclusive at exactly the gap, broken one microsecond past it") {
    val s = spark
    import s.implicits._
    def t(sec: Int, micro: Int = 0) = {
      val x = Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d")
      x.setNanos(micro * 1000); x
    }
    val events = Seq(
      (1L, t(0), "a"), (1L, t(10), "b"),        // within the 10s gap exactly → converts
      (2L, t(0), "a"), (2L, t(10, 1), "b"),     // 1µs past → stage 2 null
      (3L, t(0), "a"), (3L, t(5), "b"), (3L, t(20), "b") // earliest in-window wins
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnelWindowed(events, "user_id", "ts",
        Seq("t_a" -> (col("event_type") === "a"), "t_b" -> (col("event_type") === "b")),
        maxGapSeconds = 10L)
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(2))).toMap
    assert(out(1L) === Some(t(10)))
    assert(out(2L) === None)
    assert(out(3L) === Some(t(5)))
  }

  test("basketTriples: level-1 prune removes infrequent items before the cubic step; lift exact") {
    val s = spark
    import s.implicits._
    // items 1,2,3 co-occur in 3 baskets; item 9 appears once (pruned by
    // minSupport=2 BEFORE triple generation — no triple may contain it)
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 9L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 3L))
    val out = Analytics.basketTriples(rows.toDF("bk", "item"),
        col("bk"), col("item"), minSupport = 2L, k = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3), r.getDouble(4)))
    assert(out.length === 1)
    val ((a, b, c), n, lift) = out.head
    assert((a, b, c) === ((1L, 2L, 3L)) && n === 3L)
    // lift3 = n_abc·N²/(n_a·n_b·n_c) = 3·9/(3·3·3) = 1.0
    assert(lift === 1.0)
  }

  test("basketTriples level-2 pair prune: the auto gate engages on a sparse wide-vocab " +
      "domain, stays off on a dense one, and never changes the output") {
    val s = spark
    import s.implicits._
    // Wide-vocab fixture: 100 baskets. The triple {1,2,3} rides baskets
    // 0..29 (frequent). Fillers 100..119 are each level-1-frequent (10
    // baskets apiece) but their pairs are rare: basket b carries fillers
    // {100+b%20, 100+(b+7)%20}, so only offset-7 filler pairs ever
    // co-occur; filler×{1,2,3} pairs occur ≤ 2 times — under minSupport 5.
    // Independence estimate: filler·filler expected co-support
    // 10·10/30 ≈ 3.3 < 5 for 190 of 253 pairs → the auto gate engages.
    val rows = (0 until 100).flatMap { b =>
      val fillers = Seq(100L + b % 20, 100L + (b + 7) % 20)
      val triple = if (b < 30) Seq(1L, 2L, 3L) else Seq.empty[Long]
      (triple ++ fillers).map(i => (b.toLong, i))
    }
    val df = rows.toDF("bk", "item")
    def run(mode: String) = Analytics.basketTriples(
        df, col("bk"), col("item"), minSupport = 5L, k = 10, pairPrune = mode)
      .collect().map(r =>
        ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3), r.getDouble(4))).toSeq
    val off = run("off")
    val on = run("on")
    val before = Analytics.pairPruneEngaged.get()
    val auto = run("auto")
    assert(Analytics.pairPruneEngaged.get() === before + 1,
      "auto gate must ENGAGE the prune on this sparse domain")
    assert(on === off && auto === off, "prune must never change the output")
    assert(off.map(_._1) === Seq((1L, 2L, 3L)) && off.head._2 === 30L)
    // dense control (the original 3-basket fixture): the gate stays off
    val dense = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 3L)).toDF("bk", "item")
    val before2 = Analytics.pairPruneEngaged.get()
    Analytics.basketTriples(dense, col("bk"), col("item"),
      minSupport = 2L, k = 10).collect()
    assert(Analytics.pairPruneEngaged.get() === before2,
      "auto gate must stay OFF on a dense domain")
  }

  test("pmiPairs and ngramNovelty return empty (not NPE) on degenerate input") {
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "solo")).toDF("doc_id", "text") // every doc < 2 tokens
    assert(Analytics.pmiPairs(tiny, col("text"), 3, 1L, 10).count() === 0L)
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Analytics.ngramNovelty(none, col("doc_id"), col("text"), 3, 8).count() === 0L)
  }

  test("chiSquareIndependence maxCells guard trips BEFORE collecting an oversized census") {
    val s = spark
    import s.implicits._
    val wide = (1 to 100).map(i => (s"a$i", s"b$i")).toDF("u", "v")
    val e = intercept[IllegalArgumentException] {
      Analytics.chiSquareIndependence(wide, col("u"), col("v"), maxCells = 10)
    }
    assert(e.getMessage.contains("bucket the columns first"))
  }

  test("ngramNovelty: first-seen bucket charged once; repeats count as seen, not novel") {
    val s = spark
    import s.implicits._
    // ids 0..3, 2 buckets (0,1 → b0; 2,3 → b1). Trigram "a b c" first in b0,
    // repeated in b1; "d e f" first in b1.
    val df = Seq((0L, "a b c"), (1L, "a b c"), (2L, "a b c"), (3L, "d e f"))
      .toDF("doc_id", "text")
    val out = Analytics.ngramNovelty(df, col("doc_id"), col("text"), 3, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(0L -> ((1L, 1L)), 1L -> ((2L, 1L))))
  }
}
