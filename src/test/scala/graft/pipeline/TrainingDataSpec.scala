package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: decontamination overlap math,
  * token-budget packing layout, content-split stability, seeded sampling.
  */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private val phrase = "the quick brown fox jumps over the lazy dog tonight"

  test("spanCorrupt: substituting each sentinel's target span reconstructs the document") {
    val docs = Seq(
      (1L, (1 to 37).map(i => s"tok$i").mkString(" ")),
      (2L, "short doc"),                   // shorter than one block
      (3L, ""))                            // empty: must not crash
      .toDF("doc_id", "text")
    val out = TrainingData.spanCorrupt(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    val (n1, m1, corr1, targ1) = out(1L)
    assert(n1 === 37L && m1 > 0L && m1 % 3 === 0L)
    // parse targets into sentinel -> span tokens
    val spans = targ1.split("<extra_id_").drop(1).map { part =>
      val Array(id, rest) = part.split(">", 2)
      id.toInt -> rest.trim.split(" ").toSeq
    }.toMap
    spans.values.foreach(s => assert(s.length === 3))
    // substitute back and compare with the original token stream
    val rebuilt = corr1.split(" ").flatMap { tok =>
      if (tok.startsWith("<extra_id_"))
        spans(tok.stripPrefix("<extra_id_").stripSuffix(">").toInt)
      else Seq(tok)
    }.toSeq
    assert(rebuilt === (1 to 37).map(i => s"tok$i"))
    assert(m1 === spans.size * 3L)
    // a 2-token doc can never fit a 3-span; empty doc yields empty strings
    assert(out(2L) === ((2L, 0L, "short doc", "")))
    assert(out(3L) === ((0L, 0L, "", "")))
  }

  test("contaminationReport flags exactly the train docs sharing an n-gram with bench") {
    val train = Seq(
      (1L, phrase),                                                   // contaminated: contains bench 5-grams
      (2L, "completely different words about spark catalyst planning and codegen")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, phrase + " extra tail words here")).toDF("doc_id", "text")
    val out = TrainingData.contaminationReport(train, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSet === Set(1L))
    val (_, shared, containment) = out.head
    // doc 1 has 6 distinct 5-grams (10 tokens), all contained in bench
    assert(shared === 6L)
    assert(containment === 1.0)
  }

  test("contaminationReport maxDocFreq drops benchmark boilerplate shingles") {
    val train = Seq((1L, phrase)).toDF("doc_id", "text")
    // the shared shingles appear in 3 bench docs; cap at 2 kills them
    val bench = (100L to 102L).map(i => (i, phrase)).toDF("doc_id", "text")
    val capped = TrainingData.contaminationReport(train, bench, "doc_id", "text",
      n = 5, maxDocFreq = 2)
    assert(capped.count() === 0)
    val uncapped = TrainingData.contaminationReport(train, bench, "doc_id", "text", n = 5)
    assert(uncapped.count() === 1)
  }

  test("packBudgeted assigns docs to packs by cumulative token count") {
    // 4 docs of 3 tokens each, budget 5: cum_before = 0,3,6,9 → packs 0,0,1,1
    val docs = (1L to 4L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = TrainingData.packBudgeted(docs, "doc_id", "text", budget = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out === Seq((0L, 2L, 6L), (1L, 2L, 6L)))
  }

  test("packBudgeted is shard-count invariant: sharded == 1-shard global layout") {
    // uneven doc lengths so pack boundaries land mid-shard; results must be
    // bit-identical whether the cumsum runs in 1, 3, or 32 range shards
    val docs = (1L to 200L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    def packs(shards: Int) =
      TrainingData.packBudgeted(docs, "doc_id", "text", budget = 23, shards = shards)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val global = packs(1)
    assert(global.map(_._3).sum === (1L to 200L).map(_ % 7 + 1).sum)
    assert(packs(3) === global)
    assert(packs(32) === global)
  }

  test("contentSplit is a pure function of text: duplicates share a split, ids don't matter") {
    val a = Seq((1L, phrase), (2L, phrase), (3L, "some other document text entirely"))
      .toDF("doc_id", "text")
    val out = TrainingData.contentSplit(a, "text", valPct = 30, testPct = 30).collect()
    assert(out.map(_.getLong(1)).sum === 3)
    // identical text twice → both rows in one split bucket (n_docs for that
    // split counts both), so no split has exactly 1 of the duplicated text
    val withDup = out.find(_.getLong(1) >= 2)
    assert(withDup.isDefined)
    intercept[IllegalArgumentException] {
      TrainingData.contentSplit(a, "text", valPct = 60, testPct = 40)
    }
  }

  test("bloomDecontaminate output is row-identical to contaminationReport (sf0.01)") {
    // the driver oracle for q_bloom_decontaminate is the exact containment
    // SQL — valid only while the bloom prefilter + exact verify reproduces
    // contaminationReport exactly (false positives all removed by the join)
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val train = d.filter(col("doc_id") % 4 =!= 0)
    val bench = d.filter(col("doc_id") % 4 === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = key(TrainingData.contaminationReport(train, bench, "doc_id", "text", n = 5))
    val bloom = key(TrainingData.bloomDecontaminate(train, bench, "doc_id", "text", n = 5))
    assert(exact.nonEmpty)
    assert(bloom === exact)
  }

  test("semanticDecontaminate: max-cosine report matches brute force (dense face)") {
    // 2-D toy geometry so the expected cosines are exact by construction
    val train = Seq(
      (1L, Seq(1.0f, 0.0f)),   // cos vs bench: max(1, 0)      = 1.0  → contaminated
      (2L, Seq(0.6f, 0.8f)),   // max(0.6, 0.8)                = 0.8  → contaminated at 0.75
      (3L, Seq(-1.0f, 0.0f)),  // max(-1, 0)                   = 0.0
      (5L, Seq(0.0f, 0.0f)))   // zero vector: cosine 0.0 by contract, never NaN
      .toDF("vec_id", "embedding")
    val bench = Seq((100L, Seq(1.0f, 0.0f)), (101L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = TrainingData.semanticDecontaminate(train, bench, "vec_id", "embedding",
        threshold = 0.75)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got(1L) === ((1.0, true)))
    assert(got(2L) === ((0.8, true)))
    assert(got(3L) === ((0.0, false)))
    assert(got(5L) === ((0.0, false)))
  }

  test("semanticDecontaminate dispatches to the LSH face above maxBenchRows; " +
       "LSH face matches the dense face on contamination and candidate scores (sf0.01)") {
    // real embedding corpus (clustered, like any production one) at the
    // q_embed_near_dup_lsh threshold regime where the auto-sized radius-1
    // multiprobe config is known to reach exact parity at this scale
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val train = emb.filter(col("vec_id") % 4 =!= 0)
    val bench = emb.filter(col("vec_id") % 4 === 0)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getBoolean(2)))
      }.toMap
    val dense = collect(TrainingData.semanticDecontaminate(
      train, bench, "vec_id", "embedding", threshold = 0.45))
    // maxBenchRows below the bench count: the dispatcher must route to the
    // LSH face (the path that used to be a loud throw) instead of throwing
    val lsh = collect(TrainingData.semanticDecontaminate(
      train, bench, "vec_id", "embedding", threshold = 0.45, maxBenchRows = 1L))
    assert(lsh.keySet === dense.keySet, "one row per train id on both faces")
    val denseContaminated = dense.filter(_._2._2).keySet
    assert(denseContaminated.nonEmpty, "fixture must actually contaminate")
    assert(lsh.filter(_._2._2).keySet === denseContaminated,
      "LSH detection must match dense at this scale/threshold")
    // for every contaminated row the argmax partner clears the threshold,
    // so it is an LSH candidate and the candidate max equals the true max
    denseContaminated.foreach { id =>
      assert(lsh(id)._1 === dense(id)._1, s"score mismatch for $id")
    }
    // the weaker contract: candidate-free rows report NULL score, never a
    // fabricated one, and are always uncontaminated
    lsh.values.foreach { case (score, contaminated) =>
      if (score.isEmpty) assert(!contaminated)
    }
    // direct call with explicit benchN: same result, no count job
    val direct = collect(TrainingData.semanticDecontaminateLsh(
      train, bench, "vec_id", "embedding", threshold = 0.45,
      benchN = bench.count()))
    assert(direct === lsh)
    // explicit strategy=Lsh: same result as the Auto dispatch, no size trick
    val forced = collect(TrainingData.semanticDecontaminate(
      train, bench, "vec_id", "embedding", threshold = 0.45,
      strategy = TrainingData.DecontaminationStrategy.Lsh))
    assert(forced === lsh)
  }

  test("the LSH train-side persist is bounded: a third distinct corpus " +
       "evicts the least-recently-used projection, results unaffected") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = emb.filter(col("vec_id") % 4 === 0)
    def run(mod: Int) = TrainingData.semanticDecontaminateLsh(
        emb.filter(col("vec_id") % 4 =!= 0 && col("vec_id") % 5 =!= mod),
        bench, "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    val first = run(1)
    run(2); run(3) // three DISTINCT train plans through the registry
    assert(TrainingData.persistedTrainSides <= 2,
      "the registry must stay bounded at 2 resident projections")
    // the evicted plan recomputes from lineage — same rows, no staleness
    assert(run(1) === first)
  }

  test("releaseTrainSides empties the registry; later calls re-register " +
       "and results are unchanged") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = emb.filter(col("vec_id") % 4 === 0)
    def run() = TrainingData.semanticDecontaminateLsh(
        emb.filter(col("vec_id") % 4 =!= 0), bench,
        "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    val first = run()
    assert(TrainingData.persistedTrainSides >= 1,
      "the call must have registered its train side")
    TrainingData.releaseTrainSides()
    assert(TrainingData.persistedTrainSides === 0,
      "explicit release must empty the registry")
    // the hook gives memory back, never correctness: a fresh call simply
    // re-registers and computes the same rows
    assert(run() === first)
    assert(TrainingData.persistedTrainSides >= 1)
  }

  test("a registry hit after an external clearCache re-asserts the persist: " +
       "the executed plan reads the train side from ONE parquet scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = emb.filter(col("vec_id") % 4 === 0)
    def build() = TrainingData.semanticDecontaminateLsh(
      emb.filter(col("vec_id") % 4 =!= 0), bench,
      "vec_id", "embedding", threshold = 0.45)
    build().collect() // populate the registry
    // the bench harness clears the CacheManager behind the registry
    // between queries — the next registry HIT must re-materialize the
    // cache (exactly once), not silently degrade to three parquet scans
    spark.catalog.clearCache()
    val df = build()
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // same shape as the PlanAuditSpec single-scan audit: the three train
    // reads (tag hashing, candidate re-score, id spine) all hit the
    // re-asserted cache; only the bench side's two scans plus ONE train
    // scan reach parquet
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3, p)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size === 3, p)
  }

  test("semanticDecontaminate strategy=Dense refuses the LSH substitution " +
       "above maxBenchRows with a loud error") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val train = emb.filter(col("vec_id") % 4 =!= 0)
    val bench = emb.filter(col("vec_id") % 4 === 0)
    // the caller asked for the exact-score contract: above the broadcast
    // gate the call must FAIL, never silently weaken to candidate-max
    val e = intercept[IllegalArgumentException] {
      TrainingData.semanticDecontaminate(
        train, bench, "vec_id", "embedding", threshold = 0.45,
        maxBenchRows = 1L,
        strategy = TrainingData.DecontaminationStrategy.Dense)
    }
    assert(e.getMessage.contains("strategy=Dense"), e.getMessage)
    assert(e.getMessage.contains("maxBenchRows"), e.getMessage)
    // and below the gate, Dense runs the dense face normally
    val ok = TrainingData.semanticDecontaminate(
      train, bench, "vec_id", "embedding", threshold = 0.45,
      strategy = TrainingData.DecontaminationStrategy.Dense)
    assert(ok.count() === train.count())
  }

  test("fuzzyDecontaminate equals the exact cross-corpus Jaccard join (sf0.01)") {
    // same strength as the q_minhash_lsh gate, cross-corpus: LSH candidates +
    // exact verify must reproduce the brute-force cross join exactly
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val got = TrainingData.fuzzyDecontaminate(docs, bench, "doc_id", "text")
      .filter(col("doc_id") =!= col("bench_id"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sh = graft.dedup.Dedup.shingleSets(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val benchIds = sh.keys.filter(_ % 7 == 0)
    val want = (for {
      t <- sh.keys; b <- benchIds if t != b
      inter = (sh(t) & sh(b)).size
      union = sh(t).size + sh(b).size - inter
      j = if (union > 0) BigDecimal(inter.toDouble / union)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
      if j >= 0.8
    } yield ((t, b), j)).toMap
    assert(want.nonEmpty, "corpus must contain cross-corpus near-dups for this spec to bite")
    assert(got === want)
  }

  test("repeatedSpans: stride-1 catches an offset repeat that chunk dedup misses") {
    val quote = (1 to 16).map(i => s"q$i").mkString(" ") // a 16-token quoted run
    val a = (quote + " " + (1 to 20).map(i => s"a$i").mkString(" ")).trim     // quote at pos 0
    val b = ((1 to 7).map(i => s"b$i").mkString(" ") + " " + quote + " " +
      (1 to 12).map(i => s"c$i").mkString(" ")).trim                          // quote at pos 7
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, other)).toDF("doc_id", "text")
    val spans = TrainingData.repeatedSpans(df, "doc_id", "text", window = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // exactly one shared 16-token window: the quote itself, at its offset in each doc
    assert(spans.toSet === Set((1L, 0L, 2L), (2L, 7L, 2L)))
    // the non-overlapping chunker cannot see it: doc 2's quote straddles the
    // 16-token chunk boundary, so no chunk fingerprint repeats
    val chunks = TrainingData.duplicateChunks(df, "doc_id", "text", chunkTokens = 16)
    assert(chunks.count() === 0L)
  }

  test("resolveDuplicatesBy: highest-score member survives each component, ties to smallest id") {
    import graft.dedup.Dedup
    // components {1,2,3} (chain) and {10, 11}; 5 is a singleton (absent)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val prio = Seq((1L, 0.3), (2L, 0.9), (3L, 0.5), (10L, 0.7), (11L, 0.7), (5L, 1.0))
      .toDF("id", "score")
    val out = Dedup.resolveDuplicatesBy(pairs, prio, "id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L,   // 2 has top score
      10L -> 10L, 11L -> 10L))                         // tie -> smaller id
    // a component with NO scored member falls back to min-id, not silence
    val sparse = Seq((20L, 0.4)).toDF("id", "score")   // neither 10 nor 11 scored
    val fb = Dedup.resolveDuplicatesBy(pairs, sparse, "id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fb(10L) === 10L && fb(11L) === 10L)
    assert(fb.keySet === Set(1L, 2L, 3L, 10L, 11L))
  }

  test("dirty input: round-6 operators degrade on null/empty/short text, never throw") {
    val dirty = Seq((1L, ("w " * 40).trim), (2L, null.asInstanceOf[String]),
      (3L, ""), (4L, "   "), (5L, "short doc")).toDF("doc_id", "text")
    // spans: null/empty/short docs simply produce no windows
    assert(TrainingData.repeatedSpans(dirty, "doc_id", "text").count() === 0)
    val removed = TrainingData.removeRepeatedSpans(dirty, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(removed(1L).get === ("w " * 40).trim)
    assert(removed(2L).isEmpty)          // null text stays null
    // no cuts -> ORIGINAL text passes through, whitespace and all
    assert(removed(3L).get === "" && removed(4L).get === "   ")
    val decon = TrainingData.decontaminateSpans(
      dirty, dirty.filter(col("doc_id") === 1L), "doc_id", "text")
    assert(decon.count() === 5)
    // mixing: null stratum rows are dropped (not in targets), null text = 0 tokens
    val mixed = TrainingData.mixToTargets(
      Seq((1L, "aa", "w w w"), (2L, null.asInstanceOf[String], "w w"),
        (3L, "aa", null.asInstanceOf[String])).toDF("doc_id", "lang", "text"),
      "lang", "doc_id", "text", Map("aa" -> 1.0))
    assert(mixed.collect().map(_.getLong(0)).toSet.subsetOf(Set(1L, 3L)))
    // perplexity: null text propagates null, degenerate docs score 0.0
    val ppl = TrainingData.perplexityScore(dirty,
        dirty.filter(col("doc_id") === 1L), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(ppl(1L).isDefined)
    assert(ppl(2L).isEmpty)
    assert(ppl(3L) === Some(0.0) && ppl(4L) === Some(0.0))
    // the gate form: null text DROPS (null never passes a filter);
    // degenerate 0.0 scores pass at the default minNll = 0
    val gated = TrainingData.perplexityGate(
        dirty.filter(col("doc_id") === 1L), "text", maxNll = 100.0)(dirty)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gated === Set(1L, 3L, 4L, 5L))
    // boilerplate removal on the same dirty rows: never throws, null stays null
    val bp = TrainingData.removeBoilerplate(dirty, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(bp(2L).isEmpty && bp(1L).isDefined)
  }

  test("perplexityScore: target-like docs score lower nll; degenerate docs score 0") {
    val target = Seq(
      (100L, "the quantum state collapses when the quantum state is measured"),
      (101L, "quantum computing uses the quantum state of qubits")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quantum state of qubits collapses when measured"), // target-like bigrams
      (2L, "football referee penalty offside corner goalkeeper"),  // off-domain
      (3L, "single"), (4L, "  ")).toDF("doc_id", "text")
    val out = TrainingData.perplexityScore(docs, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < out(2L), s"target-like must score lower nll: $out")
    assert(out(3L) === 0.0 && out(4L) === 0.0)
    val again = TrainingData.perplexityScore(docs, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === out)
  }

  test("decontaminateSpans: only the benchmark-overlapping run is cut, broadcast and fallback agree") {
    val answer = (1 to 16).map(i => s"ans$i").mkString(" ")
    val longDoc = ((1 to 30).map(i => s"pre$i").mkString(" ") + " " + answer + " " +
      (1 to 30).map(i => s"post$i").mkString(" ")).trim
    val clean = (1 to 40).map(i => s"c$i").mkString(" ")
    val train = Seq((1L, longDoc), (2L, clean)).toDF("doc_id", "text")
    val bench = Seq((100L, answer + " trailing words here")).toDF("doc_id", "text")
    val out = TrainingData.decontaminateSpans(train, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 keeps its 60 surrounding tokens; the quoted answer is gone.
    // NOTE: the bench doc's sliding windows also cover (answer-suffix +
    // trailing) runs, but none of those appear in doc 1 — only the exact
    // answer window matches, so exactly 16 tokens are cut
    assert(out(1L) === ((1 to 30).map(i => s"pre$i") ++ (1 to 30).map(i => s"post$i")).mkString(" "))
    assert(out(2L) === clean) // drop-span, not drop-document: untouched
    // shuffle-join fallback (gate forced off) is row-identical
    val fb = TrainingData.decontaminateSpans(train, bench, "doc_id", "text",
      broadcastMaxRows = 0L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fb === out)
  }

  test("removeRepeatedSpans: non-first occurrences cut, first kept, untouched docs intact") {
    val quote = (1 to 16).map(i => s"q$i").mkString(" ")
    val a = (quote + " " + (1 to 20).map(i => s"a$i").mkString(" ")).trim
    val b = ((1 to 7).map(i => s"b$i").mkString(" ") + " " + quote + " " +
      (1 to 12).map(i => s"c$i").mkString(" ")).trim
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, other)).toDF("doc_id", "text")
    val out = TrainingData.removeRepeatedSpans(df, "doc_id", "text", window = 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 holds the first global occurrence -> unchanged (modulo normalize)
    assert(out(1L) === a)
    // doc 2 loses exactly the 16 quote tokens, prefix and suffix survive
    assert(out(2L) === ((1 to 7).map(i => s"b$i") ++ (1 to 12).map(i => s"c$i")).mkString(" "))
    // doc 3 has no repeats -> byte-identical
    assert(out(3L) === other)
    // matching is case-insensitive, but the rewrite preserves RAW casing:
    // an uppercased copy of the quote is still cut, and kept tokens keep case
    val cased = Seq((20L, quote + " Tail One Two"), (21L, quote.toUpperCase + " Mixed Case Tail"))
      .toDF("doc_id", "text")
    val casedOut = TrainingData.removeRepeatedSpans(cased, "doc_id", "text", window = 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(casedOut(20L) === quote + " Tail One Two")  // first occurrence, casing intact
    assert(casedOut(21L) === "Mixed Case Tail")        // upper copy cut; tail keeps case
    // a full duplicate pair: the copy collapses to overlap remnants only
    val dup = Seq((10L, other), (11L, other)).toDF("doc_id", "text")
    val dedup = TrainingData.removeRepeatedSpans(dup, "doc_id", "text", window = 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dedup(10L) === other)
    assert(dedup(11L) === "") // every token covered by some repeated window
  }

  test("span rewrites: untouched docs byte-identical (whitespace intact); all-repeats doc is linear") {
    val quote = (1 to 16).map(i => s"q$i").mkString(" ")
    // a code-shaped doc with newlines/tabs and no repeated span must come
    // back BYTE-identical — a corpus-wide single-space re-join would destroy
    // the structure of every code/markdown doc to cut spans from a few
    val code = "def f(x):\n\treturn x + 1\n\n# " + (1 to 12).map(i => s"u$i").mkString("\n")
    val df = Seq(
      (1L, quote + " " + (1 to 20).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 7).map(i => s"b$i").mkString(" ") + " " + quote),
      (3L, code)).toDF("doc_id", "text")
    val out = TrainingData.removeRepeatedSpans(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L) === code)
    val bench = Seq((100L, quote)).toDF("doc_id", "text")
    val dOut = TrainingData.decontaminateSpans(df, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dOut(3L) === code)
    assert(dOut(2L) === (1 to 7).map(i => s"b$i").mkString(" ")) // quote cut, prefix kept
    // the streaming gate shares the contract: clean docs pass through untouched
    val gated = TrainingData.decontaminateSpansGate(bench, "doc_id", "text")(df)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gated(3L) === code)
    assert(gated(2L) === (1 to 7).map(i => s"b$i").mkString(" "))
    // pathological all-repeats shape (cuts ≈ tokens — the quadratic worst
    // case of the old per-token exists scan): a full duplicate of a 4000-token
    // doc. The copy collapses to ''; the original is untouched.
    val big = (1 to 4000).map(i => s"t${i % 97}x$i").mkString(" ")
    val dd = TrainingData.removeRepeatedSpans(
        Seq((10L, big), (11L, big)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dd(10L) === big && dd(11L) === "")
  }

  test("mixing and sampling accept non-string strata (cast to string against the targets' keys)") {
    // an int region code as the stratum: targets are keyed by its string
    // form; gate construction must not ClassCastException on getString
    val df = Seq((1L, 7, "w w w w"), (2L, 7, "w w"), (3L, 9, "w w w"),
      (4L, 9, "w"), (5L, 3, "w w")).toDF("doc_id", "region", "text")
    val mixed = TrainingData.mixToTargets(df, "region", "doc_id", "text",
      Map("7" -> 0.5, "9" -> 0.5))
    assert(mixed.select("doc_id").collect().map(_.getLong(0)).toSet
      .subsetOf(Set(1L, 2L, 3L, 4L)))                       // region 3 untargeted
    val sampled = TrainingData.hashStratifiedSample(df, "region", "doc_id",
      Map("7" -> 1.0), resolution = 1000)
    assert(sampled.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    val up = TrainingData.upsampleToTargets(df, "region", "doc_id", "text",
      Map("7" -> 0.5, "9" -> 0.5), factor = 1.0)
    assert(up.select("doc_id").collect().map(_.getLong(0)).toSet
      .subsetOf(Set(1L, 2L, 3L, 4L)))
  }

  test("upsampleToTargets: exact integer multiplicity replicates, fractional is hash-gated, deterministic") {
    // aa: 10 docs x 10 tokens = 100; bb: 90 docs x 10 tokens = 900.
    // targets 50/50 at factor 1.0 -> T = 1000, r_aa = 500/100 = 5.0 exactly
    // (5 full copies, no fractional), r_bb = 500/900 ~ 0.5556 (hash-gated
    // single copies at thr ~ 555556)
    val rows = (1L to 10L).map(i => (i, "aa", ("w " * 10).trim)) ++
      (11L to 100L).map(i => (i, "bb", ("w " * 10).trim))
    val df = rows.toDF("doc_id", "lang", "text")
    val out = TrainingData.upsampleToTargets(df, "lang", "doc_id", "text",
        Map("aa" -> 0.5, "bb" -> 0.5), factor = 1.0)
      .select(col("doc_id"), col("lang"), col("copy"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // every aa doc appears exactly 5 times, copies 0..4
    (1L to 10L).foreach(i => assert(byDoc(i) === Seq(0L, 1L, 2L, 3L, 4L)))
    // bb docs appear 0 or 1 times; the kept fraction tracks 5/9
    val bbKept = (11L to 100L).count(byDoc.contains)
    assert((11L to 100L).forall(i => byDoc.getOrElse(i, Seq()).size <= 1))
    assert(bbKept > 30 && bbKept < 70, s"bb kept $bbKept of 90, expected ~50")
    // aa + bb token budgets land near 500 each (the 50/50 target)
    assert(out.count(_._2 == "aa") === 50)
    // fully deterministic: a second run is row-identical
    val again = TrainingData.upsampleToTargets(df, "lang", "doc_id", "text",
        Map("aa" -> 0.5, "bb" -> 0.5), factor = 1.0)
      .select(col("doc_id"), col("lang"), col("copy"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sorted.toSeq === again.sorted.toSeq)
    // non-targeted strata emit nothing; null strata emit nothing
    val extra = (Seq((200L, "cc", "w w"), (201L, null.asInstanceOf[String], "w w")) ++ rows)
      .toDF("doc_id", "lang", "text")
    val ids = TrainingData.upsampleToTargets(extra, "lang", "doc_id", "text",
        Map("aa" -> 0.5, "bb" -> 0.5), factor = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(200L) && !ids.contains(201L))
    // multiplicity guard: a 2-token stratum given a 50% share of a
    // 902-token total needs r ~ 225 copies — over an explicit cap of 100
    val lop = (Seq((300L, "cc", "w w")) ++ (11L to 100L).map(i =>
      (i, "bb", ("w " * 10).trim))).toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      TrainingData.upsampleToTargets(lop, "lang", "doc_id", "text",
        Map("cc" -> 0.5, "bb" -> 0.5), factor = 1.0, maxMultiplicity = 100.0)
    }
    assert(e.getMessage.contains("maxMultiplicity"))
  }

  test("dedupParagraphs: global first keeper, later occurrences cut, case-insensitive, untouched docs byte-intact") {
    val df = Seq(
      (1L, "shared header\nunique body one\nshared footer"),
      (2L, "shared header\nunique body two\n\nshared footer"),
      (3L, "totally original\n\twith   odd whitespace"),
      (4L, "repeat me\nrepeat me\nother"),
      (5L, "SHARED HEADER\nmine"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TrainingData.dedupParagraphs(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // doc 1 holds the first occurrence of header and footer — untouched
    assert(out(1L).get === "shared header\nunique body one\nshared footer")
    // doc 2 loses both; its blank line survives (never censused)
    assert(out(2L).get === "unique body two\n")
    // no repeated line at all — byte-identical, tabs and spacing intact
    assert(out(3L).get === "totally original\n\twith   odd whitespace")
    // WITHIN-document repeat: first kept, second cut
    assert(out(4L).get === "repeat me\nother")
    // matching is trim+lower — the shouted copy is a duplicate of doc 1's
    assert(out(5L).get === "mine")
    assert(out(6L).isEmpty) // null stays null
  }

  test("removeBoilerplate: repeated non-blank lines cut, blank lines and clean docs byte-intact") {
    val header = "SITE NAV | home | products | about"
    val footer = "(c) example industries - all rights reserved"
    val docs = (1L to 5L).map { i =>
      (i, s"$header\n\nunique body line $i\nmore body $i\n$footer")
    } :+ (6L, "totally clean doc\nwith its own\nlines") :+
      (7L, null.asInstanceOf[String])
    val out = TrainingData.removeBoilerplate(
        docs.toDF("doc_id", "text"), "doc_id", "text", minDocs = 4)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // header+footer appear in 5 >= 4 docs -> cut; blank line + bodies stay
    (1L to 5L).foreach { i =>
      assert(out(i).get === s"\nunique body line $i\nmore body $i")
    }
    assert(out(6L).get === "totally clean doc\nwith its own\nlines") // untouched
    assert(out(7L).isEmpty)                                          // null stays null
    // normalization: case/padding variants of the same line still censused together
    val variants = (10L to 13L).map(i => (i, s"  ${header.toUpperCase}  \nbody $i"))
    val vOut = TrainingData.removeBoilerplate(
        (docs ++ variants).toDF("doc_id", "text"), "doc_id", "text", minDocs = 8)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // header now hits 9 docs (5 exact + 4 shouted) >= 8; footer only 5 -> kept
    assert(vOut(10L).get === "body 10")
    assert(vOut(1L).get === s"\nunique body line 1\nmore body 1\n$footer")
  }

  test("decontaminateSpansGate: fingerprint-count guard trips above maxFingerprints") {
    val bench = Seq(
      (1L, (1 to 40).map(i => s"g$i").mkString(" ")),
      (2L, (100 to 140).map(i => s"g$i").mkString(" "))).toDF("doc_id", "text")
    // 25 + 26 stride-1 windows = 51 distinct fingerprints: over a cap of 10
    val e = intercept[IllegalArgumentException] {
      TrainingData.decontaminateSpansGate(bench, "doc_id", "text",
        maxFingerprints = 10L)
    }
    assert(e.getMessage.contains("no shuffle fallback"))
    // at a sufficient cap the same benchmark builds fine
    val gate = TrainingData.decontaminateSpansGate(bench, "doc_id", "text",
      maxFingerprints = 100L)
    val out = gate(Seq((5L, (1 to 16).map(i => s"g$i").mkString(" ") + " tail"))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(5L) === "tail")
  }

  test("leakFreeSplit: no near-dup pair straddles a split; singletons hash-split by own id (sf0.01)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = TrainingData.leakFreeSplit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size === docs.count())
    // the leakage property, checked against the pair set itself
    val pairs = graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text", 5, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus must contain near-dups for this spec to bite")
    pairs.foreach { case (a, b) =>
      assert(out(a)._2 === out(b)._2, s"pair ($a,$b) straddles splits: ${out(a)}, ${out(b)}")
      assert(out(a)._1 === out(b)._1, s"pair ($a,$b) has different roots")
    }
    // singletons: root = self, split = hash of own id
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val single = out.keys.filterNot(inPairs).take(20)
    single.foreach { id =>
      assert(out(id)._1 === id)
      val b = ((graft.expressions.Fnv1a.hash(id.toString.getBytes("UTF-8")) % 100) + 100) % 100
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(out(id)._2 === want)
    }
    // splits are all populated at this corpus size
    assert(out.values.map(_._2).toSet === Set("train", "val", "test"))
  }

  test("mixToTargets: binding stratum keeps all; keep set equals the plain-Scala replay") {
    // a: 100 tokens total, b: 400, c: 1000; targets (a .25, b .25, c .5)
    // -> T/p = (400, 1600, 2000), M = 400 binds on a:
    // thresholds a = 1e6 (keep all), b = 250000, c = 200000
    val docs = ((1 to 10).map(i => (i.toLong, "a", ("w " * 10).trim)) ++
      (11 to 50).map(i => (i.toLong, "b", ("w " * 10).trim)) ++
      (51 to 150).map(i => (i.toLong, "c", ("w " * 10).trim)) ++
      Seq((999L, "zz", ("w " * 10).trim))) // stratum absent from targets
      .toDF("doc_id", "lang", "text")
    val targets = Map("a" -> 0.25, "b" -> 0.25, "c" -> 0.5)
    val kept = TrainingData.mixToTargets(docs, "lang", "doc_id", "text", targets)
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1))
    val byLang = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLang.getOrElse("a", Set.empty) === (1L to 10L).toSet) // binding stratum: all kept
    assert(!byLang.contains("zz")) // untargeted stratum dropped
    // exact replay of the rule in plain Scala — thresholds AND hash decision
    def keepOf(id: Long, thr: Int): Boolean = {
      val h = graft.expressions.Fnv1a.hash(id.toString.getBytes("UTF-8"))
      (((h % 1000000L) + 1000000L) % 1000000L) < thr
    }
    val thrB = math.round(0.25 * 400.0 / 400.0 * 1000000).toInt
    val thrC = math.round(0.5 * 400.0 / 1000.0 * 1000000).toInt
    assert(byLang.getOrElse("b", Set.empty) ===
      (11L to 50L).filter(keepOf(_, thrB)).toSet)
    assert(byLang.getOrElse("c", Set.empty) ===
      (51L to 150L).filter(keepOf(_, thrC)).toSet)
    // deterministic: a second run is identical
    val again = TrainingData.mixToTargets(docs, "lang", "doc_id", "text", targets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept.map(_._1).toSet)
  }

  test("temperatureMix: sqrt-derived shares and keep set equal the plain-Scala replay") {
    // token census: a = 100, b = 400 -> w = (10, 20), p = (1/3, 2/3);
    // t/p: a = 300, b = 600 -> a binds (keeps everything), b thins to ~1/2
    val docs = ((1 to 10).map(i => (i.toLong, "a", ("w " * 10).trim)) ++
      (11 to 50).map(i => (i.toLong, "b", ("w " * 10).trim))).toDF("doc_id", "lang", "text")
    // strata deliberately passed unsorted: the normalizer must fold in
    // SORTED order regardless
    val kept = TrainingData.temperatureMix(docs, "lang", "doc_id", "text", Seq("b", "a"))
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1))
    val byLang = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLang.getOrElse("a", Set.empty) === (1L to 10L).toSet)
    // exact replay: sqrt shares, sorted-order normalizer, binding-stratum
    // thresholds, FNV hash gate
    val wA = math.sqrt(100.0); val wB = math.sqrt(400.0)
    val wTot = 0.0 + wA + wB
    val pA = wA / wTot; val pB = wB / wTot
    val m = math.min(100L / pA, 400L / pB)
    val thrB = math.round(pB * m / 400L * 1000000).toInt
    assert(math.round(pA * m / 100L * 1000000).toInt === 1000000)
    def keepOf(id: Long, thr: Int): Boolean = {
      val h = graft.expressions.Fnv1a.hash(id.toString.getBytes("UTF-8"))
      (((h % 1000000L) + 1000000L) % 1000000L) < thr
    }
    assert(byLang.getOrElse("b", Set.empty) ===
      (11L to 50L).filter(keepOf(_, thrB)).toSet)
    // a stratum with no measured tokens is a hard error, not a silent 0-share
    intercept[IllegalArgumentException] {
      TrainingData.temperatureMixFilter(docs, "lang", "doc_id", "text", Seq("a", "nope"))
    }
  }

  test("unimaxMix: water level caps small strata at epochCap, rest share the remainder") {
    // census: aa = 100 tokens (10 docs), bb = 500 (50 docs), cc = 1000 (100
    // docs); epochCap 2 -> capacities (200, 1000, 2000). budget 1400:
    // theta_0 = 1400/3 > 200 infeasible, theta_1 = (1400-200)/2 = 600 <=
    // 1000 -> water level 600. aa capped (r = 2.0 exactly: every doc twice,
    // no fractional gate), bb r = 600/500 = 1.2 (one full copy + 20%
    // hash-gated second), cc r = 0.6 (hash-gated single copies only).
    val docs = ((1 to 10).map(i => (i.toLong, "aa", ("w " * 10).trim)) ++
      (11 to 60).map(i => (i.toLong, "bb", ("w " * 10).trim)) ++
      (61 to 160).map(i => (i.toLong, "cc", ("w " * 10).trim)) ++
      Seq((999L, "zz", ("w " * 10).trim))) // stratum outside the mixture
      .toDF("doc_id", "lang", "text")
    // strata deliberately unsorted: capacity order, not input order, rules
    val out = TrainingData.unimaxMix(docs, "lang", "doc_id", "text",
        Seq("cc", "aa", "bb"), budget = 1400.0, epochCap = 2.0)
      .select(col("doc_id"), col("lang"), col("copy"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // capped stratum: exactly 2 copies of every doc
    (1L to 10L).foreach(i => assert(byDoc(i) === Seq(0L, 1L), s"aa doc $i"))
    // water-level strata: exact replay of the FNV fractional gate
    def keepOf(id: Long, thr: Int): Boolean = {
      val h = graft.expressions.Fnv1a.hash(id.toString.getBytes("UTF-8"))
      (((h % 1000000L) + 1000000L) % 1000000L) < thr
    }
    val thrBb = math.round((1.2 - 1.0) * 1000000).toInt
    val thrCc = math.round(0.6 * 1000000).toInt
    (11L to 60L).foreach { i =>
      val expect = if (keepOf(i, thrBb)) Seq(0L, 1L) else Seq(0L)
      assert(byDoc(i) === expect, s"bb doc $i")
    }
    (61L to 160L).foreach { i =>
      val expect = if (keepOf(i, thrCc)) Seq(0L) else Seq.empty[Long]
      assert(byDoc.getOrElse(i, Seq.empty) === expect, s"cc doc $i")
    }
    assert(!byDoc.contains(999L)) // untargeted stratum emits nothing
    // budget >= total capacity: every stratum capped at epochCap exactly
    val capped = TrainingData.unimaxMix(docs, "lang", "doc_id", "text",
        Seq("aa", "bb", "cc"), budget = 5000.0, epochCap = 2.0)
      .groupBy(col("lang")).agg(countDistinct(col("copy")).as("nc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped === Map("aa" -> 2L, "bb" -> 2L, "cc" -> 2L))
    // fractional budget form: 0.875 of the 1600-token census = 1400 absolute
    val frac = TrainingData.unimaxMix(docs, "lang", "doc_id", "text",
        Seq("cc", "aa", "bb"), budget = 0.875, epochCap = 2.0,
        budgetIsFraction = true)
      .select(col("doc_id"), col("lang"), col("copy"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(frac.sorted.toSeq === out.sorted.toSeq)
    // a zero-token stratum is a hard error, not a silent 0-share
    intercept[IllegalArgumentException] {
      TrainingData.unimaxFilter(docs, "lang", "doc_id", "text",
        Seq("aa", "nope"), budget = 100.0)
    }
  }

  test("fuzzyDecontaminate above the broadcast gate: shuffle-join fallback is row-identical") {
    // broadcastMaxRows = 0 forces the fallback path (plain joins, no
    // broadcast hints) that a too-large delta/bench side takes at scale —
    // it must produce exactly the broadcast path's rows
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val bench = docs.filter(col("doc_id") % 7 === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val viaBroadcast = key(TrainingData.fuzzyDecontaminate(docs, bench, "doc_id", "text"))
    val viaShuffle = key(TrainingData.fuzzyDecontaminate(docs, bench, "doc_id", "text",
      broadcastMaxRows = 0L))
    assert(viaBroadcast.nonEmpty)
    assert(viaShuffle === viaBroadcast)
    // dedupAgainst inherits the gate through the same parameter
    val keptB = TrainingData.dedupAgainst(bench, docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptS = TrainingData.dedupAgainst(bench, docs, "doc_id", "text",
      broadcastMaxRows = 0L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptS === keptB)
  }

  test("fuzzyDecontaminate finds an edited benchmark copy that exact overlap under-scores") {
    val train = Seq(
      (1L, phrase + " one two three four five six seven eight nine ten"),
      (2L, "unrelated filler text that shares nothing with the benchmark at all today")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, phrase + " one two three four five six seven eight nine TEN"))
      .toDF("doc_id", "text") // one token edited
    val out = TrainingData.fuzzyDecontaminate(train, bench, "doc_id", "text",
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((1L, 100L)))
  }

  test("importanceWeights ranks target-domain docs above off-domain docs, 0 for token-less") {
    val train = Seq(
      (1L, "quantum physics entanglement superposition qubits decoherence"),
      (2L, "football goals referee penalty offside league"),
      (3L, "quantum qubits physics lab experiment"),
      (4L, "   ")
    ).toDF("doc_id", "text")
    val target = Seq((100L, "quantum physics qubits entanglement experiments"))
      .toDF("doc_id", "text")
    val got = TrainingData.importanceWeights(train, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L) && got(3L) > got(2L),
      s"target-domain docs must outscore off-domain: $got")
    assert(got(4L) === 0.0)
  }

  test("importanceWeights matches a driver-side replay on the sf0.01 corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val target = docs.filter(col("doc_id") % 7 === 0)
    val got = TrainingData.importanceWeights(docs, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // replay: tokenize, bucket by fnv1a64 mod 4096, smoothed LLR, l-t-r sum
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def toks(s: String): Array[String] =
      s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    def bucket(t: String): Int = java.lang.Math.floorMod(fnv(t), 4096L).toInt
    val B = 4096
    val ct = new Array[Long](B); val cr = new Array[Long](B)
    texts.foreach { case (id, s) =>
      toks(s).foreach { t =>
        cr(bucket(t)) += 1
        if (id % 7 == 0) ct(bucket(t)) += 1
      }
    }
    val (tt, rt) = (ct.sum, cr.sum)
    val w = Array.tabulate(B)(b =>
      math.log((ct(b) + 1.0) / (tt + B.toDouble)) - math.log((cr(b) + 1.0) / (rt + B.toDouble)))
    val want = texts.map { case (id, s) =>
      var acc = 0.0
      toks(s).foreach(t => acc += w(bucket(t)))
      id -> BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    assert(got === want)
  }

  test("dsirSample is deterministic and prefers target-domain documents") {
    val rng = new scala.util.Random(5)
    def fill(words: Seq[String], n: Int) = Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" ")
    val domain = Seq("quantum", "physics", "qubits", "entanglement", "decoherence")
    val offdom = Seq("football", "referee", "goals", "penalty", "league")
    val train = ((1L to 20L).map(i => (i, fill(domain, 30))) ++
      (21L to 40L).map(i => (i, fill(offdom, 30)))).toDF("doc_id", "text")
    val target = Seq((100L, fill(domain, 50))).toDF("doc_id", "text")
    val a = TrainingData.dsirSample(train, target, "doc_id", "text", k = 10)
      .collect().map(_.getLong(0)).toSeq
    val b = TrainingData.dsirSample(train, target, "doc_id", "text", k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b, "content-addressed Gumbel keys must make the sample reproducible")
    assert(a.size === 10)
    // Gumbel noise can promote a few off-domain docs, but the bulk of the
    // sample must come from the domain half (llr gap >> noise scale here)
    assert(a.count(_ <= 20L) >= 8, s"expected mostly domain docs, got $a")
  }

  test("dedupAgainst drops exactly the fresh docs with a near-dup in the corpus (sf0.01)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val fresh = docs.filter(col("doc_id") % 7 === 0)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val kept = TrainingData.dedupAgainst(fresh, corpus, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val sh = graft.dedup.Dedup.shingleSets(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val freshIds = sh.keys.filter(_ % 7 == 0).toSet
    val dups = for {
      f <- freshIds; c <- sh.keys if c % 7 != 0
      inter = (sh(f) & sh(c)).size
      union = sh(f).size + sh(c).size - inter
      if union > 0 && BigDecimal(inter.toDouble / union)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.8
    } yield f
    assert(dups.nonEmpty, "corpus must contain cross-slice near-dups for this spec to bite")
    assert(kept === freshIds -- dups)
  }

  test("cross-corpus operators degrade cleanly on empty/degenerate inputs") {
    val docs = Seq((1L, phrase), (2L, "short")).toDF("doc_id", "text")
    val empty = docs.filter(col("doc_id") < 0)
    // empty benchmark → nothing contaminated; empty corpus → nothing dropped
    assert(TrainingData.fuzzyDecontaminate(docs, empty, "doc_id", "text").count() === 0)
    assert(TrainingData.dedupAgainst(docs, empty, "doc_id", "text").count() === 2)
    assert(TrainingData.dedupAgainst(empty, docs, "doc_id", "text").count() === 0)
    // empty target → uniform smoothing only; scores still defined for all docs
    assert(TrainingData.importanceWeights(docs, empty, "doc_id", "text").count() === 2)
    // k larger than the corpus → the whole corpus, no error
    assert(TrainingData.dsirSample(docs, docs, "doc_id", "text", k = 10).count() === 2)
  }

  test("chunkDocs lays out overlapping windows with deterministic identity") {
    val toks = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, toks), (2L, ""), (3L, "a b c")).toDF("doc_id", "text")
    val out = TrainingData.chunkDocs(df, "doc_id", "text", chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: 10 tokens, starts 0,3,6,9 → lengths 4,4,4,1
    assert(out.filter(_._1 == 1L).sortBy(_._2) === Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"), (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"), (1L, 3L, 1L, "t10")))
    assert(!out.exists(_._1 == 2L)) // token-less doc → no chunks
    assert(out.filter(_._1 == 3L) === Seq((3L, 0L, 3L, "a b c")))
  }

  test("hashStratifiedSample is a pure function of (key, stratum): layout-independent") {
    val rows = (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "de"))
    val df1 = rows.toDF("doc_id", "lang")
    val df2 = rows.reverse.toDF("doc_id", "lang").repartition(7) // different layout
    val fr = Map("en" -> 0.5, "de" -> 0.25)
    def ids(df: org.apache.spark.sql.DataFrame) =
      TrainingData.hashStratifiedSample(df, "lang", "doc_id", fr)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = ids(df1)
    assert(ids(df2) === s1) // sampleBy would differ here; hash sampling cannot
    // rates land near the requested fractions
    val en = s1.count(_ % 2 == 0) / 200.0
    val de = s1.count(_ % 2 == 1) / 200.0
    assert(math.abs(en - 0.5) < 0.15 && math.abs(de - 0.25) < 0.15)
  }

  test("hashReservoirK: exact k per stratum, window-equal, bottom-k growth property") {
    import org.apache.spark.sql.functions.{col, row_number}
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 300L).map(i => (i, if (i % 3 == 0) "en" else "de"))
    val df = rows.toDF("doc_id", "lang")
    val out = TrainingData.hashReservoirK(df, "lang", "doc_id", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // exact count per stratum (both strata have ≥ 7 members)
    assert(out.count(_._1 == "en") === 7 && out.count(_._1 == "de") === 7)
    // equals the window formulation (heap agg == row_number, rank included)
    val win = df
      .withColumn("__h", graft.functions.TextFunctions.fnv1a64(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("__h"), col("doc_id"))))
      .filter(col("rn") <= 7)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3)))
    assert(out.toSet === win.toSet)
    // layout-independence: a reshuffled frame yields the identical sample
    val out2 = TrainingData.hashReservoirK(
        rows.reverse.toDF("doc_id", "lang").repartition(7), "lang", "doc_id", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out2.toSet === out.toSet)
    // bottom-k growth: extending the corpus can only replace members with
    // SMALLER-hash newcomers — survivors keep their relative hash order
    val grown = TrainingData.hashReservoirK(
        (rows ++ (301L to 400L).map(i => (i, "en"))).toDF("doc_id", "lang"),
        "lang", "doc_id", 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val survivors = grown.filter { case (_, id) => id <= 300L }
    assert(survivors.subsetOf(out.map(o => (o._1, o._2)).toSet))
    assert(grown.filter(_._1 == "de") === out.filter(_._1 == "de").map(o => (o._1, o._2)).toSet)
  }

  test("stratifiedSample is seed-deterministic and tracks requested fractions (sf0.01)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val fr = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "es" -> 0.25, "zh" -> 0.25)
    val s1 = TrainingData.stratifiedSample(docs, "lang", fr, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = TrainingData.stratifiedSample(docs, "lang", fr, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2) // same seed → identical sample
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = TrainingData.stratifiedSample(docs, "lang", fr, seed = 7L)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Bernoulli sd on the smallest stratum (~64 rows at 0.25) is ~0.054;
    // gate at ~4 sigma so the check catches wrong-fraction bugs, not noise
    fr.foreach { case (lang, f) =>
      val got = sampled.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(got - f) < 0.22, s"$lang sampled $got vs requested $f")
    }
  }

  test("crossSourceOverlap: distinct shared shingles per pair, within-source dups collapse") {
    val docs = Seq(
      (1L, "A", "a b c d e f"),   // shingles: abcde, bcdef
      (2L, "A", "a b c d e x"),   // abcde again (collapses within A), bcdex
      (3L, "B", "a b c d e f"),   // same two as doc 1
      (4L, "C", "z z z z z")      // disjoint
    ).toDF("doc_id", "source", "text")
    val out = TrainingData.crossSourceOverlap(docs, "source", "text", n = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // A = {abcde, bcdef, bcdex} (3), B = {abcde, bcdef} (2): shared 2,
    // jaccard 2/(3+2−2); C overlaps nothing → no row
    assert(out === Array(("A", "B", 2L, math.rint(2.0 / 3.0 * 1e6) / 1e6)))
  }

  test("bpePairStats counts word-weighted adjacent pairs, ties lexicographic") {
    val docs = Seq(
      (1L, "aba aba cd"),        // aba ×2 here
      (2L, "aba Xy 42 b"),       // Xy lowercased in; 42/b filtered (digits, length)
      (3L, "cd cd")
    ).toDF("doc_id", "text")
    val out = TrainingData.bpePairStats(docs, "text", topPairs = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // aba ×3 → ab:3, ba:3; cd ×3 → cd:3; ties lexicographic, then xy:1
    assert(out === Seq("ab" -> 3L, "ba" -> 3L, "cd" -> 3L, "xy" -> 1L))
  }

  test("bpePairStats explodes pairs on the distinct-word table, not the corpus") {
    val docs = (1L to 200L).map(i => (i, "hello world hello")).toDF("doc_id", "text")
    val out = TrainingData.bpePairStats(docs, "text", topPairs = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // word counts (hello 400, world 200), NOT doc counts — pair totals are
    // word-weighted: hello contributes he/el/ll/lo, world wo/or/rl/ld
    assert(out("he") === 400L && out("lo") === 400L && out("wo") === 200L)
    assert(out.size === 8)
  }

  test("groupBudgetSelect: inclusive cap per group; order decides who makes the cut") {
    val df = Seq(
      ("s1", 1L, 9.0, 3L), ("s1", 2L, 8.0, 2L), ("s1", 3L, 7.0, 2L), // cum 3,5,7
      ("s2", 4L, 5.0, 5L), ("s2", 5L, 4.0, 1L)                        // cum 5,6
    ).toDF("src", "doc_id", "quality", "n_tokens")
    val kept = TrainingData.groupBudgetSelect(df, col("src"),
        Seq(col("quality").desc, col("doc_id").asc), col("n_tokens"), 5L)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    // s1: docs 1 (cum 3) and 2 (cum 5 — exactly at budget, kept); doc 3 over.
    // s2: doc 4 (cum 5); doc 5 would reach 6.
    assert(kept === Map(1L -> 3L, 2L -> 5L, 4L -> 5L))
  }
}
