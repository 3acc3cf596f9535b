package graft.streaming

import graft.SparkSpec
import graft.core.{Stream, Topic, Topology}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** End-to-end showcase: the LLM corpus-curation operators (normalize →
  * fingerprint → quality score → token count → dedup → filter) composed as a
  * reference-style topology and run BOTH as a live Structured Streaming job
  * and as a batch experiment over the same rows — the engine's two execution
  * contexts producing the same curated corpus from one DAG definition.
  */
case class RawDoc(doc_id: Long, ts: Timestamp, text: String)
case class LangDoc(doc_id: Long, ts: Timestamp, lang: String, text: String)

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private val docs = Seq(
    RawDoc(1, t("2024-01-01 00:00:01"),
      "the quick brown fox jumps over the lazy dog while the cat sleeps near the fire"),
    RawDoc(2, t("2024-01-01 00:00:02"),
      "The quick brown fox jumps over the lazy dog, while the cat sleeps near the fire!"),
    // ^ doc 2 normalizes to doc 1's text → dropped by dedup
    RawDoc(3, t("2024-01-01 00:00:03"),
      "here is another long and reasonably well formed document about the spark engine and its many operators"),
    RawDoc(4, t("2024-01-01 00:00:04"), "x")) // degenerate → quality-filtered

  /** Stateless curation transform (shared verbatim by both contexts). */
  private val curate: DataFrame => DataFrame = df => df
    .withColumn("fp", TF.fingerprintMod(TF.normalizeText(col("text"))))
    .withColumn("quality", TF.qualityScore(col("text")))
    .withColumn("n_tokens", TF.tokenCount(col("text")).cast("long"))

  /** Stateful tail: dedup on the content fingerprint, then quality gate.
    * Streaming uses watermarked state; batch keeps the earliest row per
    * fingerprint — same multiset for in-order arrival.
    */
  private val streamTail: DataFrame => DataFrame = df =>
    StreamRunner.streamingDedup(df, "ts", "10 seconds", Seq("fp"))
      .filter(col("quality") >= 0.3)
  private val batchTail: DataFrame => DataFrame = df => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("ts"), col("doc_id"))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
      .filter(col("quality") >= 0.3)
  }

  private def topology(tail: DataFrame => DataFrame) = Topology(
    entities = Map(
      "raw-docs"     -> Topic("raw-docs"),
      "curate"       -> Stream("curate", curate),
      "dedup-filter" -> Stream("dedup-filter", tail),
      "curated-docs" -> Topic("curated-docs")),
    workflow = Seq(
      "raw-docs" -> "curate",
      "curate" -> "dedup-filter",
      "dedup-filter" -> "curated-docs"))

  test("curation topology: streaming run equals the batch experiment") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[RawDoc]
    in.addData(docs: _*)
    val engine = StreamRunner.start(
      topology(streamTail), Map("raw-docs" -> in.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_curated").trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()
    val streamed = spark.table("t_curated")
      .select("doc_id", "fp", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = topology(batchTail)
      .experiment(Map("raw-docs" -> docs.toDF()))("curated-docs")
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("fp"), r.getAs[Long]("n_tokens"))).toSet

    assert(streamed === batch)
    // docs 1 and 3 survive: 2 is a near-exact dup of 1 (same normalized
    // fingerprint), 4 fails the quality gate
    assert(streamed.map(_._1) === Set(1L, 3L))
  }

  test("streaming Gopher quality gate: same keeps in live stream and batch experiment") {
    implicit val sqlCtx = spark.sqlContext
    // gopherFlags is a stateless one-pass projection, so the SAME transform
    // runs verbatim as a streaming filter — no state store, no watermark
    val longDoc = ("the be to of and that have with " * 8 +
      "alpha beta gamma delta " * 5).trim
    val rows = Seq(
      RawDoc(11, t("2024-01-01 00:00:01"), longDoc),            // passes all rules
      RawDoc(12, t("2024-01-01 00:00:02"), "way too short"),    // word-count rule
      RawDoc(13, t("2024-01-01 00:00:03"),
        (("the be to of and " * 10).trim + " " + "# " * 30).trim)) // symbol rule
    val gate: DataFrame => DataFrame =
      df => df.filter(TF.gopherFlags(col("text")).getField("keep"))
    val topo = Topology(
      entities = Map(
        "raw-docs" -> Topic("raw-docs"),
        "gate"     -> Stream("gate", gate),
        "clean"    -> Topic("clean")),
      workflow = Seq("raw-docs" -> "gate", "gate" -> "clean"))

    val in = MemoryStream[RawDoc]
    in.addData(rows: _*)
    val engine = StreamRunner.start(
      topo, Map("raw-docs" -> in.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_gopher").trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()
    val streamed = spark.table("t_gopher").select("doc_id").collect().map(_.getLong(0)).toSet

    val batch = topo.experiment(Map("raw-docs" -> rows.toDF()))("clean")
      .map(_.getAs[Long]("doc_id")).toSet

    assert(streamed === batch)
    assert(streamed === Set(11L))
  }

  test("streaming mixture gate: batch-census thresholds apply verbatim to the live stream") {
    implicit val sqlCtx = spark.sqlContext
    // census corpus (historical batch): 'aa' scarce, 'bb' abundant — equal
    // targets force downsampling of bb while aa keeps everything
    val census = ((1 to 5).map(i => (i.toLong, "aa", ("w " * 10).trim)) ++
      (6 to 55).map(i => (i.toLong, "bb", ("w " * 10).trim)))
      .toDF("doc_id", "lang", "text")
    val gate = graft.pipeline.TrainingData.mixFilter(
      census, "lang", "doc_id", "text", Map("aa" -> 0.5, "bb" -> 0.5))
    val incoming = ((101 to 110).map(i => LangDoc(i.toLong, t("2024-01-01 00:00:01"), "aa", "fresh doc")) ++
      (111 to 160).map(i => LangDoc(i.toLong, t("2024-01-01 00:00:02"), "bb", "fresh doc"))).toSeq
    val topo = Topology(
      entities = Map(
        "raw-docs" -> Topic("raw-docs"),
        "mix"      -> Stream("mix", gate),
        "mixed"    -> Topic("mixed")),
      workflow = Seq("raw-docs" -> "mix", "mix" -> "mixed"))
    val in = MemoryStream[LangDoc]
    in.addData(incoming: _*)
    val engine = StreamRunner.start(
      topo, Map("raw-docs" -> in.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_mix").trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()
    val streamed = spark.table("t_mix").select("doc_id").collect().map(_.getLong(0)).toSet

    val batch = topo.experiment(Map("raw-docs" -> incoming.toDF()))("mixed")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(streamed === batch)
    // all 'aa' arrivals pass (binding stratum threshold = resolution);
    // 'bb' arrivals are hash-gated at ~10% (50 tokens-aa vs 500 tokens-bb)
    val aaIds = (101L to 110L).toSet
    assert(aaIds.subsetOf(streamed))
    val bbKept = streamed -- aaIds
    assert(bbKept.size < 20, s"bb should be downsampled hard, kept ${bbKept.size}")
  }

  test("streaming surgical decontamination: spans cut identically in live stream and batch") {
    implicit val sqlCtx = spark.sqlContext
    val answer = (1 to 16).map(i => s"ans$i").mkString(" ")
    val bench = Seq((100L, answer + " trailing words")).toDF("doc_id", "text")
    val gate = graft.pipeline.TrainingData.decontaminateSpansGate(bench, "doc_id", "text")
    val incoming = Seq(
      RawDoc(1, t("2024-01-01 00:00:01"),
        ((1 to 20).map(i => s"pre$i").mkString(" ") + " " + answer + " " +
          (1 to 20).map(i => s"post$i").mkString(" ")).trim),
      RawDoc(2, t("2024-01-01 00:00:02"), (1 to 30).map(i => s"c$i").mkString(" ")))
    val topo = Topology(
      entities = Map(
        "raw-docs" -> Topic("raw-docs"),
        "scrub"    -> Stream("scrub", gate),
        "clean"    -> Topic("clean")),
      workflow = Seq("raw-docs" -> "scrub", "scrub" -> "clean"))
    val in = MemoryStream[RawDoc]
    in.addData(incoming: _*)
    val engine = StreamRunner.start(
      topo, Map("raw-docs" -> in.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_scrub").trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()
    val streamed = spark.table("t_scrub").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = topo.experiment(Map("raw-docs" -> incoming.toDF()))("clean")
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(streamed === batch)
    // the quoted answer is cut, everything else survives verbatim
    assert(streamed(1L) ===
      ((1 to 20).map(i => s"pre$i") ++ (1 to 20).map(i => s"post$i")).mkString(" "))
    assert(streamed(2L) === (1 to 30).map(i => s"c$i").mkString(" "))
  }

  test("streaming windowed heavy hitters: Misra-Gries aggregate state survives the stream") {
    implicit val sqlCtx = spark.sqlContext
    // per-lang item streams with vocabulary <= k, so the sketch is exact and
    // the live result must EQUAL the batch aggregate (the general-case
    // guarantee contract is FreqItemsAggSpec's; this proves the buffer
    // serializes through the streaming state store across triggers)
    val batch1 = Seq(
      LangDoc(1, t("2024-01-01 00:00:01"), "aa", "x"),
      LangDoc(2, t("2024-01-01 00:00:02"), "aa", "x"),
      LangDoc(3, t("2024-01-01 00:00:03"), "bb", "y"))
    val batch2 = Seq(
      LangDoc(4, t("2024-01-01 00:00:04"), "aa", "z"),
      LangDoc(5, t("2024-01-01 00:00:05"), "aa", "x"),
      LangDoc(6, t("2024-01-01 00:00:06"), "bb", "y"))
    val in = MemoryStream[LangDoc]
    val agged = in.toDF().groupBy(col("lang"))
      .agg(TF.freqItems(col("text"), 4).as("hh"))
    val q = agged.writeStream.format("memory").queryName("t_hh")
      .outputMode("complete").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable() // second trigger merges restored state
    } finally q.stop()
    val streamed = spark.table("t_hh").collect().map(r =>
      r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getString(0), e.getLong(1)))).toMap
    val expected = (batch1 ++ batch2).toDF()
      .groupBy(col("lang")).agg(TF.freqItems(col("text"), 4).as("hh"))
      .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getString(0), e.getLong(1)))).toMap
    assert(streamed === expected)
    assert(streamed("aa") === Seq(("x", 3L), ("z", 1L)))
    assert(streamed("bb") === Seq(("y", 2L)))
  }

  test("streaming epoch upsampling: same replicas in live stream and batch experiment") {
    implicit val sqlCtx = spark.sqlContext
    // census corpus: aa 100 tokens, bb 900 tokens -> r_aa = 5.0 exactly,
    // r_bb ~ 0.556 (same arithmetic as the batch spec)
    val censusRows = (1L to 10L).map(i => (i, "aa", ("w " * 10).trim)) ++
      (11L to 100L).map(i => (i, "bb", ("w " * 10).trim))
    val gate = graft.pipeline.TrainingData.upsampleFilter(
      censusRows.toDF("doc_id", "lang", "text"), "lang", "doc_id", "text",
      Map("aa" -> 0.5, "bb" -> 0.5), factor = 1.0)
    val incoming = Seq(
      LangDoc(101, t("2024-01-01 00:00:01"), "aa", ("x " * 10).trim),
      LangDoc(102, t("2024-01-01 00:00:02"), "bb", ("y " * 10).trim),
      LangDoc(103, t("2024-01-01 00:00:03"), "cc", ("z " * 10).trim))
    val topo = Topology(
      entities = Map(
        "raw-docs" -> Topic("raw-docs"),
        "up"       -> Stream("up", gate),
        "epochs"   -> Topic("epochs")),
      workflow = Seq("raw-docs" -> "up", "up" -> "epochs"))
    val in = MemoryStream[LangDoc]
    in.addData(incoming: _*)
    val engine = StreamRunner.start(
      topo, Map("raw-docs" -> in.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_up").trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()
    val streamed = spark.table("t_up").select("doc_id", "copy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val batch = topo.experiment(Map("raw-docs" -> incoming.toDF()))("epochs")
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy"))).sorted
    assert(streamed === batch)
    // the aa arrival replicates exactly 5x; cc (untargeted) emits nothing
    assert(streamed.filter(_._1 == 101L).map(_._2) === Seq(0L, 1L, 2L, 3L, 4L))
    assert(!streamed.exists(_._1 == 103L))
  }

  test("streaming perplexity gate: same keeps in live stream and batch experiment") {
    implicit val sqlCtx = spark.sqlContext
    val target = Seq(
      (100L, "the quantum state collapses when the quantum state is measured"),
      (101L, "quantum computing uses the quantum state of qubits")).toDF("doc_id", "text")
    val incoming = Seq(
      RawDoc(1, t("2024-01-01 00:00:01"),
        "the quantum state of qubits collapses when measured"),   // target-like
      RawDoc(2, t("2024-01-01 00:00:02"),
        "football referee penalty offside corner goalkeeper"),     // off-domain
      RawDoc(3, t("2024-01-01 00:00:03"), "single"))               // degenerate -> nll 0
    // threshold between the two real docs' scores: doc 1 passes, doc 2 drops
    val scores = graft.pipeline.TrainingData.perplexityScore(
        incoming.toDF(), target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) < scores(2L))
    val maxNll = (scores(1L) + scores(2L)) / 2
    val gate = graft.pipeline.TrainingData.perplexityGate(target, "text", maxNll)
    val topo = Topology(
      entities = Map(
        "raw-docs" -> Topic("raw-docs"),
        "ppl"      -> Stream("ppl", gate),
        "kept"     -> Topic("kept")),
      workflow = Seq("raw-docs" -> "ppl", "ppl" -> "kept"))
    val in = MemoryStream[RawDoc]
    in.addData(incoming: _*)
    val engine = StreamRunner.start(
      topo, Map("raw-docs" -> in.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_ppl").trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()
    val streamed = spark.table("t_ppl").select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = topo.experiment(Map("raw-docs" -> incoming.toDF()))("kept")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(streamed === batch)
    // target-like passes, off-domain drops, degenerate (nll = 0) passes at minNll = 0
    assert(streamed === Set(1L, 3L))
    // raising minNll above zero drops the degenerate doc in both contexts
    val strict = graft.pipeline.TrainingData.perplexityGate(
      target, "text", maxNll, minNll = 1e-6)
    val strictBatch = Topology(
      entities = Map(
        "raw-docs" -> Topic("raw-docs"),
        "ppl"      -> Stream("ppl", strict),
        "kept"     -> Topic("kept")),
      workflow = Seq("raw-docs" -> "ppl", "ppl" -> "kept"))
      .experiment(Map("raw-docs" -> incoming.toDF()))("kept")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(strictBatch === Set(1L))
  }

  test("streaming decontamination filter: same drops in live stream and batch experiment") {
    implicit val sqlCtx = spark.sqlContext
    // benchmark corpus = doc 1's text: docs 1 and 2 share 5-grams with it
    // (2 differs only by case/punct, which shingling lowercases away on the
    // intact spans), doc 3 shares none, doc 4 is too short to shingle
    val bench = Seq((100L, docs.head.text)).toDF("doc_id", "text")
    val decon = graft.pipeline.TrainingData.decontaminationFilter(
      bench, "doc_id", "text", n = 5)
    val topo = Topology(
      entities = Map(
        "raw-docs" -> Topic("raw-docs"),
        "decon"    -> Stream("decon", decon),
        "clean"    -> Topic("clean")),
      workflow = Seq("raw-docs" -> "decon", "decon" -> "clean"))

    val in = MemoryStream[RawDoc]
    in.addData(docs: _*)
    val engine = StreamRunner.start(
      topo, Map("raw-docs" -> in.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_decon").trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()
    val streamed = spark.table("t_decon").select("doc_id").collect().map(_.getLong(0)).toSet

    val batch = topo.experiment(Map("raw-docs" -> docs.toDF()))("clean")
      .map(_.getAs[Long]("doc_id")).toSet

    assert(streamed === batch)
    assert(streamed === Set(3L, 4L)) // 1 and 2 are contaminated; 3 clean; 4 unshingleable
  }

  test("streaming fuzzy decontamination gate: drops exactly the batch LSH candidate set") {
    implicit val sqlCtx = spark.sqlContext
    // bench = doc 1's text. Doc 2 is a light edit (most 5-grams shared →
    // minhash bands collide), doc 3 is unrelated, doc 4 too short to shingle.
    val bench = Seq((100L, docs.head.text)).toDF("doc_id", "text")
    val gate = graft.pipeline.TrainingData.fuzzyDecontaminateGate(
      bench, "doc_id", "text", n = 5)
    val topo = Topology(
      entities = Map(
        "raw-docs" -> Topic("raw-docs"),
        "fuzzy"    -> Stream("fuzzy", gate),
        "clean"    -> Topic("clean")),
      workflow = Seq("raw-docs" -> "fuzzy", "fuzzy" -> "clean"))

    val in = MemoryStream[RawDoc]
    in.addData(docs: _*)
    val engine = StreamRunner.start(
      topo, Map("raw-docs" -> in.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_fuzzy").trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()
    val streamed = spark.table("t_fuzzy").select("doc_id").collect().map(_.getLong(0)).toSet

    // live == batch experiment over the same rows
    val batch = topo.experiment(Map("raw-docs" -> docs.toDF()))("clean")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(streamed === batch)

    // candidate-level parity with the batch path: threshold 0 makes
    // fuzzyDecontaminate emit every verified LSH candidate — the gate must
    // drop exactly those documents (same shingles, same signature, same
    // band keys on both sides)
    val candidates = graft.pipeline.TrainingData.fuzzyDecontaminate(
        docs.toDF(), bench, "doc_id", "text", n = 5, threshold = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dropped = docs.map(_.doc_id).toSet -- streamed
    assert(dropped === candidates)
    assert(streamed === Set(3L, 4L)) // 1 exact, 2 near-copy; 3 clean; 4 unshingleable
  }

  test("fuzzyDecontaminateGate: band-bucket guard trips on an over-budget benchmark") {
    val bench = Seq((100L, docs.head.text)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.TrainingData.fuzzyDecontaminateGate(
        bench, "doc_id", "text", n = 5, maxBuckets = 3)
    }
    assert(e.getMessage.contains("maxBuckets"))
  }

  test("streaming temperature-mix gate: census-derived sqrt shares apply verbatim live") {
    implicit val sqlCtx = spark.sqlContext
    // census: 'aa' 100 tokens, 'bb' 400 -> sqrt shares (1/3, 2/3); aa binds
    // (keeps all), bb hash-thins to ~1/2 — same replay as the batch spec
    val census = ((1 to 10).map(i => (i.toLong, "aa", ("w " * 10).trim)) ++
      (11 to 50).map(i => (i.toLong, "bb", ("w " * 10).trim)))
      .toDF("doc_id", "lang", "text")
    val gate = graft.pipeline.TrainingData.temperatureMixFilter(
      census, "lang", "doc_id", "text", Seq("aa", "bb"))
    val incoming = ((101 to 110).map(i => LangDoc(i.toLong, t("2024-01-01 00:00:01"), "aa", "fresh doc")) ++
      (111 to 160).map(i => LangDoc(i.toLong, t("2024-01-01 00:00:02"), "bb", "fresh doc"))).toSeq
    val topo = Topology(
      entities = Map(
        "raw-docs" -> Topic("raw-docs"),
        "tmix"     -> Stream("tmix", gate),
        "mixed"    -> Topic("mixed")),
      workflow = Seq("raw-docs" -> "tmix", "tmix" -> "mixed"))
    val in = MemoryStream[LangDoc]
    in.addData(incoming: _*)
    val engine = StreamRunner.start(
      topo, Map("raw-docs" -> in.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_tmix").trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()
    val streamed = spark.table("t_tmix").select("doc_id").collect().map(_.getLong(0)).toSet
    // live == batch experiment over the same rows: the gate is stateless
    val batch = topo.experiment(Map("raw-docs" -> incoming.toDF()))("mixed")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(streamed === batch)
    // binding stratum passes everything; bb is thinned but not emptied
    val aaIds = (101L to 110L).toSet
    assert(aaIds.subsetOf(streamed))
    val bbKept = streamed -- aaIds
    assert(bbKept.nonEmpty && bbKept.size < 40, s"bb kept ${bbKept.size}")
  }

  test("streaming unimax gate: water-filled epoch replication applies verbatim live") {
    implicit val sqlCtx = spark.sqlContext
    // census as in the batch spec: aa 100 / bb 500 / cc 1000 tokens, cap 2,
    // budget 1400 -> aa capped at exactly 2 epochs, bb r = 1.2, cc r = 0.6.
    // The gate REPLICATES (adds `copy`), so parity is on the multiset.
    val census = ((1 to 10).map(i => (i.toLong, "aa", ("w " * 10).trim)) ++
      (11 to 60).map(i => (i.toLong, "bb", ("w " * 10).trim)) ++
      (61 to 160).map(i => (i.toLong, "cc", ("w " * 10).trim)))
      .toDF("doc_id", "lang", "text")
    val gate = graft.pipeline.TrainingData.unimaxFilter(
      census, "lang", "doc_id", "text", Seq("aa", "bb", "cc"),
      budget = 1400.0, epochCap = 2.0)
    val incoming = ((201 to 210).map(i => LangDoc(i.toLong, t("2024-01-01 00:00:01"), "aa", "fresh doc")) ++
      (211 to 260).map(i => LangDoc(i.toLong, t("2024-01-01 00:00:02"), "cc", "fresh doc"))).toSeq
    val topo = Topology(
      entities = Map(
        "raw-docs" -> Topic("raw-docs"),
        "unimax"   -> Stream("unimax", gate),
        "mixed"    -> Topic("mixed")),
      workflow = Seq("raw-docs" -> "unimax", "unimax" -> "mixed"))
    val in = MemoryStream[LangDoc]
    in.addData(incoming: _*)
    val engine = StreamRunner.start(
      topo, Map("raw-docs" -> in.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_unimax").trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()
    val streamed = spark.table("t_unimax").select("doc_id", "copy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // live == batch experiment over the same rows: the gate is stateless
    val batch = topo.experiment(Map("raw-docs" -> incoming.toDF()))("mixed")
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy"))).sorted.toSeq
    assert(streamed === batch)
    // capped stratum: every incoming aa doc arrives exactly twice
    (201L to 210L).foreach(i =>
      assert(streamed.filter(_._1 == i).map(_._2) === Seq(0L, 1L), s"aa doc $i"))
    // water-level stratum: cc hash-thins (single copies, some dropped)
    val ccKept = streamed.map(_._1).filter(_ >= 211L).distinct
    assert(ccKept.nonEmpty && ccKept.size < 50, s"cc kept ${ccKept.size}")
  }
}
