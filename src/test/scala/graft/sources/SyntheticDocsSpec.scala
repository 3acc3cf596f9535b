package graft.sources

import graft.SparkSpec
import graft.sources.v2.{DocsRange, SyntheticDocs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class SyntheticDocsSpec extends SparkSpec {

  private def docs(n: Long, parts: Int = 8, seed: Long = 42L): DataFrame =
    spark.read.format("graft.sources.v2.SyntheticDocs")
      .option("n_docs", n).option("n_partitions", parts).option("seed", seed)
      .load()

  private def scanOf(df: DataFrame): BatchScanExec = {
    def find(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => find(a.inputPlan)
      case b: BatchScanExec => Seq(b)
      case o => o.children.flatMap(find)
    }
    find(df.queryExecution.executedPlan).head
  }

  test("rows are a pure function of (seed, doc_id): deterministic, text length == n_chars") {
    val a = docs(200).collect().map(_.toSeq).toSeq
    val b = docs(200).collect().map(_.toSeq).toSeq
    assert(a.toSet === b.toSet)
    docs(200).collect().foreach { r =>
      assert(r.getAs[String]("text").length.toLong === r.getAs[Long]("n_chars"))
      assert(SyntheticDocs.langs.contains(r.getAs[String]("lang")))
      assert(SyntheticDocs.sources.contains(r.getAs[String]("source")))
    }
    // a different seed is a different corpus
    val c = docs(200, seed = 7L).collect().map(_.toSeq).toSet
    assert(c !== a.toSet)
  }

  test("doc_id range predicates prune the planned id span, results stay exact") {
    val df = docs(100000, parts = 16)
      .filter(col("doc_id") >= 90000L && col("doc_id") < 90500L)
    val ranges = scanOf(df).inputRDD.partitions.length
    assert(ranges <= 16)
    val planned = scanOf(df).batch.planInputPartitions()
      .map(_.asInstanceOf[DocsRange]).map(r => r.hi - r.lo).sum
    // only the surviving window is planned — not the 100k-doc corpus
    assert(planned === 500L, s"planned $planned ids")
    assert(df.count() === 500L)
  }

  test("doc_id <= Long.MaxValue plans the WHOLE corpus — the saturating " +
       "increment (v+1 used to wrap negative and silently return zero rows)") {
    val df = docs(100).filter(col("doc_id") <= Long.MaxValue)
    assert(df.count() === 100L,
      "pruning dropped rows residual re-evaluation cannot resurrect")
    // and the genuinely-empty shapes stay empty
    assert(docs(100).filter(col("doc_id") === Long.MaxValue).count() === 0L)
    assert(docs(100).filter(col("doc_id") > Long.MaxValue).count() === 0L)
  }

  test("options are case-insensitive like every other DSv2 source") {
    val upper = spark.read.format("graft.sources.v2.SyntheticDocs")
      .option("N_DOCS", 250).option("N_Partitions", 4).option("SEED", 7L)
      .load()
    assert(upper.count() === 250L,
      "a differently-cased n_docs must not silently fall back to the default")
    // same seed spelled differently == same corpus (seed mismatch would
    // break oracle replay silently)
    assert(upper.collect().map(_.toSeq).toSet ===
      docs(250, parts = 4, seed = 7L).collect().map(_.toSeq).toSet)
  }

  test("column pruning reaches the reader: unprojected text is never generated") {
    val df = docs(1000).select(col("lang"))
    val scan = scanOf(df)
    assert(scan.output.map(_.name) === Seq("lang"), scan.output)
    assert(df.distinct().count() === SyntheticDocs.langs.size.toLong)
  }

  test("micro-batch stream == batch read: the offset cursor replays the id space exactly once") {
    val streamed = spark.readStream.format("graft.sources.v2.SyntheticDocs")
      .option("n_docs", 500).option("n_partitions", 4).option("seed", 9L)
      .option("rows_per_batch", 150) // 4 uneven micro-batches
      .load()
    val q = streamed.writeStream.format("memory").queryName("t_synth_stream")
      .outputMode("append").start()
    try {
      // pacing is driver-side: keep draining until the cursor reaches hi
      var n = 0L
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (n < 500L && System.nanoTime() < deadline) {
        q.processAllAvailable()
        n = spark.table("t_synth_stream").count()
      }
    } finally q.stop()
    val live = spark.table("t_synth_stream").collect().map(_.toSeq).toSet
    val batch = docs(500, parts = 4, seed = 9L).collect().map(_.toSeq).toSet
    assert(live.size === 500)
    assert(live === batch)
  }

  test("count/min/max(doc_id) push into the source: one closed-form row, no generation") {
    val df = docs(1000000, parts = 8)
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1000000L, 0L, 999999L)))
    // a million-doc corpus answered without generating a single document
    // row: the scan plans exactly one closed-form AggRange partition
    scanOf(df).batch.planInputPartitions().toSeq match {
      case Seq(a: graft.sources.v2.AggRange) => assert(a.hi - a.lo === 1000000L)
      case other => fail(s"expected one AggRange, got $other")
    }
  }

  test("sum(n_chars) is NOT pushable: the source declines and rows are generated") {
    val df = docs(500).agg(sum(col("n_chars")).as("s"))
    assert(scanOf(df).batch.planInputPartitions().head.isInstanceOf[graft.sources.v2.DocsRange])
    // correctness unchanged: sum equals the row-level recomputation
    val viaRows = docs(500).select(sum(col("n_chars"))).head().getLong(0)
    assert(df.head().getLong(0) === viaRows)
  }

  test("limit pushdown prunes the planned window (at-most semantics, Spark keeps its Limit)") {
    val df = docs(1000000, parts = 8).limit(7)
    val planned = scanOf(df).batch.planInputPartitions()
      .map(_.asInstanceOf[DocsRange]).map(r => r.hi - r.lo).sum
    assert(planned === 7L, s"planned $planned ids for limit 7")
    assert(df.count() === 7L)
  }

  test("pushed aggregate over an EMPTY corpus merges to count 0 (not a null sum over zero partials)") {
    val df = docs(0).agg(count(lit(1)).as("n"), min(col("doc_id")).as("mn"))
    val r = df.head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1))
  }

  test("invalid options fail loudly at table resolution, not as silent empty reads") {
    intercept[IllegalArgumentException] { docs(1000, parts = 0).count() }
    intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.v2.SyntheticDocs")
        .option("n_docs", 100).option("rows_per_batch", 0).load().count()
    }
  }

  test("pushedFilters reports only the consumed doc_id range predicates") {
    val df = docs(1000).filter(col("doc_id") < 10L && col("lang") === "en")
    val desc = scanOf(df).scan.description()
    assert(desc.contains("lo=0") && desc.contains("hi=10"), desc)
    // the lang predicate must survive as a post-scan Filter (it was never
    // consumed by the source) and results stay exact
    assert(df.queryExecution.executedPlan.toString.contains("Filter"),
      df.queryExecution.executedPlan.toString)
    assert(df.count() === docs(1000).collect()
      .count(r => r.getAs[Long]("doc_id") < 10L && r.getAs[String]("lang") == "en"))
  }

  test("Trigger.AvailableNow drains the WHOLE corpus in rows_per_batch slices") {
    val streamed = spark.readStream.format("graft.sources.v2.SyntheticDocs")
      .option("n_docs", 500).option("n_partitions", 4).option("seed", 11L)
      .option("rows_per_batch", 150)
      .load()
    val q = streamed.writeStream.format("memory").queryName("t_synth_an")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000L)
    assert(spark.table("t_synth_an").count() === 500L)
    assert(q.recentProgress.length >= 3, // 500 ids in <=150-id slices: >= 4 batches ran
      q.recentProgress.map(_.numInputRows).mkString(","))
  }

  test("the scala FNV row derivation matches the expression-layer Fnv1a64") {
    val viaExpr = spark.range(0, 50)
      .select(graft.functions.TextFunctions.fnv1a64(
        concat(lit("42:"), col("id").cast("string"))).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val viaScala = (0L until 50L).map(i => SyntheticDocs.fnv1a64(s"42:$i"))
    assert(viaExpr === viaScala)
  }
}
