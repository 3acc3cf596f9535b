package graft.streaming

import graft.SparkSpec
import graft.codec.JsonCodec
import graft.operators.ReferenceOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Batch/streaming unification (SURVEY §5.2.5): the SAME compiled topology
  * run over MemoryStream sources must produce the same multiset of outputs
  * as the batch experiment — the engine's analog of willa's run-experiment
  * claim. Plus the event-time capabilities the reference lacks.
  */
case class Purchase(key: Int, user_id: Int, amount: Double)
case class Donation(key: Int, user_id: Int, donation_amount_cents: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val purchases = Seq(
    Purchase(1, 1, 10), Purchase(2, 2, 500), Purchase(3, 3, 50), Purchase(4, 4, 1000))
  private val donations = Seq(
    Donation(5, 2345, 15000), Donation(6, 9, 500))

  test("streaming run of the transaction topology equals the batch experiment") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[Purchase]
    val dIn = MemoryStream[Donation]
    pIn.addData(purchases: _*)
    dIn.addData(donations: _*)

    val engine = StreamRunner.start(
      ReferenceOps.transactionTopology,
      Map("purchase-made" -> pIn.toDF(), "humble-donation-made" -> dIn.toDF()),
      (sink, df) => df.writeStream.format("memory")
        .queryName("t_" + sink.replace('-', '_'))
        .trigger(Trigger.AvailableNow()).start())
    engine.processAllAvailable()
    engine.stop()

    val streamed = spark.table("t_large_transaction_made")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSorted

    val batch = ReferenceOps.transactionTopology.experiment(Map(
      "purchase-made"        -> purchases.toDF(),
      "humble-donation-made" -> donations.toDF()))("large-transaction-made")
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSorted

    assert(streamed === batch)
    assert(batch.map(_._3).sorted === Seq(150, 500, 1000))
  }

  implicit class SortOps(xs: Array[(Int, Int, Int)]) {
    def toSorted: Seq[(Int, Int, Int)] = xs.toSeq.sorted
  }

  test("file-to-file streaming run of the topology equals the batch experiment, " +
       "and a restart picks up only new files") {
    val root = java.nio.file.Files.createTempDirectory("graft_filesrc").toString
    val pDir = s"$root/purchase-made"
    val dDir = s"$root/humble-donation-made"
    val outDir = s"$root/large-transaction-made"
    val ckpt = s"$root/ckpt"
    purchases.toDF().coalesce(1).write.json(pDir)
    donations.toDF().coalesce(1).write.json(dDir)

    def bindings = Map(
      "purchase-made" -> StreamRunner.fileSource(spark, pDir,
        implicitly[org.apache.spark.sql.Encoder[Purchase]].schema),
      "humble-donation-made" -> StreamRunner.fileSource(spark, dDir,
        implicitly[org.apache.spark.sql.Encoder[Donation]].schema))
    def run(): Unit = {
      val engine = StreamRunner.start(ReferenceOps.transactionTopology, bindings,
        (_, df) => StreamRunner.fileSink(df, outDir, ckpt))
      engine.awaitAll() // AvailableNow drains all pending files, then stops
    }

    def readOut() = spark.read.parquet(outDir).select("key", "user_id", "amount")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSorted

    run()
    val streamed = readOut()
    val batch = ReferenceOps.transactionTopology.experiment(Map(
      "purchase-made"        -> purchases.toDF(),
      "humble-donation-made" -> donations.toDF()))("large-transaction-made")
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSorted
    assert(streamed === batch)

    // a new file lands; a restarted run (same checkpoint) emits ONLY its
    // qualifying rows — the already-processed files are not re-emitted
    Seq(Purchase(7, 5, 250), Purchase(8, 6, 20)).toDF()
      .coalesce(1).write.mode("append").json(pDir)
    run()
    assert(readOut() === (batch :+ ((7, 5, 250))).sorted)
  }

  test("windowedAgg: event-time tumbling window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    in.addData(
      (Timestamp.valueOf("2024-01-01 00:00:10"), "a", 1.0),
      (Timestamp.valueOf("2024-01-01 00:00:50"), "a", 2.0),
      (Timestamp.valueOf("2024-01-01 00:01:10"), "a", 4.0),
      (Timestamp.valueOf("2024-01-01 00:00:30"), "b", 8.0))
    val agg = StreamRunner.windowedAgg(
      in.toDF().toDF("ts", "k", "v"), "ts", "k", "v", "1 minute", "10 seconds")
    val q = agg.writeStream.format("memory").queryName("t_windowed")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("t_windowed")
      .select(col("window.start").cast("string"), col("k"), col("n"), col("total"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows === Set(
      ("2024-01-01 00:00:00", "a", 2L, 3.0),
      ("2024-01-01 00:01:00", "a", 1L, 4.0),
      ("2024-01-01 00:00:00", "b", 1L, 8.0)))
  }

  test("streamingDedup drops repeated keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    in.addData(
      (Timestamp.valueOf("2024-01-01 00:00:01"), "x"),
      (Timestamp.valueOf("2024-01-01 00:00:02"), "x"),
      (Timestamp.valueOf("2024-01-01 00:00:03"), "y"))
    val dedup = StreamRunner.streamingDedup(in.toDF().toDF("ts", "k"), "ts", "1 minute", Seq("k"))
    val q = dedup.writeStream.format("memory").queryName("t_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("t_dedup").select("k").collect().map(_.getString(0)).sorted === Seq("x", "y"))
  }

  test("streamingDedup retention: a key re-emits after its state is evicted " +
      "by the watermark, and is still suppressed before eviction") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val dedup = StreamRunner.streamingDedup(
      in.toDF().toDF("ts", "k"), "ts", "10 seconds", Seq("k"))
    val q = dedup.writeStream.format("memory").queryName("t_dedup_ttl").start()
    def drain(rows: (String, String)*): Unit = {
      in.addData(rows.map { case (t, k) => (Timestamp.valueOf(t), k) }: _*)
      q.processAllAvailable() // one controlled micro-batch per call
    }
    // batch 1: x first seen at :00 → emitted; state expires at :10
    drain(("2024-01-01 00:00:00", "x"))
    // batch 2: in-horizon duplicate at :05 suppressed; y at :08 emitted and
    // advances the watermark only to max(:08) − 10 s — x NOT yet evicted
    drain(("2024-01-01 00:00:05", "x"), ("2024-01-01 00:00:08", "y"))
    // batch 3: z at :60 pushes the watermark to :50 (> x's :10 expiry) —
    // batch 4's x is a FRESH key to the store and must re-emit
    drain(("2024-01-01 00:01:00", "z"))
    drain(("2024-01-01 00:01:02", "x"))
    q.stop()
    val ks = spark.table("t_dedup_ttl").select("k").collect().map(_.getString(0))
    // x twice (pre- and post-eviction episodes), y and z once each
    assert(ks.sorted.toSeq === Seq("x", "x", "y", "z"),
      s"retention semantics drifted: got ${ks.sorted.toSeq}")
  }

  test("JsonCodec round-trip: encode to Kafka wire shape, decode back") {
    val df = Seq((1, 1234, 200), (2, 2345, 150)).toDF("key", "user_id", "amount")
    val wire = JsonCodec.encode(df)
    assert(wire.columns.toSeq === Seq("key", "value"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("amount", org.apache.spark.sql.types.IntegerType)))
    val back = JsonCodec.flatten(JsonCodec.decode(wire,
      org.apache.spark.sql.types.IntegerType, schema))
    val rows = back.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows === Set((1, 1234, 200), (2, 2345, 150)))
  }

  test("stream-stream interval join with watermarks on both sides") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    clicks.addData(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "adA"),
      (Timestamp.valueOf("2024-01-01 10:20:00"), 2L, "adB"),
      (Timestamp.valueOf("2024-01-01 09:00:00"), 3L, "adC"))
    purchases.addData(
      (Timestamp.valueOf("2024-01-01 10:05:00"), 1L, 50.0),  // 5 min after click -> joins
      (Timestamp.valueOf("2024-01-01 11:30:00"), 2L, 70.0),  // 70 min after -> outside window
      (Timestamp.valueOf("2024-01-01 10:00:00"), 3L, 90.0))  // 60 min after -> boundary, inclusive
    val c = clicks.toDF().toDF("click_ts", "user", "ad").withWatermark("click_ts", "1 minute")
    val p = purchases.toDF().toDF("p_ts", "p_user", "amount").withWatermark("p_ts", "1 minute")
    val joined = c.join(p,
      org.apache.spark.sql.functions.expr(
        "user = p_user AND p_ts BETWEEN click_ts AND click_ts + INTERVAL 1 HOUR"))
    val q = joined.writeStream.format("memory").queryName("t_ssjoin")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_ssjoin").select("user", "ad", "amount")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "adA", 50.0), (3L, "adC", 90.0)))
  }
  test("stream-stream join emits exactly the batch intervalJoin pairs") {
    implicit val sqlCtx = spark.sqlContext
    val clickRows = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "adA"),
      (Timestamp.valueOf("2024-01-01 10:20:00"), 2L, "adB"),
      (Timestamp.valueOf("2024-01-01 09:00:00"), 3L, "adC"),
      (Timestamp.valueOf("2024-01-01 09:59:30"), 4L, "adD"))
    val buyRows = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), 1L, 50.0),
      (Timestamp.valueOf("2024-01-01 11:30:00"), 2L, 70.0),   // outside window
      (Timestamp.valueOf("2024-01-01 10:00:00"), 3L, 90.0),   // boundary, inclusive
      (Timestamp.valueOf("2024-01-01 10:59:30"), 4L, 40.0))   // exactly +1h
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val buys = MemoryStream[(Timestamp, Long, Double)]
    clicks.addData(clickRows: _*); buys.addData(buyRows: _*)
    val joined = clicks.toDF().toDF("click_ts", "user", "ad")
      .withWatermark("click_ts", "1 minute")
      .join(buys.toDF().toDF("p_ts", "p_user", "amount").withWatermark("p_ts", "1 minute"),
        expr("user = p_user AND p_ts BETWEEN click_ts AND click_ts + INTERVAL 1 HOUR"))
    val q = joined.writeStream.format("memory").queryName("t_ssjoin_eq")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val live = spark.table("t_ssjoin_eq").select("user", "ad", "amount")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // the SAME window as a batch banded interval join: before = 0, after = 1h
    val batch = graft.operators.Analytics.intervalJoin(
        clickRows.toDF("click_ts", "user", "ad"),
        buyRows.toDF("p_ts", "p_user", "amount")
          .withColumnRenamed("p_user", "user"), // key name must match
        "user", "click_ts", "p_ts",
        beforeUs = 0L, afterUs = 3600L * 1000000L,
        rightCols = Seq("amount" -> "amount"))
      .select("user", "ad", "amount")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(live === batch)
    assert(batch === Set((1L, "adA", 50.0), (3L, "adC", 90.0), (4L, "adD", 40.0)))
  }

  test("StreamRunner.streamIntervalJoin == batch intervalJoin across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // the NAMED operator (live face of Analytics.intervalJoin), driven as
    // TWO genuine micro-batches (per-block processAllAvailable — an
    // AvailableNow trigger would fold every addData into one batch and the
    // buffered-state path would never run). u4's click arrives in batch 1
    // and its +1h-boundary purchase in batch 2, so the match can ONLY come
    // from buffered join state; fixtures stay inside the watermark
    // (batch-2 events all post-date batch 1's global watermark).
    val clicksB1 = Seq(
      (Timestamp.valueOf("2024-01-01 09:00:00"), 3L, "adC"),
      (Timestamp.valueOf("2024-01-01 09:59:30"), 4L, "adD"))
    val clicksB2 = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "adA"),
      (Timestamp.valueOf("2024-01-01 10:20:00"), 2L, "adB"))
    val buysB1 = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 3L, 90.0))   // click+1h boundary, inclusive
    val buysB2 = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), 1L, 50.0),
      (Timestamp.valueOf("2024-01-01 10:59:30"), 4L, 40.0),   // exactly +1h, CROSS-batch
      (Timestamp.valueOf("2024-01-01 11:30:00"), 2L, 70.0))   // outside window
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val buys = MemoryStream[(Timestamp, Long, Double)]
    val live = StreamRunner.streamIntervalJoin(
      clicks.toDF().toDF("click_ts", "user", "ad").withWatermark("click_ts", "1 minute"),
      buys.toDF().toDF("p_ts", "p_user", "amount").withWatermark("p_ts", "1 minute")
        .withColumnRenamed("p_user", "user"),
      "user", "click_ts", "p_ts",
      beforeUs = 0L, afterUs = 3600L * 1000000L,
      rightCols = Seq("amount" -> "amount"))
    val q = live.writeStream.format("memory").queryName("t_ssjoin_op").start()
    clicks.addData(clicksB1: _*); buys.addData(buysB1: _*)
    q.processAllAvailable()
    clicks.addData(clicksB2: _*); buys.addData(buysB2: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_ssjoin_op").select("user", "ad", "amount")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val batch = graft.operators.Analytics.intervalJoin(
        (clicksB1 ++ clicksB2).toDF("click_ts", "user", "ad"),
        (buysB1 ++ buysB2).toDF("p_ts", "p_user", "amount").withColumnRenamed("p_user", "user"),
        "user", "click_ts", "p_ts",
        beforeUs = 0L, afterUs = 3600L * 1000000L,
        rightCols = Seq("amount" -> "amount"))
      .select("user", "ad", "amount")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === batch)
    // u4 is the cross-batch pair — present only if batch-1 state survived
    assert(batch === Set((1L, "adA", 50.0), (3L, "adC", 90.0), (4L, "adD", 40.0)))

    // misuse fails fast, not as unbounded state / late ambiguity errors
    val noWm = intercept[IllegalArgumentException] {
      StreamRunner.streamIntervalJoin(
        clicks.toDF().toDF("click_ts", "user", "ad"),
        buys.toDF().toDF("p_ts", "p_user", "amount").withColumnRenamed("p_user", "user")
          .withWatermark("p_ts", "1 minute"),
        "user", "click_ts", "p_ts", 0L, 3600L * 1000000L, Seq("amount" -> "amount"))
    }
    assert(noWm.getMessage.contains("withWatermark"), noWm.getMessage)
    val clash = intercept[IllegalArgumentException] {
      StreamRunner.streamIntervalJoin(
        clicks.toDF().toDF("click_ts", "user", "ad").withWatermark("click_ts", "1 minute"),
        buys.toDF().toDF("p_ts", "p_user", "amount").withColumnRenamed("p_user", "user")
          .withWatermark("p_ts", "1 minute"),
        "user", "click_ts", "p_ts", 0L, 3600L * 1000000L, Seq("amount" -> "ad"))
    }
    assert(clash.getMessage.contains("collide"), clash.getMessage)
    // the operator's internal "__rkey"/"__rts" names are reserved — an
    // alias (or left column) by either name must fail fast here, not as a
    // downstream ambiguous-reference error
    val reserved = intercept[IllegalArgumentException] {
      StreamRunner.streamIntervalJoin(
        clicks.toDF().toDF("click_ts", "user", "ad").withWatermark("click_ts", "1 minute"),
        buys.toDF().toDF("p_ts", "p_user", "amount").withColumnRenamed("p_user", "user")
          .withWatermark("p_ts", "1 minute"),
        "user", "click_ts", "p_ts", 0L, 3600L * 1000000L, Seq("amount" -> "__rts"))
    }
    assert(reserved.getMessage.contains("reserved"), reserved.getMessage)
    // aliases must be distinct among THEMSELVES too — a duplicate passes
    // the clash/reserved checks and died at planning with the very
    // ambiguous-reference error these requires exist to pre-empt
    val dup = intercept[IllegalArgumentException] {
      StreamRunner.streamIntervalJoin(
        clicks.toDF().toDF("click_ts", "user", "ad").withWatermark("click_ts", "1 minute"),
        buys.toDF().toDF("p_ts", "p_user", "amount").withColumnRenamed("p_user", "user")
          .withWatermark("p_ts", "1 minute"),
        "user", "click_ts", "p_ts", 0L, 3600L * 1000000L,
        Seq("amount" -> "r_v", "p_ts" -> "r_v"))
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
  }

  test("streaming session_window aggregation equals the batch formulation") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0),
      (Timestamp.valueOf("2024-01-01 10:10:00"), 1L, 2.0),   // same session
      (Timestamp.valueOf("2024-01-01 11:00:00"), 1L, 3.0),   // 50-min gap → new session
      (Timestamp.valueOf("2024-01-01 10:05:00"), 2L, 4.0))
    // a far-future sentinel pushes the watermark past every real session end
    // (append mode only emits CLOSED sessions)
    val sentinel = (Timestamp.valueOf("2024-01-02 00:00:00"), 99L, 0.0)
    val in = MemoryStream[(Timestamp, Long, Double)]
    in.addData(rows :+ sentinel: _*)
    val agg = in.toDF().toDF("ts", "user", "v")
      .withWatermark("ts", "1 minute")
      .groupBy(col("user"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .select(col("user"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n"), col("total"))
    val q = agg.writeStream.format("memory").queryName("t_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val live = spark.table("t_sessions").filter(col("user") =!= 99L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    val batch = rows.toDF("ts", "user", "v")
      .groupBy(col("user"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .select(col("user"), col("session_window.start"), col("session_window.end"),
        col("n"), col("total"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(live === batch)
    assert(live.size === 3) // user 1 splits at the 50-min gap; user 2 single
  }

  test("stream-static enrichment join broadcasts the dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    in.addData((1L, 10.0), (2L, 20.0), (3L, 30.0))
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier")
    val enriched = StreamRunner.enrich(in.toDF().toDF("user", "amount"), dim, Seq("user"))
    val q = enriched.writeStream.format("memory").queryName("t_enriched")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("t_enriched").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    // left_outer default: the unmatched event survives with a null attribute
    assert(rows === Set((1L, 10.0, Some("gold")), (2L, 20.0, Some("silver")),
      (3L, 30.0, None)))
    // inner variant filters instead
    val q2 = StreamRunner.enrich(in.toDF().toDF("user", "amount"), dim, Seq("user"),
        joinType = "inner")
      .writeStream.format("memory").queryName("t_enriched_inner")
      .trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("t_enriched_inner").count() === 2)
  }

  test("idempotent parquet sink: replaying a batch id rewrites, never duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idem").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_idem_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"), (2L, "b"))
    val q = StreamRunner.idempotentParquetSink(in.toDF().toDF("id", "v"), dir, ckpt)
    q.processAllAvailable(); q.stop()
    val afterFirst = spark.read.parquet(dir).count()
    assert(afterFirst === 2)
    // simulate an at-least-once replay of batch 0 with the same payload:
    // the batch overwrites its own partition instead of appending
    StreamRunner.writeBatchIdempotent(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L, dir)
    assert(spark.read.parquet(dir).count() === 2)
    // a replay carrying a corrected payload REPLACES the partition
    StreamRunner.writeBatchIdempotent(Seq((1L, "a2")).toDF("id", "v"), 0L, dir)
    val fin = spark.read.parquet(dir).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fin === Set((1L, "a2")))
  }

  test("kafka sink replay contract: deterministic encode, duplicate multiset, key-dedup recovery") {
    // The Kafka sink is at-least-once (SURVEY §7.4): a replayed micro-batch
    // re-PRODUCES its records. This pins the three facts that make that
    // contract workable downstream, using the sink's own encode path with
    // an append harness standing in for the non-transactional producer.
    val rows = Seq((1L, 10L, 250000.0), (2L, 11L, 50.0)).toDF("key", "user_id", "amount")
    // 1) encode is a PURE function of the row — a replayed record is
    //    byte-identical, so downstream key-compaction/dedup can collapse it
    val enc1 = graft.codec.JsonCodec.encode(rows)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val enc2 = graft.codec.JsonCodec.encode(rows.repartition(5))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(enc1 === enc2)
    assert(enc1.map(_._1) === Set("1", "2"))
    // 2) a replayed batch through an APPEND sink (the kafka producer shape)
    //    yields exactly the doubled multiset — duplicated, never corrupted
    val dir = java.nio.file.Files.createTempDirectory("graft_kafka_shape").toString
    val enc = graft.codec.JsonCodec.encode(rows)
    enc.write.mode("append").parquet(dir)
    enc.write.mode("append").parquet(dir) // the replay
    val multiset = spark.read.parquet(dir)
      .groupBy("key", "value").count()
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(multiset === Map("1" -> 2L, "2" -> 2L))
    // 3) key-dedup downstream recovers the exact original set — the
    //    standard consumer-side answer to at-least-once production
    val recovered = spark.read.parquet(dir).dropDuplicates("key")
      .collect().map(_.getString(0)).toSet
    assert(recovered === Set("1", "2"))
  }

}
