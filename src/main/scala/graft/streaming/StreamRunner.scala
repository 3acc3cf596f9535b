package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DataType, StructType}
import graft.codec.JsonCodec
import graft.core.Topology

/** Streaming runner: binds a [[graft.core.Topology]] to Structured Streaming
  * sources/sinks. The compiler is shared with batch mode (SURVEY §3.2-3.3) —
  * this file only supplies the bindings and lifecycle.
  *
  * Test posture: this build environment has no Kafka broker and no
  * spark-sql-kafka connector jar, so [[kafkaSource]]/[[kafkaSink]] are the
  * standard Structured Streaming API calls but exercised only to the API
  * boundary; the runner itself is fully tested through the
  * [[memorySink]]/MemoryStream path (StreamingSpec), which shares every line
  * of compile/lifecycle code with the Kafka path, and end-to-end through the
  * [[fileSource]]/[[fileSink]] bindings — a REAL external source (directory
  * watching, checkpoint-tracked progress, restart/resume), the closest
  * broker-less stand-in for the Kafka path.
  *
  * Semantics vs the reference (`core.clj:15-20`): the reference runs
  * at-least-once with record caching off (immediate per-record emission);
  * Structured Streaming's checkpointed micro-batches give the same
  * at-least-once multiset of outputs with per-micro-batch emission
  * (SURVEY §2.5 "exactly-once" note) — identical results, different
  * granularity.
  */
object StreamRunner {

  /** S1 — Kafka source for one topic, decoded to (key, value fields...)
    * (`js/kstream`, `core.clj:78`). `startingOffsets=earliest` mirrors the
    * reference's consumer seek-to-beginning read-back (`core.clj:67-74`).
    */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
                  keyType: DataType, valueSchema: StructType,
                  startingOffsets: String = "earliest"): DataFrame = {
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
    JsonCodec.flatten(JsonCodec.decode(raw, keyType, valueSchema))
  }

  /** S2 — Kafka sink (`js/to`, `core.clj:83`): JSON-encode and write. */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String,
                checkpointDir: String): StreamingQuery =
    JsonCodec.encode(df)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .start()

  /** S1 (file binding) — directory-watching file source: every file that
    * appears under `path` becomes part of the next micro-batch, with
    * processed files tracked in the checkpoint exactly like Kafka offsets.
    * This is the broker-less topic analog (same compile/lifecycle path as
    * [[kafkaSource]]) and the shape of a real landing-zone ingest at scale:
    * `maxFilesPerTrigger` (pass via `options`) bounds batch size, and the
    * schema is declared, never inferred, so a malformed producer fails the
    * batch instead of corrupting the table.
    */
  def fileSource(spark: SparkSession, path: String, schema: StructType,
                 format: String = "json",
                 options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format(format).schema(schema).options(options).load(path)

  /** S2 (file binding) — append-mode file sink with checkpointed progress:
    * the broker-less `js/to`. Restarting with the same checkpoint resumes
    * from the last committed batch — already-processed input files are not
    * re-emitted (the file-source analog of committed consumer offsets).
    * Default trigger drains available data and STOPS (batch-style
    * backfill, what every driver-gate parity run wants); a long-running
    * landing-zone pipeline passes `Trigger.ProcessingTime(...)` — same
    * knob as [[idempotentParquetSink]], previously hard-coded here.
    */
  def fileSink(df: DataFrame, path: String, checkpointDir: String,
               format: String = "parquet",
               trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format(format)
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** In-memory sink for tests (S5 analog of the reference's `view-messages`
    * consumer read-back, `core.clj:67-74`): results land in
    * `spark.table(queryName)`.
    */
  def memorySink(df: DataFrame, queryName: String): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** T1+T5 — compile a topology against streaming source bindings and start
    * one sink query per sink topic. Returns the running queries; stop via
    * [[Engine.stop]].
    */
  def start(topology: Topology, bindings: Map[String, DataFrame],
            sinkWriter: (String, DataFrame) => StreamingQuery): Engine = {
    val compiled = topology.compile(bindings)
    val queries = topology.sinks.map(s => sinkWriter(s, compiled(s)))
    Engine(queries)
  }

  /** Event-time tumbling-window aggregation with a watermark — the streaming
    * capability the reference conspicuously lacks (SURVEY §2.5): counts and
    * sums per (window, key) with late data beyond `delay` dropped.
    */
  def windowedAgg(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
                  windowDuration: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))

  /** Streaming exact dedup within a watermark: drops repeats of `keyCols`
    * arriving within the state-retention horizon — the streaming face of
    * [[graft.dedup.Dedup.exact]].
    */
  def streamingDedup(df: DataFrame, tsCol: String, delay: String,
                     keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** STREAM-STREAM interval join — the live face of
    * [[graft.operators.Analytics.intervalJoin]] (KStream⋈KStream
    * JoinWindows): each left event pairs with every right event of the
    * same key inside `[leftTs − beforeUs, leftTs + afterUs]`. Both inputs
    * MUST carry `withWatermark` on their timestamp columns — the watermark
    * plus the explicit time-range condition is what lets Structured
    * Streaming bound the join state (a side's buffered rows are evicted
    * once the other side's watermark passes their last possible match), so
    * state is O(events within the window per key), never the whole stream.
    * Output schema mirrors the batch operator: all left columns + the
    * aliased right columns. Parity is spec-asserted (live == batch on the
    * same events; inclusive bounds both sides).
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                         leftTs: String, rightTs: String,
                         beforeUs: Long, afterUs: Long,
                         rightCols: Seq[(String, String)]): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0 && beforeUs + afterUs > 0,
      s"window must be non-empty: before=$beforeUs after=$afterUs")
    // fail FAST on the two silent-misuse paths: a streaming side without a
    // watermark is accepted by Spark but buffers join state forever (OOM in
    // production, nothing locally); an alias collision surfaces later as an
    // unhelpful ambiguous-reference error
    import org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
    def watermarked(df: DataFrame): Boolean =
      df.queryExecution.analyzed.exists(_.isInstanceOf[EventTimeWatermark])
    require(!left.isStreaming || watermarked(left),
      "streaming left side must carry withWatermark — unbounded join state otherwise")
    require(!right.isStreaming || watermarked(right),
      "streaming right side must carry withWatermark — unbounded join state otherwise")
    val leftCols = left.columns.toSeq
    val clash = rightCols.map(_._2).toSet intersect leftCols.toSet
    require(clash.isEmpty, s"right aliases collide with left columns: ${clash.mkString(", ")}")
    // aliases must also be distinct among THEMSELVES — a duplicate slips
    // past both checks above and dies at planning with the same
    // ambiguous-reference error these requires exist to pre-empt
    val dupAliases = rightCols.map(_._2).groupBy(identity)
      .collect { case (a, g) if g.size > 1 => a }
    require(dupAliases.isEmpty,
      s"duplicate right aliases: ${dupAliases.mkString(", ")}")
    // "__rkey"/"__rts" are this operator's internal key/timestamp columns —
    // a caller column or alias by either name would surface later as an
    // ambiguous-reference (or silently wrong-column) error, so reject it here
    val reserved = Set("__rkey", "__rts")
    val reservedHit = (rightCols.map(_._2) ++ leftCols).filter(reserved)
    require(reservedHit.isEmpty,
      s"column names ${reservedHit.distinct.mkString(", ")} are reserved by streamIntervalJoin")
    val r2 = right.select(
      col(keyCol).as("__rkey") +: col(rightTs).as("__rts") +:
        rightCols.map { case (c, a) => col(c).as(a) }: _*)
    left.join(r2,
        col(keyCol) === col("__rkey") &&
          col("__rts") >= col(leftTs) - expr(s"INTERVAL $beforeUs MICROSECOND") &&
          col("__rts") <= col(leftTs) + expr(s"INTERVAL $afterUs MICROSECOND"))
      .select(leftCols.map(col) ++ rightCols.map { case (_, a) => col(a) }: _*)
  }

  /** Stream-static enrichment join: every micro-batch re-EXECUTES the join
    * against the static dimension. Caveat for file-based dims: re-execution
    * re-reads the files the DataFrame's file index listed at CREATION —
    * new part files written later are NOT picked up (and a rewrite that
    * deletes the listed files fails the batch). A pipeline that needs a
    * refreshing dimension must rebuild the dim DataFrame per batch
    * (foreachBatch + `spark.read`) or read a table format whose snapshot
    * resolves per query. Broadcast by default — the dim is the small side
    * in the enrichment shape; disable for dims that don't fit an executor.
    * `left_outer` by default: an event arriving before its dimension row
    * (new user, late dim refresh) must survive with null attributes, not
    * vanish — pass `joinType = "inner"` to filter instead.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
             broadcastDim: Boolean = true,
             joinType: String = "left_outer"): DataFrame =
    stream.join(if (broadcastDim) broadcast(dim) else dim, keys, joinType)

  /** One micro-batch of [[idempotentParquetSink]]: the batch lands in its
    * own `_batch_id` partition with dynamic partition overwrite, so a
    * REPLAYED batch id rewrites its partition instead of appending
    * duplicates — the standard exactly-once-to-storage recipe over an
    * at-least-once source. Exposed for direct testing.
    */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, path: String): Unit =
    batch.withColumn("_batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(path)

  /** Idempotent parquet sink via foreachBatch + [[writeBatchIdempotent]].
    * Default trigger drains available data and stops (batch-style backfill);
    * pass `Trigger.ProcessingTime(...)` for a continuously running pipeline.
    */
  def idempotentParquetSink(df: DataFrame, path: String, checkpointDir: String,
                            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        writeBatchIdempotent(batch, batchId, path))
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}

/** Lifecycle wrapper (T5, `js/start`/`js/close`, `core.clj:86-95`). */
final case class Engine(queries: Seq[StreamingQuery]) {
  def awaitAll(): Unit = queries.foreach(_.awaitTermination())
  def processAllAvailable(): Unit = queries.foreach(_.processAllAvailable())
  def stop(): Unit = queries.foreach(_.stop())
}
