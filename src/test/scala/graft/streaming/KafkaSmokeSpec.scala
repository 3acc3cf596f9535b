package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Live Kafka round-trip smoke — the ONLY compile-only surface left in the
  * engine is `StreamRunner.kafkaSource`/`kafkaSink` (this sandbox has no
  * broker and no spark-sql-kafka connector jar, verified: zero kafka jars
  * under /opt/spark/jars). This spec makes the gap explicit instead of
  * silent: wherever a broker IS available, set
  * `SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port` (with the spark-sql-kafka +
  * kafka-clients jars on the classpath) and the spec round-trips the
  * Part-3 topology's sink topic and asserts read-back == batch. Where the
  * flag is unset the test CANCELS (scalatest `assume`) with the reason in
  * the report — a loud, counted skip, not a silently-green hole.
  */
class KafkaSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val bootstrap = sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

  test("kafka source->sink round-trip equals the batch result (broker-gated)") {
    assume(bootstrap.isDefined,
      "SPARK_GRAFT_KAFKA_BOOTSTRAP unset — no broker in this environment; " +
        "the Kafka code path is exercised to the API boundary only " +
        "(StreamRunner.scala scaladoc records the posture)")
    val bs = bootstrap.get
    val topicIn = s"graft_smoke_in_${System.nanoTime()}"
    val topicOut = s"graft_smoke_out_${System.nanoTime()}"
    val ckpt = s"/tmp/graft_kafka_ckpt_${System.nanoTime()}"
    // S6 DDL through the engine's own AdminClient binding — explicit
    // provisioning (partition count is the downstream parallelism dial),
    // never broker auto-create
    TopicAdmin.createTopics(bs, Seq(
      TopicAdmin.TopicSpec(topicIn, 2, 1), TopicAdmin.TopicSpec(topicOut, 2, 1)))
    assert(TopicAdmin.listTopics(bs).contains(topicIn))
    // seed the input topic through the batch Kafka writer (same wire shape
    // as kafkaSink, no streaming query needed for the seed)
    val rows = Seq((1L, 10L, 250000.0), (2L, 11L, 50.0), (3L, 12L, 400000.0))
      .toDF("key", "user_id", "amount")
    graft.codec.JsonCodec.encode(rows)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("topic", topicIn)
      .save()
    val valueSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("amount", DoubleType)))
    val src = StreamRunner.kafkaSource(spark, bs, topicIn, LongType, valueSchema)
    val filtered = src.filter(col("amount") >= 100000.0)
    val q = StreamRunner.kafkaSink(filtered, bs, topicOut, ckpt)
    q.processAllAvailable()
    q.stop()
    // read back through the batch Kafka reader and decode
    val back = graft.codec.JsonCodec.flatten(graft.codec.JsonCodec.decode(
      spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bs)
        .option("subscribe", topicOut)
        .option("startingOffsets", "earliest")
        .load(),
      LongType, valueSchema))
    val got = back.select("key", "user_id", "amount").as[(Long, Long, Double)]
      .collect().toSet
    assert(got === Set((1L, 10L, 250000.0), (3L, 12L, 400000.0)))
  }
}
