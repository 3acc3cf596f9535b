package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** S6 topic DDL — what IS testable without a broker or the kafka-clients
  * jar: the unavailability contract. A missing dependency must surface as a
  * loud, self-explaining error on EVERY entry point (never a silent no-op
  * that lets a pipeline assume its topics exist), and the spec shape must
  * carry the reference's full topic map (name, partitions, replication
  * factor, per-topic config). The live half runs in KafkaSmokeSpec behind
  * `SPARK_GRAFT_KAFKA_BOOTSTRAP`, where createTopics provisions the
  * round-trip topics through this exact path.
  */
class TopicAdminSpec extends AnyFunSuite {

  private def assertLoud(f: => Any): Unit = {
    val e = intercept[IllegalStateException](f)
    assert(e.getMessage.contains("kafka-clients is not on the classpath"))
    assert(e.getMessage.contains("KafkaSmokeSpec"))
    assert(e.getCause.isInstanceOf[ClassNotFoundException])
  }

  test("every DDL entry point fails loudly when kafka-clients is absent") {
    assume(
      try { Class.forName("org.apache.kafka.clients.admin.AdminClient"); false }
      catch { case _: ClassNotFoundException => true },
      "kafka-clients IS on this classpath — the live KafkaSmokeSpec covers this environment")
    assertLoud(TopicAdmin.createTopics("localhost:9092",
      Seq(TopicAdmin.TopicSpec("purchase-made", 2, 1))))
    assertLoud(TopicAdmin.listTopics("localhost:9092"))
    assertLoud(TopicAdmin.deleteTopics("localhost:9092", Seq("purchase-made")))
  }

  test("topic spec mirrors the reference's jackdaw topic map") {
    // core.clj:36-48 — name, partition-count, replication-factor, config
    val t = TopicAdmin.TopicSpec("large-transaction-made", 1, 1,
      Map("cleanup.policy" -> "compact"))
    assert(t.name === "large-transaction-made")
    assert(t.partitions === 1)
    assert(t.replicationFactor === 1.toShort)
    assert(t.config("cleanup.policy") === "compact")
  }
}
