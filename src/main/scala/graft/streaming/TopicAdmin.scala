package graft.streaming

/** Kafka topic DDL (SURVEY §2 row S6 — `ja/create-topics!` /
  * `->AdminClient`, reference core.clj:51,167,213): create / list / delete
  * topics through Kafka's own `AdminClient`, bound REFLECTIVELY so the
  * engine compiles and ships in environments without `kafka-clients` on the
  * classpath (this sandbox has no Kafka jars at all — verified, zero under
  * /opt/spark/jars). Where the jar is absent, every call fails LOUDLY with
  * the classpath fact and remediation, never a silent no-op; where a broker
  * exists, `KafkaSmokeSpec` (behind `SPARK_GRAFT_KAFKA_BOOTSTRAP`) creates
  * its round-trip topics through this exact path.
  *
  * A topic spec mirrors the reference's jackdaw map — name, partition
  * count, replication factor, per-topic config — because partitioning IS
  * the scale dial: at 100 TB the topic's partition count bounds every
  * downstream consumer's parallelism, so the DDL that fixes it belongs to
  * the engine surface, not to ops folklore.
  */
object TopicAdmin {

  /** `{:topic-name _ :partition-count _ :replication-factor _ :topic-config _}` */
  final case class TopicSpec(name: String, partitions: Int,
                             replicationFactor: Short,
                             config: Map[String, String] = Map.empty)

  private def adminClass(): Class[_] =
    try Class.forName("org.apache.kafka.clients.admin.AdminClient")
    catch {
      case e: ClassNotFoundException =>
        throw new IllegalStateException(
          "kafka-clients is not on the classpath — Kafka topic DDL needs the " +
            "org.apache.kafka:kafka-clients jar (and a reachable broker). " +
            "In broker-less environments this surface is intentionally " +
            "unreachable; see KafkaSmokeSpec for the gated live test.", e)
    }

  private def withAdmin[T](bootstrap: String)(f: AnyRef => T): T = {
    val cls = adminClass()
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrap)
    val admin = cls.getMethod("create", classOf[java.util.Properties])
      .invoke(null, props)
    // unwrap the reflection noise: broker-side failures arrive as
    // InvocationTargetException(ExecutionException(TopicExistsException)) —
    // two causes deep, untyped, and logged as "InvocationTargetException:
    // null". Rethrowing the real exception keeps the LOUD-failure contract
    // (callers can catch Kafka exceptions by type).
    def unwrap(e: Throwable): Throwable = e match {
      case ite: java.lang.reflect.InvocationTargetException
          if ite.getCause != null => unwrap(ite.getCause)
      case ee: java.util.concurrent.ExecutionException
          if ee.getCause != null => unwrap(ee.getCause)
      case other => other
    }
    try f(admin.asInstanceOf[AnyRef])
    catch {
      // NonFatal only: OOM/StackOverflow/Interrupted must propagate as
      // themselves (unwrapping an InterruptedException's wrapper would also
      // discard the thread's interrupt status). The original wrapper rides
      // along as a suppressed exception so the reflective call site's stack
      // is not lost (ADVICE r17).
      case scala.util.control.NonFatal(e) =>
        val real = unwrap(e)
        if (!(real eq e)) real.addSuppressed(e)
        throw real
    }
    finally admin.asInstanceOf[AutoCloseable].close()
  }

  /** Blocks until the broker acknowledges every creation (KafkaFuture.get),
    * exactly `ja/create-topics!`'s synchronous contract.
    */
  def createTopics(bootstrap: String, topics: Seq[TopicSpec]): Unit =
    withAdmin(bootstrap) { admin =>
      val ntCls = Class.forName("org.apache.kafka.clients.admin.NewTopic")
      val ctor = ntCls.getConstructor(classOf[String], java.lang.Integer.TYPE,
        java.lang.Short.TYPE)
      val list = new java.util.ArrayList[AnyRef]()
      topics.foreach { t =>
        val nt = ctor.newInstance(t.name, Int.box(t.partitions),
          Short.box(t.replicationFactor)).asInstanceOf[AnyRef]
        if (t.config.nonEmpty) {
          val m = new java.util.HashMap[String, String]()
          t.config.foreach { case (k, v) => m.put(k, v) }
          ntCls.getMethod("configs", classOf[java.util.Map[_, _]]).invoke(nt, m)
        }
        list.add(nt)
      }
      val res = admin.getClass.getMethod("createTopics", classOf[java.util.Collection[_]])
        .invoke(admin, list)
      val all = res.getClass.getMethod("all").invoke(res)
      all.getClass.getMethod("get").invoke(all) // block for the acks
      ()
    }

  /** Topic names visible to the broker (`ja/list-topics` shape). */
  def listTopics(bootstrap: String): Set[String] =
    withAdmin(bootstrap) { admin =>
      val res = admin.getClass.getMethod("listTopics").invoke(admin)
      val names = res.getClass.getMethod("names").invoke(res)
      val got = names.getClass.getMethod("get").invoke(names)
      import scala.jdk.CollectionConverters._
      got.asInstanceOf[java.util.Set[String]].asScala.toSet
    }

  /** Synchronous topic deletion (the teardown half of the DDL surface). */
  def deleteTopics(bootstrap: String, names: Seq[String]): Unit =
    withAdmin(bootstrap) { admin =>
      val list = new java.util.ArrayList[String]()
      names.foreach(list.add)
      val res = admin.getClass.getMethod("deleteTopics", classOf[java.util.Collection[_]])
        .invoke(admin, list)
      val all = res.getClass.getMethod("all").invoke(res)
      all.getClass.getMethod("get").invoke(all)
      ()
    }
}
