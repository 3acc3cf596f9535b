package graft

import org.apache.spark.sql.functions._

/** Compiles and asserts the README's "Reference walkthrough" section
  * VERBATIM — the README promises "every snippet below is compiled and
  * asserted in WalkthroughSpec", so each test here mirrors one fenced
  * block (same values, same names). Drift between the doc and the API
  * fails this suite, not a user's build.
  * Reference: core.clj Part 1 (77-95), Part 2 (100-118), Part 3 (139-157).
  */
class WalkthroughSpec extends SparkSpec {
  import spark.implicits._

  private def purchases = Seq((1L, 10.0, 101L, 1), (2L, 500.0, 102L, 3))
    .toDF("key", "amount", "user_id", "quantity")

  test("Part 1: simple topology — filter >= 100, project, sink") {
    import graft.core.{Stream, Topic, Topology}
    import graft.operators.ReferenceOps

    val simple = Topology(
      entities = Map(
        "purchase-made"          -> Topic("purchase-made"),
        "large-purchase-stream"  -> Stream("large-purchase-stream",
                                           ReferenceOps.largePurchases),
        "large-transaction-made" -> Topic("large-transaction-made")),
      workflow = Seq(
        "purchase-made"          -> "large-purchase-stream",
        "large-purchase-stream"  -> "large-transaction-made"))

    val out = simple.compile(Map("purchase-made" -> purchases))("large-transaction-made")
    assert(out.columns.toSeq === Seq("key", "user_id", "amount"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ===
      Seq((2L, 102L, 500)))
  }

  test("Part 2: transducers — composed Pipes fuse filter∘project") {
    import graft.operators.ReferenceOps._

    val purchaseXform: Pipe =
      filterAtLeast(col("amount"), 100)
        .andThen(selectKeys(col("key"), col("user_id"),
          col("amount").cast("int").as("amount")))

    val donationXform: Pipe =
      filterAtLeast(col("donation_amount_cents"), 10000)
        .andThen(selectKeys(col("key"), col("user_id"),
          centsToUnits(col("donation_amount_cents")).as("amount")))

    assert(purchaseXform(purchases).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq === Seq((2L, 102L, 500)))
    val donations = Seq((7L, 55L, 20000.0))
      .toDF("key", "user_id", "donation_amount_cents")
    assert(donationXform(donations).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq === Seq((7L, 55L, 200)))
    // the fusion claim: one scan-stage plan, no exchange between the stages
    assert(!purchaseXform(purchases).queryExecution.executedPlan.toString
      .contains("Exchange"))
  }

  test("Part 3: full topology — run-experiment, view-topology, live start/stop") {
    import graft.operators.ReferenceOps

    val donations = Seq((7L, 55L, 20000.0))
      .toDF("key", "user_id", "donation_amount_cents")

    val experiment = ReferenceOps.transactionTopology
      .compile(Map("purchase-made"        -> purchases,
                   "humble-donation-made" -> donations))
      .apply("large-transaction-made")
    assert(experiment.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet === Set((2L, 102L, 500), (7L, 55L, 200)))

    val dot: String = ReferenceOps.transactionTopology.toDot
    assert(dot.startsWith("digraph topology {") && dot.contains("large-purchase-stream"))

    // live: the same topology over streaming frames (README's streamingBindings)
    val outDir = java.nio.file.Files.createTempDirectory("walkthrough").toString
    val inP = s"$outDir/in_purchases"; val inD = s"$outDir/in_donations"
    purchases.coalesce(1).write.parquet(inP)
    donations.coalesce(1).write.parquet(inD)
    val streamingBindings = Map(
      "purchase-made" -> graft.streaming.StreamRunner.fileSource(
        spark, inP, purchases.schema, format = "parquet"),
      "humble-donation-made" -> graft.streaming.StreamRunner.fileSource(
        spark, inD, donations.schema, format = "parquet"))
    val engine = graft.streaming.StreamRunner.start(
      ReferenceOps.transactionTopology,
      streamingBindings,
      (sink, df) => graft.streaming.StreamRunner.fileSink(
        df, s"$outDir/$sink", s"$outDir/ckpt_$sink"))
    engine.awaitAll()
    engine.stop()
    val live = spark.read.parquet(s"$outDir/large-transaction-made")
    assert(live.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet === Set((2L, 102L, 500), (7L, 55L, 200)))
  }

  test("validation: cycle / undeclared / self-edge / orphan throw at construction") {
    import graft.core.{Stream, Topology}
    import graft.operators.ReferenceOps
    val base = ReferenceOps.transactionTopology
    intercept[IllegalArgumentException] {
      base.copy(workflow = base.workflow :+ ("large-transaction-made" -> "purchase-made"))
    }
    intercept[IllegalArgumentException] {
      base.copy(workflow = base.workflow :+ ("purchase-made" -> "no-such-entity"))
    }
    intercept[IllegalArgumentException] {
      base.copy(workflow = base.workflow :+ ("purchase-made" -> "purchase-made"))
    }
    intercept[IllegalArgumentException] {
      base.copy(entities = base.entities +
        ("dangling-stream" -> Stream("dangling-stream", identity)))
    }
  }
}
