package graft.core

import graft.SparkSpec
import graft.operators.ReferenceOps
import org.apache.spark.sql.functions._

/** Topology kernel tests (SURVEY §5.2.1/.4): golden experiment from the
  * reference's REPL walkthrough, DAG validation including the injected-cycle
  * demo (reference core.clj:247-252), fan-in merge, DOT export.
  */
class TopologySpec extends SparkSpec {
  import spark.implicits._

  private def purchases(rows: (Int, Int, Int, Int)*) =
    rows.toSeq.toDF("key", "amount", "user_id", "quantity")
      .select(col("key"), col("user_id"), col("amount").cast("double").as("amount"))

  private def donations(rows: (Int, Int, Int)*) =
    rows.toSeq.toDF("key", "user_id", "donation_amount_cents")
      .select(col("key"), col("user_id"), col("donation_amount_cents").cast("double").as("donation_amount_cents"))

  test("golden experiment: reference seeds produce the two expected transactions (core.clj:224-244)") {
    // seeds: purchase {id 1 amount 200 user 1234 qty 100}, donation {user 2345, 15000 cents}
    val out = ReferenceOps.transactionTopology.experiment(Map(
      "purchase-made"        -> purchases((1, 200, 1234, 100)),
      "humble-donation-made" -> donations((2, 2345, 15000))))
    val sink = out("large-transaction-made").map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    // expected: {:amount 200 :user-id 1234} and {:amount 150 :user-id 2345}
    assert(sink === Set((1, 1234, 200), (2, 2345, 150)))
  }

  test("golden walkthrough: purchases 10/500/50/1000 keep exactly 500 and 1000 (core.clj:171-184)") {
    val out = ReferenceOps.transactionTopology.experiment(Map(
      "purchase-made"        -> purchases((1, 10, 1, 1), (2, 500, 2, 1), (3, 50, 3, 1), (4, 1000, 4, 1)),
      "humble-donation-made" -> donations()))
    val amounts = out("large-transaction-made").map(_.getInt(2)).toSet
    assert(amounts === Set(500, 1000))
    // intermediate entity outputs are also observable, like willa's ::we/output
    assert(out("large-purchase-stream").length === 2)
    assert(out("large-donation-stream").isEmpty)
  }

  test("fan-in at a sink topic is a bag union (M1/M2)") {
    val t = Topology(
      entities = Map(
        "in1" -> Topic("in1"), "in2" -> Topic("in2"), "out" -> Topic("out")),
      workflow = Seq("in1" -> "out", "in2" -> "out"))
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((2, "y"), (3, "z")).toDF("k", "v")
    val out = t.compile(Map("in1" -> a, "in2" -> b))("out")
    // bag union: no dedup, 4 rows including the duplicate (2, "y")
    assert(out.count() === 4)
    assert(out.filter(col("k") === 2).count() === 2)
  }

  test("unionByName aligns differently-ordered branch schemas") {
    val t = Topology(
      entities = Map("in1" -> Topic("in1"), "in2" -> Topic("in2"), "out" -> Topic("out")),
      workflow = Seq("in1" -> "out", "in2" -> "out"))
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq(("z", 9)).toDF("v", "k") // same columns, different order
    val rows = t.compile(Map("in1" -> a, "in2" -> b))("out")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows === Set((1, "x"), (9, "z")))
  }

  test("cycle is rejected (the reference's injected-cycle demo, core.clj:250-252)") {
    val e = intercept[IllegalArgumentException] {
      Topology(
        entities = Map(
          "purchase-made" -> Topic("purchase-made"),
          "s"             -> Stream("s", identity),
          "out"           -> Topic("out")),
        workflow = Seq("purchase-made" -> "s", "s" -> "out", "out" -> "purchase-made"))
    }
    assert(e.getMessage.contains("acyclic"))
  }

  test("undeclared entity in an edge is rejected") {
    val e = intercept[IllegalArgumentException] {
      Topology(Map("a" -> Topic("a")), Seq("a" -> "ghost"))
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("stream with no input edge is rejected") {
    val e = intercept[IllegalArgumentException] {
      Topology(
        Map("a" -> Topic("a"), "s" -> Stream("s", identity)),
        Seq("s" -> "a"))
    }
    assert(e.getMessage.contains("no input"))
  }

  test("self-edge is rejected") {
    val e = intercept[IllegalArgumentException] {
      Topology(Map("a" -> Topic("a")), Seq("a" -> "a"))
    }
    assert(e.getMessage.contains("self-edges"))
  }

  test("missing source binding is a compile-time error") {
    val t = Topology(
      Map("in" -> Topic("in"), "out" -> Topic("out")),
      Seq("in" -> "out"))
    val e = intercept[IllegalArgumentException](t.compile(Map.empty))
    assert(e.getMessage.contains("in"))
  }

  test("sources/sinks derive from edge direction (S3)") {
    val t = ReferenceOps.transactionTopology
    assert(t.sources === Seq("humble-donation-made", "purchase-made"))
    assert(t.sinks === Seq("large-transaction-made"))
  }

  test("toDot renders every entity and edge (T4)") {
    val dot = ReferenceOps.transactionTopology.toDot
    assert(dot.startsWith("digraph"))
    ReferenceOps.transactionTopology.entities.keys.foreach(n => assert(dot.contains(n)))
    assert(dot.linesIterator.count(_.contains("->")) === 4)
  }

  test("toDot overlays experiment results per entity (core.clj:237)") {
    val t = ReferenceOps.transactionTopology
    val results = t.experiment(Map(
      "purchase-made"        -> purchases((1, 200, 1234, 100)),
      "humble-donation-made" -> donations((2, 2345, 15000))))
    val dot = t.toDot(results)
    assert(dot.startsWith("digraph"))
    // every entity annotated with its row count; sink shows the two outputs
    t.entities.keys.foreach(n => assert(dot.contains(s""""$n"""")))
    assert(dot.contains(s"[${results("large-transaction-made").length} rows]"))
    assert(dot.contains("1234")) // a value from the purchase row is rendered
    assert(dot.linesIterator.count(_.contains("->")) === 4)
    // structure-only rendering unchanged
    assert(!t.toDot.contains("rows]"))
  }

  test("q_topology_dot pins BOTH faces: the overlay literal matches the oracle text exactly") {
    // the same literal is pinned in SparkEntry.oracleSql — a drift in either
    // transcription fails HERE before the driver's hash gate does
    val out = graft.SparkEntry.queries("q_topology_dot")(spark, "unused")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet === Set("bare", "overlay"))
    assert(out("bare").startsWith("digraph topology {"))
    val expectedOverlay =
      """digraph topology {
        |  "humble-donation-made" [shape=cylinder, label="humble-donation-made\n(10, 5000, 201)\n(11, 20000, 202)\n[2 rows]"];
        |  "large-donation-stream" [shape=box, label="large-donation-stream\n(11, 202, 200)\n[1 rows]"];
        |  "large-purchase-stream" [shape=box, label="large-purchase-stream\n(2, 102, 500)\n(4, 104, 1000)\n[2 rows]"];
        |  "large-transaction-made" [shape=cylinder, label="large-transaction-made\n(2, 102, 500)\n(4, 104, 1000)\n(11, 202, 200)\n[3 rows]"];
        |  "purchase-made" [shape=cylinder, label="purchase-made\n(1, 10.0, 101, 1)\n(2, 500.0, 102, 3)\n(3, 50.0, 103, 2)\n[4 rows]"];
        |  "purchase-made" -> "large-purchase-stream";
        |  "humble-donation-made" -> "large-donation-stream";
        |  "large-purchase-stream" -> "large-transaction-made";
        |  "large-donation-stream" -> "large-transaction-made";
        |}""".stripMargin
    assert(out("overlay") === expectedOverlay)
  }
}
