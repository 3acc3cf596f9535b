package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches the hand-computed power iteration") {
    // 1→2, 1→3, 2→3, 3→1; d = 0.85, 2 iterations from rank 1.0:
    // it1: r1 = .15+.85·1 = 1.0, r2 = .15+.85·0.5 = 0.575, r3 = .15+.85·1.5 = 1.425
    // it2: r1 = .15+.85·1.425, r2 = .15+.85·0.5, r3 = .15+.85·(0.5+0.575)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (1L, 2L)) // dup edge dropped
      .toDF("src", "dst")
    val out = Graph.pageRank(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.36125) < 1e-12)
    assert(math.abs(out(2L) - 0.575) < 1e-12)
    assert(math.abs(out(3L) - 1.06375) < 1e-12)
  }

  test("pageRank is bit-identical across layouts and reuses the edge exchange") {
    val edges = (1L to 500L).map(i => (i % 37, i % 11)).toDF("src", "dst")
    val a = Graph.pageRank(edges, "src", "dst", iterations = 3)
    val b = Graph.pageRank(edges.repartition(13), "src", "dst", iterations = 3)
    // decimal contribution sums ⇒ exact equality, not approximate
    val am = a.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bm = b.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(am === bm)
    // the recurring edge subtree must plan as ONE exchange, reused —
    // not a rescan per iteration
    assert(a.queryExecution.executedPlan.toString.contains("ReusedExchange"))
  }

  test("pageRank: sinks never contribute, pure sources floor at 1 − d") {
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst") // 2 is a sink
    val out = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val floor = 1.0 - 0.85 // NOT the literal 0.15 — a different double
    assert(out(1L) === floor && out(3L) === floor) // no inbound after it1
    assert(math.abs(out(2L) - (floor + 0.85 * (floor / 1 + floor / 1))) < 1e-12)
  }

  test("weightedSample equals a driver-side replay and is layout-independent") {
    val rows = (1L to 1000L).map(i => (i, (i % 10 + 1).toDouble))
    val df = rows.toDF("doc_id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Graph.weightedSample(d, "doc_id", col("w"), k = 100)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = run(df)
    assert(run(df.repartition(17)) === got)
    // exact replay of the race: u from the FNV bucket center, key = −ln(u)/w
    val replay = rows.map { case (id, w) =>
      val h = graft.expressions.Fnv1a.hash(s"ws|$id".getBytes("UTF-8"))
      val bucket = ((h % 16777216) + 16777216) % 16777216
      val u = (bucket.toDouble + 0.5) / 16777216.0
      (id, -math.log(u) / w)
    }.sortBy { case (id, k) => (k, id) }.take(100).map(_._1).toSet
    assert(got === replay)
    // heavier rows win more often: weight-10 class beats weight-1 class
    val byWeight = got.groupBy(id => id % 10 + 1).view.mapValues(_.size).toMap
    assert(byWeight.getOrElse(10L, 0) > byWeight.getOrElse(1L, 0))
  }
}
