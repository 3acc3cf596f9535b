package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking: the banded rank join must equal the
  * brute-force "rank distance < window" definition exactly, at any
  * partition layout, including across band boundaries.
  */
class SortedNeighborSpec extends SparkSpec {
  import spark.implicits._

  test("sortedNeighborPairs equals the brute-force rank-window definition") {
    // names with deliberate near-collisions and ties-by-prefix; ids shuffled
    // relative to sort order so rank != id
    val rows = Seq(
      (10L, "alpha"), (3L, "alphb"), (7L, "beta"), (1L, "betb"),
      (9L, "gamma"), (2L, "gamm"), (8L, "delta"), (4L, "delt"),
      (6L, "epsilon"), (5L, "zeta"), (11L, "eta"), (12L, "theta"))
    val df = rows.toDF("id", "name").repartition(5)
    val window = 3
    val got = Dedup.sortedNeighborPairs(df, "id", col("name"), window)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: global sort by (name, id), all pairs within rank dist < w
    val sorted = rows.sortBy { case (id, n) => (n, id) }
    val want = (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + window, sorted.length)
    } yield (sorted(i)._1, sorted(j)._1)).toSet
    assert(want.nonEmpty && got === want)
    // key values ride along for the caller's verify
    val withKeys = Dedup.sortedNeighborPairs(df, "id", col("name"), window)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    withKeys.foreach { case (id, k) =>
      assert(rows.toMap.apply(id) === k)
    }
  }

  test("plan audit: the window join is an EQUI join on the band key, never a cartesian") {
    val df = (1L to 500L).map(i => (i, s"name$i")).toDF("id", "name")
    val pairs = Dedup.sortedNeighborPairs(df, "id", col("name"), 8)
    pairs.collect() // finalize the AQE plan before auditing it
    val plan = pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"SNM must join on the band key, plan was:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi join on __band, plan was:\n$plan")
  }

  test("sortedNeighborPairsMulti: a transposed-prefix duplicate is found by " +
       "the reversed-key pass that the name pass misses") {
    // the Hernández/Stolfo motivating case: two near-copies differing in
    // their FIRST character sort > window apart under the name key (ten
    // filler names sit between x... and y...), but their shared SUFFIX
    // makes them ADJACENT under reverse(name)
    val pairIds = (1L, 12L)
    val rows = Seq((1L, "xa shared-suffix"), (12L, "ya shared-suffix")) ++
      (2L to 11L).map(i => (i, f"xb filler-$i%02d")) // distinct suffixes
    val df = rows.toDF("id", "name").repartition(4)
    val window = 8
    def pairs(keys: Seq[org.apache.spark.sql.Column]) =
      Dedup.sortedNeighborPairsMulti(df, "id", keys, window)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pass1 = pairs(Seq(col("name")))
    val multi = pairs(Seq(col("name"), reverse(col("name"))))
    assert(!pass1.contains(pairIds),
      "fixture broken: the name pass must NOT reach the transposed pair")
    assert(multi.contains(pairIds),
      "the reversed-key pass must surface the transposed pair")
    // multi == canonicalized union of the per-key brute-force replays
    def brute(key: String => String) = {
      val sorted = rows.sortBy { case (id, n) => (key(n), id) }
      (for {
        i <- sorted.indices
        j <- (i + 1) until math.min(i + window, sorted.length)
      } yield (math.min(sorted(i)._1, sorted(j)._1),
        math.max(sorted(i)._1, sorted(j)._1))).toSet
    }
    val want = brute(identity) ++ brute(_.reverse)
    assert(multi === want)
    // single-key multi == canonicalized single pass (no phantom pairs)
    assert(pass1 === brute(identity))
    // three keys — the exact q_snm_multipass shape since r17: an
    // arbitrary third ordering (length-major) must union in the same
    // canonicalized way, with no phantom pairs beyond the three replays
    val tri = pairs(Seq(col("name"), reverse(col("name")),
      concat_ws(" ", length(col("name")).cast("string"), col("name"))))
    val wantTri = want ++ brute(n => f"${n.length}%s $n")
    assert(tri === wantTri)
  }

  test("sortedNeighborPairs is partition-count invariant and window-bounded") {
    val df = (1L to 200L).map(i => (i, f"key${(i * 37) % 100}%03d-$i"))
      .toDF("id", "name")
    def run(parts: Int) =
      Dedup.sortedNeighborPairs(df.repartition(parts), "id", col("name"), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = run(1)
    assert(run(7) === one && run(32) === one)
    // |pairs| = sum over positions of min(w-1, remaining) = n*(w-1) - tail
    assert(one.size === 200 * 4 - (1 + 2 + 3 + 4))
  }
}
