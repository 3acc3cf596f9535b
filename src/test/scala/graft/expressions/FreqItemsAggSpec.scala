package graft.expressions

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters aggregate: the mergeable-summaries guarantees
  * (undercount ≤ n/(k+1); every item above that bar present) must hold
  * under every partitioning — the merge path is exercised by repartition.
  */
class FreqItemsAggSpec extends SparkSpec {
  import spark.implicits._

  test("freqItems: guarantees hold under 1, 7, and 32 partitions") {
    // 'a' 500, 'b' 300, 16 fillers x 25 -> n = 1200, bar n/(k+1) = 240 at k=4
    val items = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++
      (1 to 16).flatMap(j => Seq.fill(25)(s"f$j"))
    for (parts <- Seq(1, 7, 32)) {
      val row = items.toDF("item").repartition(parts)
        .agg(TF.freqItems(col("item"), 4).as("hh"), count(lit(1)).as("n")).head()
      val hh = row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = row.getLong(1)
      assert(n === 1200L)
      assert(hh.size <= 4, s"parts=$parts: ${hh.size} counters exceed k")
      // completeness: both true heavy hitters survive any merge order
      assert(hh.contains("a") && hh.contains("b"), s"parts=$parts: $hh")
      // undercount, within the n/(k+1) band (integer arithmetic)
      assert(hh("a") <= 500L && (500L - hh("a")) * 5 <= n, s"parts=$parts: $hh")
      assert(hh("b") <= 300L && (300L - hh("b")) * 5 <= n, s"parts=$parts: $hh")
    }
  }

  test("freqItems: nulls don't count; vocabulary <= k is exact; output sorted") {
    val df = (Seq.fill(6)(Some("x")) ++ Seq.fill(3)(Some("y")) ++
      Seq(None, None) ++ Seq.fill(3)(Some("z"))).toDF("item")
    val row = df.agg(TF.freqItems(col("item"), 8).as("hh")).head()
    val hh = row.getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    // exact counts when nothing ever evicts, sorted (est desc, item asc)
    assert(hh === Seq(("x", 6L), ("y", 3L), ("z", 3L)))
  }
}
