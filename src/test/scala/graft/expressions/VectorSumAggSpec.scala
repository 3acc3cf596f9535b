package graft.expressions

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class VectorSumAggSpec extends SparkSpec {
  import spark.implicits._

  test("vecSum equals per-dimension sum across a multi-partition shuffle") {
    val rng = new scala.util.Random(23)
    val rows = (1 to 500).map(i => (i % 7, Seq.fill(16)(rng.nextInt(1000).toDouble)))
    val df = rows.toDF("g", "v").repartition(8) // force partial + merge paths
    val got = df.groupBy("g").agg(VectorFunctions.vecSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // integer-valued doubles: sums are exact regardless of order
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })).toMap
    (0 until 7).foreach(g => assert(got(g) === expected(g).toSeq, s"group $g"))
  }

  test("vecSum over an empty group-side is null-safe") {
    val df = Seq((1, Seq(1.0, 2.0)), (1, Seq(3.0, 4.0))).toDF("g", "v")
      .union(Seq((2, null.asInstanceOf[Seq[Double]])).toDF("g", "v"))
    val got = df.groupBy("g").agg(VectorFunctions.vecSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(got(1).get.asInstanceOf[scala.collection.Seq[Double]].toSeq === Seq(4.0, 6.0))
    assert(got(2) === None) // all-null group → null sum
  }

  test("normalizeText collapses case, punctuation, and whitespace") {
    val df = Seq("  Hello,   WORLD! ", "hello world", "different").toDF("text")
    val out = df.select(graft.functions.TextFunctions.normalizeText(col("text")))
      .collect().map(_.getString(0)).toSeq
    assert(out(0) === "hello world")
    assert(out(0) === out(1))
    assert(out(2) === "different")
  }
}
