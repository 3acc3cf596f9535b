package graft.expressions

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.functions._

class ThetaSketchAggSpec extends SparkSpec {
  import spark.implicits._

  test("theta sketches are exact below nominal, layout-independent, and intersect correctly") {
    // two keys with engineered overlap: key 'a' holds users 0..599, key 'b'
    // holds 300..899 — |a| = |b| = 600, |a ∩ b| = 300, all far below the
    // 2^12 nominal, so every estimate is EXACT, not approximate
    val rows = (0 until 600).map(u => ("a", u.toLong)) ++
      (300 until 900).map(u => ("b", u.toLong))
    val df = rows.toDF("k", "u")
    def collectSketches(d: org.apache.spark.sql.DataFrame) =
      Analytics.thetaSketches(d, col("k"), "k", col("u"), lgK = 12)
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val sk = collectSketches(df)
    assert(ThetaOps.estimate(sk("a")) === 600.0)
    assert(ThetaOps.estimate(sk("b")) === 600.0)
    assert(ThetaOps.intersect(Seq(sk("a"), sk("b"))) === 300.0)
    // merge is register-set union — the compact ORDERED image is canonical,
    // so a different partitioning yields byte-identical sketches
    val sk2 = collectSketches(df.repartition(13))
    assert(sk2("a").toSeq === sk("a").toSeq && sk2("b").toSeq === sk("b").toSeq)
    // disjoint sets intersect to zero
    val dj = collectSketches(Seq(("a", 1L), ("a", 2L), ("b", 9L)).toDF("k", "u"))
    assert(ThetaOps.intersect(Seq(dj("a"), dj("b"))) === 0.0)
    // string inputs hash like a distinct set too (duplicates collapse)
    val ss = Analytics.thetaSketches(
        Seq(("a", "x"), ("a", "x"), ("a", "y")).toDF("k", "s"),
        col("k"), "k", col("s"), lgK = 12)
      .collect().map(r => r.getAs[Array[Byte]]("sketch")).head
    assert(ThetaOps.estimate(ss) === 2.0)
  }

  test("theta estimation mode stays within the 5-sigma band above nominal") {
    // 100k distinct longs through a tiny lgK=10 sketch (1024 nominal) —
    // deep estimation mode; rse = 1/sqrt(1024) ≈ 3.1%, band 5σ ≈ 16%
    val df = (0 until 100000).map(u => ("k", u.toLong * 2654435761L)).toDF("k", "u")
    val sk = Analytics.thetaSketches(df, col("k"), "k", col("u"), lgK = 10)
      .collect().map(r => r.getAs[Array[Byte]]("sketch")).head
    val est = ThetaOps.estimate(sk)
    assert(math.abs(est - 100000.0) <= 100000.0 * 0.16,
      s"estimate $est outside 16% of 100000")
  }
}
