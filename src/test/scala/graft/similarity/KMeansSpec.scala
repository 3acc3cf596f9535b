package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("assignCol is total and deterministic on NaN/Inf vectors — never throws, " +
      "NaN distances tie to the smallest centroid id") {
    // one bad vector must not kill (or nondeterministically reshuffle) a
    // 100 TB IVF build: all-NaN distances are EQUAL under Spark's total
    // ordering (NaN == NaN, above every double), so the (d, i) struct min
    // falls through to the id field — centroid 0, deterministically; an
    // Inf vector's distances are ±Inf and pick the centroid its sign
    // points at. Pinned on a fixed 2-centroid model.
    val m = KMeans.Model(Array(Array(1.0, 0.0), Array(-1.0, 0.0)))
    val df = Seq(
      (1L, Seq(Double.NaN, 0.0)),
      (2L, Seq(Double.PositiveInfinity, 0.0)),
      (3L, Seq(Double.NegativeInfinity, 0.0)),
      (4L, Seq(0.9, 0.1)),
      (5L, Seq(-0.9, 0.1))).toDF("id", "v")
    val got = m.assign(df, "v").select("id", "list").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) === 0, "NaN vector must tie-break to centroid 0")
    assert(got(2L) === 0, "+Inf x: -2·(+Inf)·1 = -Inf at centroid (1,0)")
    assert(got(3L) === 1, "-Inf x: -2·(-Inf)·(-1) = -Inf at centroid (-1,0)")
    assert(got(4L) === 0 && got(5L) === 1) // finite controls
  }

  test("fit recovers three well-separated clusters and ivfTopK probes them") {
    val rng = new scala.util.Random(17)
    val centers = Seq(Seq(10.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0), Seq(0.0, 0.0, 10.0))
    val points = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 30).map { i =>
        (ci * 100L + i, c.map(x => (x + rng.nextGaussian() * 0.1).toFloat))
      }
    }
    val df = points.toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "embedding", "vec_id", k = 3, maxIter = 15)

    // every point lands in the same list as all points of its true cluster
    val assigned = model.assign(df, "embedding")
      .select(col("vec_id"), col("list")).collect()
      .map(r => (r.getLong(0) / 100, r.getInt(1)))
    val byTrue = assigned.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    byTrue.values.foreach(lists => assert(lists.length === 1))
    assert(byTrue.values.flatten.toSet.size === 3) // three distinct lists

    // probe: the list nearest the first true center is that cluster's list
    val probed = model.probeLists(centers.head, nprobe = 1)
    assert(probed === Seq(byTrue(0L).head))

    // end-to-end IVF: top-k over only the probed list returns cluster-0 points
    val indexed = model.assign(df, "embedding")
    val top = Ann.ivfTopK(indexed, "embedding", "vec_id", "list",
      centers.head, probeLists = probed.map(i => i: Any), k = 5).collect()
    assert(top.length === 5)
    top.foreach(r => assert(r.getLong(0) < 100L)) // all from true cluster 0
  }

  test("empty clusters keep their previous centroid") {
    val df = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, 0.1f))).toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "embedding", "vec_id", k = 2, maxIter = 5)
    assert(model.k === 2)
    assert(model.centroids.forall(_.forall(x => !x.isNaN)))
  }

  test("labelOutliers ranks the farthest member first against the quantized centroid") {
    // label 0: three points near the origin plus one far outlier; label 1:
    // a tight pair plus a moderate outlier — hand-checkable distances
    val df = Seq(
      (1L, Seq(0.0f, 0.0f), 0), (2L, Seq(0.1f, 0.0f), 0),
      (3L, Seq(0.0f, 0.1f), 0), (4L, Seq(9.0f, 9.0f), 0),
      (10L, Seq(5.0f, 5.0f), 1), (11L, Seq(5.0f, 5.2f), 1),
      (12L, Seq(7.0f, 5.0f), 1)).toDF("vec_id", "embedding", "label")
    val out = KMeans.labelOutliers(df, "label", "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byLabel = out.groupBy(_._1)
    // centroid ≈ (2.275, 2.275): the origin point (id 1, d² ≈ 10.35) is
    // farther than id 2 (d² ≈ 9.91) — the outlier is 4, then 1
    assert(byLabel(0).sortBy(_._4).map(_._2).toSeq === Seq(4L, 1L))
    assert(byLabel(1).sortBy(_._4).map(_._2).toSeq === Seq(12L, 11L))
    // replay label 0's top distance against the 6dp-quantized centroid
    val c = Seq((0.0 + 0.1 + 0.0 + 9.0) / 4, (0.0 + 0.0 + 0.1 + 9.0) / 4)
      .map(x => math.rint(x * 1e6) / 1e6)
    val d4 = (9.0 - c(0)) * (9.0 - c(0)) + (9.0 - c(1)) * (9.0 - c(1))
    val got = byLabel(0).find(_._2 == 4L).get._3
    assert(math.abs(got - d4) < 1e-6, s"$got vs $d4")
    // k larger than the group emits the whole group once
    val all = KMeans.labelOutliers(df, "label", "vec_id", "embedding", k = 10)
      .collect()
    assert(all.length === 7)
  }
}
