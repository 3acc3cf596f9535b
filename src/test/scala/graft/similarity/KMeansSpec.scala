package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

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
}
