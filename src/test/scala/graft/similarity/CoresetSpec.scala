package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy k-center: the distributed selection must equal a driver-side
  * brute-force replay of the same deterministic rules (smallest-id seed,
  * farthest-min-cosine-distance argmax, smallest-id ties), the radius
  * curve must be non-increasing, and k > n must stop early, not throw.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn > 0) d / nn else 0.0
  }

  private def brute(rows: Seq[(Long, Seq[Double])], k: Int): Seq[(Long, Long, Option[Double])] = {
    val byId = rows.sortBy(_._1)
    var centers = List(byId.head)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])](
      (1L, byId.head._1, None))
    for (step <- 2 to math.min(k, rows.length)) {
      val cand = byId.filterNot(r => centers.exists(_._1 == r._1))
        .map { case (id, v) =>
          (id, centers.map(c => 1.0 - cos(v, c._2)).min)
        }
      val (wid, wd) = cand.maxBy { case (id, d) => (d, -id) }
      centers = centers :+ byId.find(_._1 == wid).get
      out += ((step.toLong, wid, Some(wd)))
    }
    out.toSeq
  }

  test("kCenterGreedy equals the brute-force greedy replay, at any partition layout") {
    // 3 well-separated directional clusters + noise: greedy must visit each
    // cluster before densifying any
    val rows: Seq[(Long, Seq[Double])] = (0 until 60).map { i =>
      val base = i % 3 match {
        case 0 => Seq(1.0, 0.0, 0.0, 0.1)
        case 1 => Seq(0.0, 1.0, 0.0, 0.1)
        case _ => Seq(0.0, 0.0, 1.0, 0.1)
      }
      (i.toLong, base.zipWithIndex.map { case (x, j) =>
        x + 0.01 * ((i * 7 + j * 3) % 11) })
    }
    val want = brute(rows, 6)
    def got(parts: Int) = Coreset.kCenterGreedy(
        rows.toDF("vec_id", "v").repartition(parts), "vec_id", "v", k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got(1) === want)
    assert(got(13) === want)
    // radius curve non-increasing over steps 2..k (the k-chooser's signal)
    val radii = want.drop(1).map(_._3.get)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => b <= a + 1e-12 })
    // the three clusters are all hit within the first three picks
    val firstThree = want.take(3).map(_._2 % 3).toSet
    assert(firstThree.size === 3, s"greedy must spread across clusters: $want")
  }

  test("k past the corpus size stops early with min(k, n) rows") {
    val tiny = Seq((5L, Seq(1.0, 0.0)), (9L, Seq(0.0, 1.0))).toDF("vec_id", "v")
    val out = Coreset.kCenterGreedy(tiny, "vec_id", "v", k = 10).collect()
    assert(out.length === 2)
    assert(out.map(_.getLong(1)).toSeq === Seq(5L, 9L))
  }

  test("reliable = true: loud without a checkpoint dir, identical output " +
       "with one, and every round's checkpoint files are released") {
    val rows: Seq[(Long, Seq[Double])] = (0 until 40).map { i =>
      (i.toLong, Seq(math.cos(i * 0.7), math.sin(i * 0.7), 0.1 * (i % 5)))
    }
    val df = rows.toDF("vec_id", "v")
    val sc = spark.sparkContext
    // contract check while no dir is configured: refuse up front, not k
    // rounds in with an opaque RDD error
    if (sc.getCheckpointDir.isEmpty) {
      val e = intercept[IllegalArgumentException] {
        Coreset.kCenterGreedy(df, "vec_id", "v", k = 4, reliable = true)
      }
      assert(e.getMessage.contains("setCheckpointDir"), e.getMessage)
    }
    // NOTE: there is no SparkContext API to UNSET a checkpoint dir, so
    // this leaves one configured on the shared context (harmless — only
    // explicit checkpoint() calls use it; the intercept above is guarded
    // for exactly that suite-order dependence)
    val ckptBase = java.nio.file.Files.createTempDirectory("graft_ckpt")
    try {
      sc.setCheckpointDir(ckptBase.toString)
      val want = Coreset.kCenterGreedy(df, "vec_id", "v", k = 6)
        .collect().map(_.toSeq).toSeq
      val got = Coreset.kCenterGreedy(df, "vec_id", "v", k = 6, reliable = true)
        .collect().map(_.toSeq).toSeq
      assert(got === want,
        "reliable mode changes durability, never the selection")
      // release discipline: each round's rdd-<id> directory is deleted when
      // the next round materializes (the final one in the `finally`) — a
      // leak here is k corpus-sized files per call at cluster scale
      import scala.jdk.CollectionConverters._
      val leaked = scala.util.Using.resource(java.nio.file.Files.walk(ckptBase)) {
        st => st.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("rdd-")).toSeq
      }
      assert(leaked.isEmpty, s"checkpoint files left behind: $leaked")
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(ckptBase)) { st =>
        st.iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }
}
