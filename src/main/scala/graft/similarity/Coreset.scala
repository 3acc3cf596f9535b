package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Greedy k-center (farthest-point-first / Gonzalez) coreset selection over
  * an embedding column — the diversity-maximizing data-pruning primitive:
  * pick the corpus point farthest (cosine distance) from everything already
  * picked, k times. The selection 2-approximates the optimal k-center
  * cover, and the emitted per-step `min_dist` sequence is the classic
  * decreasing radius curve (read it to choose k: the elbow is where adding
  * centers stops buying coverage). Unlike [[Ann.mmrRerank]] this is
  * corpus-GLOBAL (no query, no shortlist collect): the argmax of every
  * round scans the full corpus distributed.
  *
  * Determinism contract (what makes the driver oracle possible): the seed
  * is the smallest id; every round's argmax ties break on smallest id; the
  * distance is `1 − dot/(‖x‖·‖c‖)` with the engine's total-cosine zero
  * contract, computed with the same left-to-right IEEE accumulation the
  * DuckDB oracle replays.
  *
  * Scale shape: Gonzalez is inherently k-pass, and each pass here is
  * map + TakeOrdered(1) over a persisted slim `(id, vec, norm)` projection
  * — per-row work is `|centers|` fused codegen'd dots against broadcast
  * literals (`least` over ≤ k distance columns), and the only cross-task
  * traffic per round is the top-1 reduction. Nothing quadratic, no
  * shuffles, lineage does NOT grow with rounds (each round's plan is
  * rebuilt from the cached base — the q_bfs_reach lesson). For k beyond
  * tens, switch to sampled/stream variants; this operator targets the
  * small-k curation regime.
  */
object Coreset {

  /** Returns exactly min(k, n) rows `(step, id, min_dist)`: step 1 is the
    * seed (NULL min_dist — there is nothing to be far from yet), steps
    * 2..k the greedy selections with their distance-at-selection (raw,
    * unrounded — callers round for publication).
    */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val base = graft.operators.Par.fanOut(
        df.select(col(idCol).cast("long").as("id"),
          VF.toDouble(col(vecCol)).as("v")), Seq("id"))
      .withColumn("nrm", VF.norm(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Any)]
      var centers = List.empty[(Long, Seq[Double], Double)]
      base.orderBy(col("id")).limit(1)
        .select(col("id"), col("v"), col("nrm")).collect().headOption
        .foreach { r =>
          centers = List((r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
          out += ((1L, r.getLong(0), null))
        }
      var step = 2
      var exhausted = centers.isEmpty
      while (step <= k && !exhausted) {
        val dists: Seq[Column] = centers.map { case (_, cv, cn) =>
          lit(1.0) - VF.cosinePrenormed(
            VF.dot(col("v"), typedlit(cv)), col("nrm"), lit(cn))
        }
        val minDist = if (dists.size == 1) dists.head else least(dists: _*)
        val picked = base
          .filter(!col("id").isInCollection(centers.map(_._1)))
          .select(col("id"), col("v"), col("nrm"), minDist.as("d"))
          .orderBy(col("d").desc, col("id")).limit(1)
          .collect().headOption
        picked match {
          case Some(r) =>
            centers = centers :+ ((r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
            out += ((step.toLong, r.getLong(0), r.getDouble(3)))
            step += 1
          case None => exhausted = true // k exceeded the corpus: stop early
        }
      }
      out.toSeq.map { case (s, id, d) =>
        (s, id, Option(d).map(_.asInstanceOf[Double]))
      }.toDF("step", "id", "min_dist")
    } finally base.unpersist(false)
  }
}
