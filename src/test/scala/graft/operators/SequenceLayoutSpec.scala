package graft.operators

import graft.SparkSpec
import graft.functions.LayoutFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Event-sequence analytics (transition matrix, ROWS-frame rolling aggs)
  * and the z-order layout key.
  */
class SequenceLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("transitionMatrix: per-key ordered steps, counts and conditional probabilities") {
    // user 1 walks a→b→a→b (steps: a→b ×2, b→a ×1); user 2 walks a→c.
    // Keys never mix: the b→a step of user 1 must not see user 2's events.
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "a"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "b"),
      (2L, ts("2024-01-01 10:00:30"), 5L, "a"),
      (2L, ts("2024-01-01 10:01:30"), 6L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.transitionMatrix(events, "user_id", "event_type",
        Seq(col("ts"), col("event_id")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out === Map(
      ("a", "b") -> (2L, round2(2.0 / 3.0)),
      ("a", "c") -> (1L, round2(1.0 / 3.0)),
      ("b", "a") -> (1L, 1.0)))
  }

  private def round2(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("transitionMatrix breaks same-timestamp ties by the seq column") {
    val t0 = ts("2024-01-01 10:00:00")
    val events = Seq(
      (1L, t0, 2L, "b"), (1L, t0, 1L, "a"), (1L, t0, 3L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.transitionMatrix(events, "user_id", "event_type",
        Seq(col("ts"), col("event_id")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("a", "b"), ("b", "c"))) // event_id order, not input order
  }

  test("rollingAgg: partial leading frames, then a full sliding frame per key") {
    val rows = (1L to 10L).map(i => (1L, i, i)) ++ Seq((2L, 1L, 100L))
    val df = rows.toDF("user_id", "seq", "v").repartition(5)
    val out = Analytics.rollingAgg(df, "user_id", Seq(col("seq")), 3,
        Seq("s" -> sum(col("v")), "n" -> count(lit(1))))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out((1L, 1L)) === (1L, 1L))   // head: frame is just the row
    assert(out((1L, 2L)) === (3L, 2L))   // 1+2
    assert(out((1L, 3L)) === (6L, 3L))   // 1+2+3 — first full frame
    assert(out((1L, 10L)) === (27L, 3L)) // 8+9+10 — frame slides
    assert(out((2L, 1L)) === (100L, 1L)) // other key independent
  }

  test("InterleaveBits matches a bit-by-bit reference, interpreted and codegen'd") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (z, i) =>
        z | (((x >>> i) & 1L) << (2 * i)) | (((y >>> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (43690L, 21845L), (12345L, 54321L), (65536L, 65536L)) // 2^16 wraps to 0
    val df = cases.toDF("x", "y")
    val out = df.select(LayoutFunctions.zorder2(col("x"), col("y"), 16).as("z"))
      .collect().map(_.getLong(0))
    assert(out.toSeq === cases.map { case (x, y) => ref(x, y, 16) })
    // interleave of all-ones in both dims fills every bit pair
    assert(ref(65535L, 65535L, 16) === (1L << 32) - 1)
  }

  test("InterleaveBits(32) equals the Tables.zorder2 shift/mask ladder") {
    // two formulations of the same Morton key: the parametric native
    // expression and the fused bitwise-builtin ladder — pinned equal so
    // layouts written by either prune identically
    val cases = (0 until 500).map(i => ((i * 2654435761L) & 0xFFFFFFFFL, (i * 40503L) & 0xFFFFFFFFL))
    val df = cases.toDF("a", "b")
    val both = df.select(
      LayoutFunctions.zorder2(col("a"), col("b"), 32).as("nat"),
      graft.sources.Tables.zorder2(col("a"), col("b")).as("ladder"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("z-order buckets bound BOTH dimensions; a linear sort bounds only one") {
    // 64×64 deterministic grid. 16 equal-height buckets on the z curve must
    // give every bucket a rectangle ≈ 1/4 × 1/4 of each dim; the same cut on
    // an x-sorted layout leaves y spanning the whole domain in every bucket.
    val grid = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val df = grid.toDF("x", "y").repartition(7)
    val z = LayoutFunctions.zorder2(col("x"), col("y"), 6)
    def spans(ranked: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val byBucket = ranked
        .withColumn("b", Analytics.ntileOf(col("rn"), col("n_part"), 16))
        .groupBy("b")
        .agg((max(col("x")) - min(col("x"))).as("sx"), (max(col("y")) - min(col("y"))).as("sy"))
        .collect()
      (byBucket.map(_.getLong(1)).max, byBucket.map(_.getLong(2)).max)
    }
    val (zx, zy) = spans(Analytics.rangedRank(df.withColumn("__z", z),
      Seq.empty, Seq(col("__z"), col("x"), col("y"))))
    val (lx, ly) = spans(Analytics.rangedRank(df,
      Seq.empty, Seq(col("x"), col("y"))))
    assert(zx <= 16 && zy <= 16, s"z-order bucket spans ($zx, $zy) not rectangular")
    assert(lx <= 4, s"linear layout should slice x narrowly, got $lx")
    assert(ly === 63, "linear layout must leave y unbounded per bucket")
  }
}
