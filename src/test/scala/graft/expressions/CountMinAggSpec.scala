package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Row
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Count-Min sketch aggregate: the overcount guarantee (est ≥ exact,
  * always), exact merge-order invariance (element-wise addition — the
  * merged table must be BIT-identical under any partitioning, a stronger
  * property than MG's contract-stable trim), and the aggregate↔probe
  * hash agreement that the whole design hinges on.
  */
class CountMinAggSpec extends SparkSpec {
  import spark.implicits._

  private val items = Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++
    (1 to 40).flatMap(j => Seq.fill(5)(s"cold$j"))

  test("countmin: table identical under 1, 7, and 32 partitions") {
    val tables = Seq(1, 7, 32).map { parts =>
      val row = items.toDF("item").repartition(parts)
        .agg(TF.cmSketch(col("item"), 4, 64).as("cm")).head().getStruct(0)
      (row.getLong(0), row.getSeq[Long](1))
    }
    assert(tables(0)._1 === 750L)
    assert(tables(0)._2.length === 4 * 64)
    assert(tables.distinct.size === 1,
      "merge must be exactly order-invariant (element-wise add)")
    // mass conservation: every row of the table sums to n
    val byRow = tables(0)._2.grouped(64).map(_.sum).toSeq
    assert(byRow === Seq.fill(4)(750L))
  }

  test("countmin: est >= exact for every key; nulls don't count") {
    val df = (items.map(Option(_)) ++ Seq(None, None)).toDF("item")
    val sk = df.agg(TF.cmSketch(col("item"), 4, 64).as("cm"))
    val exact = items.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val probed = df.na.drop().distinct()
      .crossJoin(broadcast(sk))
      .select(col("item"), TF.cmEstimate(col("cm"), col("item"), 4, 64).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(probed.size === exact.size)
    exact.foreach { case (k, n) =>
      assert(probed(k) >= n, s"$k: est ${probed(k)} < exact $n")
    }
    // n excludes nulls
    assert(sk.head().getStruct(0).getLong(0) === 750L)
  }

  test("countmin: probe replays the update path bucket-for-bucket") {
    // single-item stream: its estimate is exact in every row, so any
    // aggregate/probe hash divergence shows up as est != n
    val one = Seq.fill(97)("lonely").toDF("item")
    val sk = one.agg(TF.cmSketch(col("item"), 5, 32).as("cm"))
    val est = one.distinct().crossJoin(broadcast(sk))
      .select(TF.cmEstimate(col("cm"), col("item"), 5, 32)).head().getLong(0)
    assert(est === 97L)
  }

  test("countmin: width must be a power of two") {
    intercept[IllegalArgumentException] {
      CountMinAgg(org.apache.spark.sql.graft.ColumnBridge.expression(col("x")),
        4, 100)
    }
  }

  test("countmin: streaming complete-mode snapshot == batch sketch (safe accumulator)") {
    // exact merge-order invariance means the sketch works unchanged as a
    // streaming aggregate: after any batch split, the snapshot table must
    // be BIT-identical to the one-shot batch aggregate over the union
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = in.toDF().toDF("item")
      .agg(TF.cmSketch(col("item"), 4, 64).as("cm"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cm_stream").start()
    try {
      val (b1, b2) = (items.take(400), items.drop(400))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val live = spark.table("cm_stream").head().getStruct(0)
      val batch = items.toDF("item")
        .agg(TF.cmSketch(col("item"), 4, 64).as("cm")).head().getStruct(0)
      assert(live.getLong(0) === batch.getLong(0))
      assert(live.getSeq[Long](1) === batch.getSeq[Long](1))
    } finally q.stop()
  }
}
