package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitioned prunes partitions for filters on the partition column") {
    val dir = Files.createTempDirectory("graft_part").toString
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("cat", "v")
    Tables.writePartitioned(df, dir, Seq("cat"))
    val back = spark.read.parquet(dir).filter(col("cat") === "a")
    assert(back.collect().map(_.getAs[Int]("v")).sorted.toSeq === Seq(1, 2))
    // pruning is visible in the scan's partition filters
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cat"))
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val s = spark
    import s.implicits._
    val a = (1 to 100).map(i => (i.toLong % 10, i)).toDF("k", "va")
    val b = (1 to 50).map(i => (i.toLong % 10, s"x$i")).toDF("k", "vb")
    Tables.writeBucketed(a, "bk_a", Seq("k"), numBuckets = 4, sortCols = Seq("k"))
    Tables.writeBucketed(b, "bk_b", Seq("k"), numBuckets = 4, sortCols = Seq("k"))
    val joined = s.table("bk_a").join(s.table("bk_b"), "k")
    // disable broadcast so the join would otherwise need an exchange
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() === 500) // 100 rows × 5 matching b rows per key
    s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("writeRangeLayout orders files so range predicates prune") {
    val dir = Files.createTempDirectory("graft_range").toString
    val df = (1 to 1000).map(i => (i, s"r$i")).toDF("id", "s")
    Tables.writeRangeLayout(df, dir, Seq("id"), numFiles = 4)
    val back = spark.read.parquet(dir).filter(col("id") > 990)
    assert(back.count() === 10)
  }
  test("json and csv sources round-trip with explicit schemas") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, "with,comma", 0.0))
      .toDF("id", "name", "score")
    val jdir = Files.createTempDirectory("graft_json").toString
    df.write.mode("overwrite").json(jdir)
    val jback = Tables.jsonTable(spark, jdir, schema)
    assert(jback.schema === schema)
    assert(jback.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      === df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet)
    val cdir = Files.createTempDirectory("graft_csv").toString
    df.write.mode("overwrite").option("header", "true").csv(cdir)
    val cback = Tables.csvTable(spark, cdir, schema)
    assert(cback.schema === schema)
    assert(cback.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      === df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet)
  }

}
