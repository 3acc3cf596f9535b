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

  test("orc source round-trips and pushes filters into the scan") {
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, "gamma", 0.0))
      .toDF("id", "name", "score")
    val odir = Files.createTempDirectory("graft_orc").toString
    df.write.mode("overwrite").orc(odir)
    val back = Tables.orcTable(spark, odir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      === df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet)
    val p = back.filter(col("id") > 1L).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(id,1)"), p)
  }

  test("zorder2 interleaves bits (matches a driver-side reference)") {
    def spreadRef(v: Long): Long = {
      var x = v
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      (x | (x << 1)) & 0x5555555555555555L
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (123456L, 654321L))
    val df = cases.toDF("a", "b")
      .select(Tables.zorder2(col("a"), col("b")).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (a, b) => spreadRef(a) | (spreadRef(b) << 1) }
    assert(got === want)
  }

  test("z-order layout keeps per-file min/max tight on BOTH dimensions") {
    // 64x64 grid; 16 files. A 1-D x-sort gives tight x ranges but each file
    // spans the full y domain; z-order bounds both.
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val df = grid.toDF("x", "y")
    val zdir = Files.createTempDirectory("graft_z").toString
    val xdir = Files.createTempDirectory("graft_x").toString
    Tables.writeZOrdered(df, zdir, "x", "y", numFiles = 16)
    Tables.writeRangeLayout(df, xdir, Seq("x"), numFiles = 16)
    def perFileRanges(dir: String): Seq[(Long, Long)] = {
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y"))).head
        (r.getInt(0).toLong, r.getInt(1).toLong)
      }
    }
    val z = perFileRanges(zdir)
    val naive = perFileRanges(xdir)
    assert(z.map(_._1).max <= 32, s"z-order x ranges too wide: $z")
    assert(z.map(_._2).max <= 32, s"z-order y ranges too wide: $z")
    assert(naive.map(_._2).max >= 60, "x-sorted layout should span the y domain per file")
  }

  test("zorder2 round-trips: de-interleaving recovers both coordinates (1000 random cases)") {
    def unspread(z: Long): Long = {
      var x = z & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      (x | (x >> 16)) & 0x00000000FFFFFFFFL
    }
    val rng = new scala.util.Random(11)
    val cases = Seq.fill(1000)((rng.nextInt(Int.MaxValue).toLong, rng.nextInt(Int.MaxValue).toLong))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), Tables.zorder2(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      assert(unspread(r.getLong(2)) === r.getLong(0), s"a lost in ${r}")
      assert(unspread(r.getLong(2) >> 1) === r.getLong(1), s"b lost in ${r}")
    }
  }

  test("events loader normalizes ts across nanos-long, timestamp[us] NTZ, and UTC-adjusted fixtures") {
    // Contract with the driver's regenerated testdata: `ts` has shipped as
    // TIMESTAMP(NANOS) (read as long under the legacy conf), as timestamp[us]
    // with isAdjustedToUTC=false (TIMESTAMP_NTZ), and could ship UTC-adjusted.
    // The SAME loader must hand every downstream operator identical
    // session-TZ TimestampType values for all three physical encodings —
    // round 8 lost 23 queries to exactly this drift.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val rows = Seq(
      (1L, "2024-01-01 10:00:00.123456", 7L, "click", 1.5),
      (2L, "2024-03-05 23:59:59.000001", 8L, "view", 2.5),
      (3L, "2024-07-31 00:00:00",        7L, "purchase", 9.0))
    val base = rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts_utc", to_timestamp(col("ts_s"))) // session TZ is UTC
    def write(tag: String)(tsCol: org.apache.spark.sql.Column): String = {
      val dir = Files.createTempDirectory(s"graft_ev_$tag").toString
      base.select(col("event_id"), tsCol.as("ts"), col("user_id"),
          col("event_type"), col("value"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val dirs = Seq(
      write("nanos")((unix_micros(col("ts_utc")) * 1000)), // legacy: INT64 epoch nanos
      write("ntz")(col("ts_utc").cast(TimestampNTZType)),  // current driver shape
      write("utc")(col("ts_utc")))                         // UTC-adjusted timestamp
    val reads = dirs.map { d =>
      val df = graft.SparkEntry.t(spark, d, "events")
      assert(df.schema("ts").dataType === TimestampType,
        s"$d: loader must always yield session-TZ TimestampType")
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val expected = base.select(col("event_id"), unix_micros(col("ts_utc")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    dirs.zip(reads).foreach { case (d, m) =>
      assert(m === expected, s"$d: normalized micros drifted")
    }
  }

  test("zoneMapAudit: range-clustered layout prunes, scrambled layout scans everything") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map(v => Tuple1(v)).toDF("v")
    val out = Tables.zoneMapAudit(df,
        layouts = Seq("sorted" -> (col("v") / 10).cast("int"),
          "scrambled" -> pmod(col("v"), lit(10))),
        statCol = col("v"), lo = lit(0), hi = lit(10))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // sorted: only file 0 (values 0..9) overlaps [0, 10) → 10 of 100 rows read
    assert(out("sorted") === ((10L, 1L, 10L, 10L, 0.1)))
    // scrambled: every file spans ~[k, 90+k] → all 10 files, all 100 rows read
    assert(out("scrambled") === ((10L, 10L, 100L, 10L, 1.0)))
  }

}
