package graft.expressions

import graft.SparkSpec
import graft.operators.RangeShard
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}

/** [[RangeShardId]] — the binary-search shard id behind
  * [[graft.operators.RangeShard.shardOf]]. Pins the three contracts the
  * two-pass rank/pack consumers rely on: the id is the count of boundaries
  * strictly below the key in ascending NULLS FIRST lexicographic order,
  * it is monotone in that order (equal keys never straddle a boundary),
  * and codegen and interpreted eval agree.
  */
class RangeShardIdSpec extends SparkSpec {
  import spark.implicits._

  private def bruteCount(bounds: Seq[Seq[Option[Any]]], key: Seq[Option[Any]]): Int = {
    def lt(a: Seq[Option[Any]], b: Seq[Option[Any]]): Boolean = {
      (a zip b).foreach {
        case (None, None)         => ()
        case (None, Some(_))      => return true
        case (Some(_), None)      => return false
        case (Some(x), Some(y)) if x != y =>
          return (x, y) match {
            case (i: Long, j: Long)     => i < j
            case (i: String, j: String) => i < j
            case _                      => sys.error("unsupported")
          }
        case _ => ()
      }
      false
    }
    bounds.count(b => lt(b, key))
  }

  test("shard id = count of boundaries strictly below, nulls-first lexicographic (randomized vs brute force)") {
    val rng = new scala.util.Random(11)
    def cell(): Option[Any] = if (rng.nextInt(6) == 0) None else Some(rng.nextInt(8).toLong)
    val types: Seq[DataType] = Seq(LongType, LongType)
    val boundRows = Seq.fill(9)(Seq(cell(), cell()))
    // ascending sort by the same nulls-first order the sampler uses
    val sorted = boundRows.sortWith((a, b) => bruteCount(Seq(a), b) == 1)
    val bounds = sorted.map(r => Row(r.map(_.orNull): _*)).toArray
    val keys = Seq.fill(60)(Seq(cell(), cell()))
    val df = keys.map(k =>
        (k(0).map(_.asInstanceOf[Long]).map(java.lang.Long.valueOf).orNull,
         k(1).map(_.asInstanceOf[Long]).map(java.lang.Long.valueOf).orNull))
      .toDF("a", "b")
    val got = df.withColumn("s",
        RangeShard.shardOf(Seq(col("a"), col("b")), bounds, types))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getInt(2)))
    got.foreach { case (a, b, s) =>
      assert(s === bruteCount(sorted, Seq(a, b)), s"key ($a, $b)")
    }
  }

  test("monotone in key order and equal keys share a shard (string keys)") {
    val types: Seq[DataType] = Seq(StringType)
    val bounds = Array(Row(null), Row("dd"), Row("mm"), Row("mm"), Row("tt"))
    val keys = Seq(null, null, "aa", "dd", "dd", "kk", "mm", "zz")
    val df = keys.toDF("k")
    val got = df.withColumn("s", RangeShard.shardOf(Seq(col("k")), bounds, types))
      .collect().map(r => Option(r.getString(0)) -> r.getInt(1)).toSeq
    // null is below every boundary except the null one -> shard 0;
    // equal keys ("dd") agree; ids never decrease along the sorted keys
    assert(got.map(_._2) === Seq(0, 0, 1, 1, 1, 2, 2, 5))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.InternalRow
    val e = RangeShardId(
      Seq(BoundReference(0, LongType, nullable = true)),
      IndexedSeq(IndexedSeq(null), IndexedSeq(3L), IndexedSeq(7L)),
      Seq(LongType))
    assert(e.eval(InternalRow(null)) === 0)    // null: below 3 only via nulls-first? null == null bound -> not below
    assert(e.eval(InternalRow(2L)) === 1)      // above the null boundary only
    assert(e.eval(InternalRow(3L)) === 1)      // equal to 3: not strictly above it
    assert(e.eval(InternalRow(5L)) === 2)
    assert(e.eval(InternalRow(9L)) === 3)
    // the same five keys through the codegen'd path
    val df = Seq[java.lang.Long](null, 2L, 3L, 5L, 9L).toDF("k")
    val got = df.withColumn("s", RangeShard.shardOf(Seq(col("k")),
        Array(Row(null), Row(3L), Row(7L)), Seq(LongType)))
      .collect().map(_.getInt(1)).toSeq
    assert(got === Seq(0, 1, 1, 2, 3))
  }

  test("empty boundary table puts every row in shard 0") {
    val df = Seq(1L, 2L).toDF("k")
    val got = df.withColumn("s",
        RangeShard.shardOf(Seq(col("k")), Array.empty[Row], Seq(LongType)))
      .collect().map(_.getInt(1)).toSeq
    assert(got === Seq(0, 0))
  }
}
