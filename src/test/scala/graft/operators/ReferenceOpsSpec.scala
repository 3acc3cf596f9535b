package graft.operators

import graft.SparkSpec
import graft.codec.JsonCodec
import org.apache.spark.sql.functions._

/** Property-style laws from SURVEY §5.2.3 over seeded random inputs, plus
  * the struct-key codec path.
  */
class ReferenceOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(31)
  private def randPurchases(n: Int) =
    (1 to n).map(i => (i, rng.nextInt(10000), rng.nextInt(2000).toDouble)).toDF("key", "user_id", "amount")

  test("merge(A, B) is a permutation of filtered A ⊎ filtered B (bag semantics)") {
    val a = randPurchases(200)
    val b = randPurchases(150)
    val fa = ReferenceOps.largePurchases(a)
    val fb = ReferenceOps.largePurchases(b)
    val merged = ReferenceOps.merge(Seq(fa, fb))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq.sorted
    val separate = (fa.collect() ++ fb.collect())
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq.sorted
    assert(merged === separate)
  }

  test("composed pipe equals sequential application (fusion law)") {
    val df = randPurchases(300)
    val composed = ReferenceOps.largePurchases(df)
    val sequential = ReferenceOps.selectKeys(
      col("key"), col("user_id"), col("amount").cast("int").as("amount"))(
      ReferenceOps.filterAtLeast(col("amount"), 100)(df))
    assert(composed.collect().map(_.toSeq).toSeq === sequential.collect().map(_.toSeq).toSeq)
  }

  test("truncation law: centsToUnits(c) == floor(c/100) for c >= 0 (Clojure int cast)") {
    val cents = (0 until 500).map(_ => rng.nextInt(1000000).toDouble).toDF("c")
    val rows = cents.select(ReferenceOps.centsToUnits(col("c")).as("u"), col("c")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) === math.floor(r.getDouble(1) / 100).toInt)
    }
  }

  test("key preservation: every output key existed in the input with the same user") {
    val df = randPurchases(200)
    val in = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    ReferenceOps.largePurchases(df).collect().foreach { r =>
      assert(in(r.getInt(0)) === r.getInt(1))
    }
  }

  test("filter threshold is inclusive (the reference's (<= 100 amount))") {
    val df = Seq((1, 1, 99.0), (2, 2, 100.0), (3, 3, 101.0)).toDF("key", "user_id", "amount")
    val kept = ReferenceOps.largePurchases(df).collect().map(_.getInt(0)).toSet
    assert(kept === Set(2, 3))
  }

  test("JsonCodec decodes struct keys through from_json") {
    val wire = Seq(("""{"id":7,"region":"eu"}""", """{"amount":5}""")).toDF("key", "value")
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))
    val keySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("region", org.apache.spark.sql.types.StringType)))
    val valSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("amount", org.apache.spark.sql.types.IntegerType)))
    val out = JsonCodec.decode(wire, keySchema, valSchema).collect().head
    assert(out.getStruct(0).getInt(0) === 7)
    assert(out.getStruct(0).getString(1) === "eu")
    assert(out.getStruct(1).getInt(0) === 5)
  }
}
