package graft.codec

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The EDN-fidelity boundary as a TESTED contract (SURVEY §1.2/§1.3): the
  * engine substitutes JSON around declared `StructType`s for the
  * reference's EdnSerde (core.clj:24-26). This spec pins exactly which
  * payload shapes round-trip and which are outside the JSON/StructType
  * envelope — so the "deliberate upgrade" claim is measurable, not prose.
  *
  * ROUND-TRIPS (everything the reference actually sends): flat maps of
  * ints/doubles/strings/bools, nulls, nested structs, homogeneous arrays.
  *
  * DOES NOT ROUND-TRIP (EDN-only shapes, each with its pinned observable
  * failure): keyword VALUES survive only as plain ":kw" strings (type
  * identity lost), ratios (`1/3`) have no JSON value type (field nulls
  * out), heterogeneous arrays null out against a typed element schema.
  * A payload needing those must convert at the boundary — the contract a
  * migrating reference user reads here.
  */
class JsonCodecFidelitySpec extends SparkSpec {
  import spark.implicits._

  private def wire(key: String, value: String) =
    Seq((key.getBytes("UTF-8"), value.getBytes("UTF-8"))).toDF("key", "value")

  test("reference payload shapes round-trip encode -> decode exactly") {
    // the Part-3 transaction map shape (core.clj:62: {:amount n}) plus the
    // scalar/bool/null/array/nested shapes a jackdaw app could send
    val in = Seq(
      (1L, 2999L, 49.5, "purchase", true, Seq(1L, 2L, 3L)),
      (2L, 120L, -0.25, "donation", false, Seq.empty[Long])
    ).toDF("key", "amount", "score", "kind", "flag", "tags")
    val schema = StructType(Seq(
      StructField("amount", LongType), StructField("score", DoubleType),
      StructField("kind", StringType), StructField("flag", BooleanType),
      StructField("tags", ArrayType(LongType))))
    val back = JsonCodec.flatten(JsonCodec.decode(
      JsonCodec.encode(in).select(col("key").cast("binary"), col("value").cast("binary")),
      LongType, schema))
    assert(back.orderBy("key").collect().toSeq ===
      in.orderBy("key").collect().toSeq)
  }

  test("nested struct values round-trip through the declared schema") {
    val in = Seq((7L, ("alice", 3L))).toDF("key", "user")
    val schema = StructType(Seq(StructField("user", StructType(Seq(
      StructField("_1", StringType), StructField("_2", LongType))))))
    val back = JsonCodec.flatten(JsonCodec.decode(
      JsonCodec.encode(in).select(col("key").cast("binary"), col("value").cast("binary")),
      LongType, schema))
    val r = back.head()
    assert(r.getLong(0) === 7L)
    assert(r.getStruct(1).getString(0) === "alice")
    assert(r.getStruct(1).getLong(1) === 3L)
  }

  test("EDN keyword VALUES survive only as plain strings — type identity lost") {
    // EDN distinguishes :large (keyword) from "large" (string); JSON has
    // only strings. The codec preserves the TEXT ":large" bit-for-bit, so
    // a convention-based consumer still works — but nothing in the type
    // system says keyword, which is the documented §1.2 boundary.
    val schema = StructType(Seq(StructField("status", StringType)))
    val got = JsonCodec.decode(wire("1", """{"status":":large"}"""), LongType, schema)
      .select(col("value.status")).head().getString(0)
    assert(got === ":large")
  }

  test("EDN ratios do not round-trip: a 1/3 payload nulls the typed field") {
    // EDN `1/3` is an exact rational; JSON has no such value type, and a
    // naively transcribed "1/3" is not parseable as the declared numeric —
    // from_json (PERMISSIVE) nulls the field rather than guessing. The
    // boundary contract: convert ratios to decimal/double BEFORE encode.
    val schema = StructType(Seq(StructField("share", DoubleType)))
    val row = JsonCodec.decode(wire("1", """{"share":1/3}"""), LongType, schema)
      .select(col("value.share")).head()
    assert(row.isNullAt(0))
  }

  test("heterogeneous arrays do not round-trip against a typed element schema") {
    // EDN allows [1 "a" :kw]; a declared ArrayType(LongType) cannot hold
    // it — from_json nulls the value rather than coercing element-wise
    val schema = StructType(Seq(StructField("xs", ArrayType(LongType))))
    val row = JsonCodec.decode(wire("1", """{"xs":[1,"a"]}"""), LongType, schema)
      .select(col("value.xs")).head()
    assert(row.isNullAt(0))
  }
}
