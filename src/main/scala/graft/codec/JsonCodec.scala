package graft.codec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** JSON codec for Kafka wire format — plays the role of the reference's
  * EdnSerde (`src/kafka_streams_the_clojure_way/core.clj:24-26`, app-wide
  * default at `core.clj:18-19`). EDN is self-describing; here schemas are
  * explicit `StructType`s (a deliberate upgrade, SURVEY §1.2) and the
  * decode/encode are Catalyst-native `from_json`/`to_json` — codegen'd, no
  * custom Expression and no UDF.
  */
object JsonCodec {

  /** Decode a Kafka-shaped frame (`key: binary`, `value: binary`) into typed
    * columns. Scalar keys (the reference keys by plain ints, `core.clj:62`)
    * are cast directly; struct keys go through `from_json`.
    */
  def decode(df: DataFrame, keyType: DataType, valueSchema: StructType): DataFrame = {
    val keyCol: Column = keyType match {
      case s: StructType => from_json(col("key").cast("string"), s)
      case t             => col("key").cast("string").cast(t)
    }
    df.select(keyCol.as("key"), from_json(col("value").cast("string"), valueSchema).as("value"))
  }

  /** Flatten a decoded frame to top-level columns: `key, <value fields...>`.
    * This is the layout the operator layer works over (SURVEY §1.3).
    */
  def flatten(df: DataFrame): DataFrame =
    df.select(col("key") +: df.schema("value").dataType.asInstanceOf[StructType]
      .fieldNames.toIndexedSeq.map(f => col(s"value.$f")): _*)

  /** Encode back to the Kafka wire shape: all non-key columns become a JSON
    * value string, the key column a string key.
    */
  def encode(df: DataFrame, keyCol: String = "key"): DataFrame = {
    val valueCols = df.columns.filterNot(_ == keyCol).toIndexedSeq
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(valueCols.map(col): _*)).as("value"))
  }
}
