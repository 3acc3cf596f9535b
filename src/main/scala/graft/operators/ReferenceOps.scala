package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Stream, Topic, Topology}

/** The reference's complete operator surface (SURVEY §2), re-expressed as
  * composable `DataFrame => DataFrame` values — the Spark analog of the
  * transducer pipelines in `src/kafka_streams_the_clojure_way/core.clj:100-118`.
  * Scala function composition (`andThen`) replaces transducer `comp`
  * (`core.clj:100,112`); Catalyst's `CombineFilters`/`CollapseProject` fuse the
  * composed stages, so "fusion" is free (SURVEY §4.2).
  */
object ReferenceOps {

  type Pipe = DataFrame => DataFrame

  /** P1/P6 — keep records with `amount >= 100` (inclusive; the reference's
    * `(<= 100 amount)`, `core.clj:79-80`, `core.clj:102-103`).
    */
  def filterAtLeast(c: Column, threshold: Double): Pipe = df => df.filter(c >= threshold)

  /** P2/P3/P7 — per-record projection of the value to `{user-id, amount}`
    * (`select-keys`, `core.clj:81-82`, `core.clj:104-105`). Key-preserving, so
    * no repartition is implied (SURVEY §2.2 P2 note).
    */
  def selectKeys(cols: Column*): Pipe = df => df.select(cols: _*)

  /** P4 — cents → whole currency units with truncation toward zero, the
    * Clojure `(int (/ cents 100))` at `core.clj:118`. Spark's cast-to-int on a
    * double truncates toward zero, matching Clojure `int` exactly; amounts are
    * non-negative in the reference so floor and truncate agree.
    */
  def centsToUnits(cents: Column): Column = (cents / 100).cast("int")

  /** The purchase branch (`core.clj:100-105`): filter amount ≥ 100, project to
    * (key, user_id, amount).
    */
  val largePurchases: Pipe =
    filterAtLeast(col("amount"), 100)
      .andThen(selectKeys(col("key"), col("user_id"), col("amount").cast("int").as("amount")))

  /** The donation branch (`core.clj:112-118`): filter cents ≥ 10000, reshape to
    * (key, user_id, amount=int(cents/100)) — P5's map-literal construction.
    */
  val largeDonations: Pipe =
    filterAtLeast(col("donation_amount_cents"), 10000)
      .andThen(selectKeys(col("key"), col("user_id"),
        centsToUnits(col("donation_amount_cents")).as("amount")))

  /** M1 — stream merge: bag-union with no ordering/dedup (`js/merge`,
    * `core.clj:130-134`). Branches must already be schema-normalized, which
    * the reference guarantees by construction (`core.clj:104-105/116-118`).
    */
  def merge(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** The full Part-3 topology (`core.clj:139-157`): 3 topic nodes, 2 stream
    * nodes, fan-in merge at the output topic (`core.clj:152-153`).
    */
  val transactionTopology: Topology = Topology(
    entities = Map(
      "purchase-made"          -> Topic("purchase-made"),
      "humble-donation-made"   -> Topic("humble-donation-made"),
      "large-transaction-made" -> Topic("large-transaction-made"),
      "large-purchase-stream"  -> Stream("large-purchase-stream", largePurchases),
      "large-donation-stream"  -> Stream("large-donation-stream", largeDonations)),
    workflow = Seq(
      "purchase-made"         -> "large-purchase-stream",
      "humble-donation-made"  -> "large-donation-stream",
      "large-purchase-stream" -> "large-transaction-made",
      "large-donation-stream" -> "large-transaction-made"))
}
