package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin`, on by default) — it needs no code change
  * and splits oversized post-shuffle partitions. Salting is the static
  * fallback for keys so hot that even a split partition is one key's rows:
  * spread the big side across `salt` sub-keys and replicate the small side
  * once per sub-key, trading `salt`× duplication of the small side for a
  * `salt`× fan-out of the hot key's rows.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salt` ways. Inner joins only
    * (replication makes outer semantics subtle). The salt is `rand(seed)`-
    * assigned on the big side — uniform regardless of which keys are hot —
    * and exploded on the small side, so every (key, salt) pair still meets
    * exactly once.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 seed: Long = 42L): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val saltedBig = big.withColumn("_salt", (rand(seed) * salt).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Semi-join reduction: inner equi-join `fact ⋈ dim` with a Bloom filter
    * of the dim side's keys pushed onto the fact SCAN, so fact rows that
    * cannot match never enter the shuffle. At 100 TB this is the join-volume
    * defense that complements [[saltedJoin]]'s distribution defense: a
    * selective dim (a filtered dimension, an entity slice) typically matches
    * well under 1% of the fact — without the pre-filter the full fact
    * shuffles; with it only ~(matching + fpp) rows do.
    *
    * Correctness is unconditional: Bloom false positives admit extra rows
    * into the join, where the exact equi-condition drops them — the result
    * is the plain join's, bit for bit. The bitmap is built from the dim
    * keys driver-side ([[graft.expressions.BloomUtil]], same machinery as
    * the decontamination gates) and rides into the fact scan's codegen as
    * a constant — no extra job on the fact. `maxBuildKeys` bounds the
    * driver build; a dim above it returns the PLAIN join (at that size the
    * dim is no longer selective enough for the reduction to pay anyway).
    */
  def bloomReducedJoin(fact: DataFrame, dim: DataFrame, key: String,
                       fpp: Double = 0.01, maxBuildKeys: Int = 4000000): DataFrame =
    bloomKeyFilter(dim, key, fpp, maxBuildKeys) match {
      case Some(mightContain) => fact.filter(mightContain).join(dim, key)
      case None               => fact.join(dim, key)
    }

  /** The Bloom membership predicate over `dim`'s distinct `key`s, or None
    * when the build exceeds `maxBuildKeys`. Exposed so callers can push the
    * same predicate onto several fact inputs of one dim.
    */
  def bloomKeyFilter(dim: DataFrame, key: String, fpp: Double = 0.01,
                     maxBuildKeys: Int = 4000000): Option[org.apache.spark.sql.Column] = {
    import graft.expressions.{BloomMightContain, BloomUtil}
    // drop null keys from the build: an equi-join never matches NULL, and
    // an unfiltered null reaches BloomUtil.add as a null UTF8String — a
    // driver NPE on any nullable dim key column
    val keys = dim.select(col(key).cast("string")).filter(col(key).isNotNull)
      .distinct().limit(maxBuildKeys + 1).collect().map(_.getString(0))
    if (keys.length > maxBuildKeys) return None
    val (m, k) = BloomUtil.sized(math.max(1L, keys.length.toLong), fpp)
    val bits = new Array[Long]((m >>> 6).toInt)
    keys.foreach(s =>
      BloomUtil.add(org.apache.spark.unsafe.types.UTF8String.fromString(s), bits, k, m))
    Some(org.apache.spark.sql.graft.ColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(key).cast("string")),
        bits, k, m)))
  }
}
