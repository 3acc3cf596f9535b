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
}
