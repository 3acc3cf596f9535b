package graft.operators

import org.apache.spark.sql.DataFrame

/** Local-parallelism guard for CPU-heavy per-row stages (shingling, hashing,
  * all-pairs vector math). A small parquet file scans as ONE split, so
  * everything before the first exchange runs on one core; fanning out to the
  * session's default parallelism fixes that for pennies (the inputs are tiny
  * exactly when the guard fires). At scale the scan already has ≥ cores
  * splits and this is a no-op — no extra exchange is ever added to a big
  * input.
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.columns.isEmpty) df // nothing to hash; a 0-col frame has no per-row work either
    else if (df.rdd.getNumPartitions < target)
      // hash-repartition on the row content, NOT round-robin: round-robin
      // placement depends on intra-partition row order, so Spark inserts a
      // full local SORT of every column before the exchange to make task
      // retries deterministic (spark.sql.execution.sortBeforeRepartition) —
      // a single-core sort of exactly the stage this helper exists to
      // unblock. Hashing the columns is deterministic by CONTENT, needs no
      // sort, and identical rows colliding into one partition is harmless
      // for the embarrassingly-parallel per-row work downstream.
      df.repartition(target, df.columns.map(org.apache.spark.sql.functions.col): _*)
    else df
  }
}
