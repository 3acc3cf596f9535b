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
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
