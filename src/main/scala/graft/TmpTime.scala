package graft
// temp timing harness — deleted before commit
object TmpTime {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q_embed_near_dup_lsh", "q_embed_near_dup", "q_embed_near_dup_auto"); i <- 1 to 6) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).collect().length
      println(f"$q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
  }
}
