package graft

/** Dev probe: run ccLabels on a dataset dir and print the BSP round count
  * (the empirical backing for the "min-label BSP converges in O(diameter)
  * rounds, flat across scale" claim in Dedup.scala / PERF.md).
  *
  * Usage: sbt "Test/runMain graft.CcProbe <sfDir>"
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .getOrCreate()
    val n = graft.ops.Dedup.ccLabels(spark, dir).count()
    println(s"CCPROBE dir=$dir labeled=$n rounds=${graft.ops.Dedup.lastCcRounds.get()}")
    spark.stop()
  }
}
