package graft
object TimeEntry {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.head
    for (name <- args.tail) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sf).count()
      println(f"[time] $name rows=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
