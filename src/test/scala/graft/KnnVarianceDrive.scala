package graft

/** r15 (VERDICT r14 #3): the knn_components_ann variance-attribution
  * drive. Two consecutive rounds hand-waved this entry's swings
  * (r13: 8.5/8.6 s → r14: driver-isolated 26.3 s vs local
  * 10.9-11.8 s, code untouched); this drive pins a measured variance
  * band WITH the box-load evidence alongside, so the next round can
  * say "inside [lo, hi] at load < L" from data.
  *
  * Method: warm JVM (one untimed rep), then N timed back-to-back reps
  * of ONLY the entry (the bench's isolated posture), caches cleared
  * between reps via the bench's OWN sweep ([[Bench.clearAllCaches]] —
  * a private copy here would drift), /proc/loadavg sampled before
  * each rep ([[Bench.loadAvg]]). Prints one line per rep and a final
  * JSON summary with median, min/max band, and the load range, for
  * PERF.md's table.
  *
  * Usage: sbt "Test/runMain graft.KnnVarianceDrive [sfDir] [reps]"
  */
object KnnVarianceDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(9).max(3)
    val names = Seq("knn_components_ann", "knn_components")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000"))
    spark.sparkContext.setLogLevel("ERROR")
    def load1m(): Double = Bench.loadAvg().headOption.getOrElse(-1.0)
    try {
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        // untimed JIT/codegen warmup — cold-JVM timings on this box
        // read 2-3× warm ones and would poison the band
        Bench.clearAllCaches(spark)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val samples = (1 to reps).map { i =>
          Bench.clearAllCaches(spark)
          val load = load1m()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[knnvar] $name rep=$i sec=$sec%.3f load1m=$load%.2f")
          (sec, load)
        }
        val secs = samples.map(_._1)
        val loads = samples.map(_._2)
        println(s"""{"metric":"knn_variance","entry":"$name",""" +
          s""""sf":"$sfDir","reps":$reps,""" +
          s""""median":${Jsons.num(Bench.median(secs), 3)},""" +
          s""""min":${Jsons.num(secs.min, 3)},""" +
          s""""max":${Jsons.num(secs.max, 3)},""" +
          s""""load1m_min":${Jsons.num(loads.min, 2)},""" +
          s""""load1m_max":${Jsons.num(loads.max, 2)}}""")
      }
    } finally spark.stop()
  }
}
