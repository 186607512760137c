package graft

/** r16 optimization-round measurement drive: isolated noop-sink
  * timings for named catalog entries, with the bench's own cache
  * discipline (clearAllCaches between reps) and median — the number
  * to diff before/after an operator change without paying a full
  * bench run. Reps via SPARK_GRAFT_TIME_REPS (default 5).
  *
  *   sbt "Test/runMain graft.TimeNoop <sfDir> <entry> [entry ...]"
  */
object TimeNoop {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000"))
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.head
    val reps = sys.env.get("SPARK_GRAFT_TIME_REPS")
      .flatMap(_.toIntOption).getOrElse(5).max(1)
    try for (name <- args.tail) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown entry '$name'"))
      // one untimed warmup rep (JIT/codegen), then timed reps
      val ts = (0 to reps).map { _ =>
        Bench.clearAllCaches(spark)
        val t0 = System.nanoTime()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.drop(1)
      val load = Bench.loadAvg().headOption.getOrElse(-1.0)
      println(s"""{"entry":"$name","median":${Jsons.num(Bench.median(ts), 3)},""" +
        s""""reps":${ts.map(Jsons.num(_, 3)).mkString("[", ",", "]")},""" +
        s""""load1m":${Jsons.num(load, 2)},"sf":"$sf"}""")
    } finally spark.stop()
  }
}
