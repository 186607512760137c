package graft

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** r16: DETERMINISTIC cost counters for named catalog entries — the
  * load-insensitive companion to [[TimeNoop]] (wall clock on this box
  * swings ±26% with ambient load; job/task counts, executor run/CPU
  * time and shuffle bytes do not). One noop-sink run per entry with
  * the bench's cache discipline, counters from a SparkListener.
  *
  *   sbt "Test/runMain graft.CostNoop <sfDir> <entry> [entry ...]"
  */
object CostNoop {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000"))
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong
    val tasks = new AtomicLong
    val runMs = new LongAdder
    val cpuNs = new LongAdder
    val shufW = new LongAdder
    val inBytes = new LongAdder
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          runMs.add(m.executorRunTime)
          cpuNs.add(m.executorCpuTime)
          shufW.add(m.shuffleWriteMetrics.bytesWritten)
          inBytes.add(m.inputMetrics.bytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val sf = args.head
    try for (name <- args.tail) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown entry '$name'"))
      // warmup (JIT/codegen), then one counted run
      Bench.clearAllCaches(spark)
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      Bench.clearAllCaches(spark)
      Thread.sleep(1500) // let the async listener bus drain
      jobs.set(0); tasks.set(0)
      runMs.reset(); cpuNs.reset(); shufW.reset(); inBytes.reset()
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the async listener bus drain
      println(s"""{"entry":"$name","jobs":${jobs.get},"tasks":${tasks.get},""" +
        s""""exec_run_sec":${Jsons.num(runMs.sum / 1e3, 2)},""" +
        s""""exec_cpu_sec":${Jsons.num(cpuNs.sum / 1e9, 2)},""" +
        s""""shuffle_write_mb":${Jsons.num(shufW.sum / 1e6, 2)},""" +
        s""""input_mb":${Jsons.num(inBytes.sum / 1e6, 2)},""" +
        s""""wall_sec":${Jsons.num(wall, 2)},"sf":"$sf"}""")
    } finally spark.stop()
  }
}
