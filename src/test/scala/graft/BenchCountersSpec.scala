package graft

/** The bench's deterministic counters (r16 verdict #2) are only worth
  * committing if they are actually deterministic: run three headline
  * entries twice each (bench cache discipline between runs) and
  * assert the counted jobs / tasks / shuffle bytes are IDENTICAL.
  * Wall time and executor run time are NOT asserted — they are the
  * noisy quantities the counters exist to adjudicate. */
class BenchCountersSpec extends SparkSpec {

  private lazy val counters = new BenchCounters(spark.sparkContext)

  private def runCounted(name: String): BenchCounters.Snapshot = {
    val fn = SparkEntry.queries(name)
    Bench.clearAllCaches(spark)
    counters.record(name)(
      fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    counters.all(name)
  }

  for (name <- Seq("knn_components_ann", "eval_grouped_metrics",
                   "dedup_cluster")) {
    test(s"$name: jobs/tasks/shuffle bytes are run-over-run stable") {
      // one unasserted warmup so lazily-built session state (codegen
      // cache, file listing) doesn't skew the FIRST counted run
      runCounted(name)
      val a = runCounted(name)
      val b = runCounted(name)
      assert(a.jobs === b.jobs, s"$name: job count drifted")
      assert(a.tasks === b.tasks, s"$name: task count drifted")
      // shuffle BYTES jitter sub-0.1% run-over-run (block fetch
      // accounting under AQE local reads) — a 1% band still catches
      // any real plan change while jobs/tasks stay exact
      def close(x: Long, y: Long, what: String): Unit =
        assert(math.abs(x - y) <= math.max(x, y) / 100 + 1024,
          s"$name: $what drifted beyond 1%: $x vs $y")
      close(a.shufReadB, b.shufReadB, "shuffle read bytes")
      close(a.shufWriteB, b.shufWriteB, "shuffle write bytes")
      assert(a.jobs > 0 && a.tasks > 0, s"$name: counters saw no work")
    }
  }
}
