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

  // knn_pagerank, not knn_components_ann: entries that cache an
  // intermediate frame and let AQE re-plan over it
  // (canChangeCachedPlanOutputPartitioning) legitimately re-decide
  // coalesced partition counts run-over-run (measured: 193 vs 217
  // tasks on knn_components_ann) — their adjudication counters are
  // exec_s/shuffle_mb, not task counts. The three pinned entries
  // cover the iterative-loop, multi-aggregate and shuffle-heavy
  // shapes with deterministic plans.
  for (name <- Seq("knn_pagerank", "eval_grouped_metrics",
                   "dedup_cluster")) {
    test(s"$name: jobs/tasks/shuffle bytes are run-over-run stable") {
      // one unasserted warmup so lazily-built session state (codegen
      // cache, file listing) doesn't skew the FIRST counted run
      runCounted(name)
      val a = runCounted(name)
      val b = runCounted(name)
      // jobs/tasks: ±2 band, not exact — AQE submits query-stage
      // materializations from concurrent driver threads (Par-overlapped
      // legs, broadcast futures), and a race can merge one submission
      // into a sibling's, split it, or shave one coalesced partition
      // (observed on knn_components_ann: jobs 116 vs 117, tasks 216
      // vs 217, across same-suite runs). A plan change moves either
      // count by far more than 2 — the band keeps the tripwire.
      assert(math.abs(a.jobs - b.jobs) <= 2,
        s"$name: job count drifted beyond the AQE race band: " +
          s"${a.jobs} vs ${b.jobs}")
      assert(math.abs(a.tasks - b.tasks) <= 2,
        s"$name: task count drifted beyond the AQE race band: " +
          s"${a.tasks} vs ${b.tasks}")
      // shuffle WRITE bytes are a property of the plan and the data —
      // 1% band (compression block jitter only). READ bytes get 10%:
      // an iterative loop's exchange outputs are re-read 0-or-1 extra
      // times depending on AQE reuse timing (measured ±7% on
      // knn_pagerank) — still far under any real plan change.
      def close(x: Long, y: Long, what: String, pct: Long): Unit =
        assert(math.abs(x - y) <= math.max(x, y) * pct / 100 + 1024,
          s"$name: $what drifted beyond $pct%: $x vs $y")
      close(a.shufReadB, b.shufReadB, "shuffle read bytes", 10)
      close(a.shufWriteB, b.shufWriteB, "shuffle write bytes", 1)
      assert(a.jobs > 0 && a.tasks > 0, s"$name: counters saw no work")
    }
  }
}
