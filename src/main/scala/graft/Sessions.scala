package graft

import org.apache.spark.sql.SparkSession

/** Shared local-session builder for the runnable mains (Verify, Bench,
  * Explain, Pipeline) — one place for the configs every entry point
  * needs instead of four copies. */
object Sessions {
  def local(cpus: String, shufflePartitions: String = null,
            extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      // reuse cpus as the partition count only when it IS a count —
      // "*" is a legal local[...] master spec but would blow up far
      // away in SQLConf validation as a partition number
      .config("spark.sql.shuffle.partitions",
        Option(shufflePartitions).getOrElse(
          if (cpus.matches("[0-9]+")) cpus else "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // r16: the engine's signature bounded-collect pattern —
      // `limit(ceiling + 1).collect()` protecting driver metadata
      // (beam-serve hop pages, MMR candidate frames, admission
      // checks) — plans as CollectLimitExec, whose executeTake ramps
      // 1 → ×scaleUpFactor partitions per pass. Those protective
      // caps almost never BIND, so the ramp recomputes the scan in
      // 2+ sequential sub-jobs for zero saved work (measured: each
      // graph-serve hop paid it). A higher initial partition count
      // makes pass 1 cover the whole scan for anything under this
      // many partitions — one job per bounded collect. Env-tunable
      // for clusters where genuinely-selective small LIMITs dominate
      // (there the ramp is the right behavior — set it back to 1).
      // (a malformed value degrades to the default, like
      // SPARK_GRAFT_CPUS — never kills the session build)
      .config("spark.sql.limit.initialNumPartitions",
        sys.env.get("SPARK_GRAFT_LIMIT_INIT_PARTS")
          .flatMap(_.toIntOption).filter(_ > 0).getOrElse(512).toString)
      // r17: every LOCAL relation in this engine is bounded driver
      // metadata BY DOCTRINE (beam frontiers, known-pair sets, query
      // pages, admission sets — all ≤ 4096 rows or ceiling-guarded),
      // but LocalTableScanExec parallelizes its rows over
      // defaultParallelism when executed as an RDD — and Spark 4's
      // AQE broadcast-stage build executes exactly that RDD, so every
      // broadcast of a local frame paid a defaultParallelism-task job
      // (measured: a 6-hop graph serve ran 919 tasks / 45 exec-s, of
      // which ~580 tasks were 32-way parallelize of <100 KB local
      // data; at parallelism 1 the same serve runs 108 tasks /
      // 2.3 exec-s, identical results). One partition is the right
      // shape for ≤4096-row relations on ANY cluster size — shipping
      // bounded metadata through hundreds of scheduler slots is pure
      // overhead. Env-tunable for an engine reusing these sessions
      // with genuinely large local collections (not this catalog).
      .config("spark.sql.leafNodeDefaultParallelism",
        sys.env.get("SPARK_GRAFT_LEAF_PAR")
          .flatMap(_.toIntOption).filter(_ > 0).getOrElse(1).toString)
      // r16: let AQE re-plan the partitioning of CACHED intermediates
      // — the engine caches small intermediate frames everywhere
      // (CacheSlots), and with the default (false) every consumer of
      // a cached frame inherits the cached plan's pre-AQE shuffle
      // partition count instead of AQE-coalesced partitions (measured:
      // knn_pagerank_ann over a cached graph ran 505 → 779 tasks when
      // the graph cache pinned its partitioning). Scale-safe: this
      // only re-enables the same AQE coalescing uncached plans get.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
