package graft

/** Generic two-scale wall-clock drive for catalog entries: times each
  * named `SparkEntry.queries` entry (materialized via `count()`) at
  * two dataset dirs and prints the per-entry ratio — the BENCH_SF1
  * decomposition loop for a SUBSET, so a new round's entries get
  * their scaling row without re-running the whole catalog.
  *
  *   sbt "Test/runMain graft.EntryScaleDrive <dirSmall> <dirLarge> <name,name,...>"
  */
object EntryScaleDrive {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: EntryScaleDrive <dirSmall> <dirLarge> <name,name,...>")
    val Array(small, large, namesCsv) = args
    val names = namesCsv.split(',').toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown entries: ${unknown.mkString(", ")}")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"),
      shufflePartitions = "32")
    spark.sparkContext.setLogLevel("ERROR")

    def clearCaches(): Unit = {
      graft.operators.Dedup.releaseCaches()
      graft.operators.Similarity.releaseCaches()
      graft.operators.Corpus.releaseCaches()
      graft.operators.TextAnalysis.releaseCaches()
      graft.operators.Bpe.clearCache()
      spark.sharedState.cacheManager.clearCache()
    }
    def time(dir: String, name: String): (Double, Long) = {
      clearCaches()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // warmup pass (codegen + JIT) on the small dir, not recorded
    names.foreach(n => time(small, n))
    val rows = names.map { n =>
      val (ws, rs) = time(small, n)
      val (wl, rl) = time(large, n)
      println(f"[scale] $n%-28s ${ws}%7.2fs -> ${wl}%7.2fs  " +
        f"wall x${wl / math.max(1e-9, ws)}%.1f  rows $rs%d -> $rl%d " +
        f"(x${rl.toDouble / math.max(1, rs)}%.1f)")
      (n, ws, wl)
    }
    println(f"[scale] total ${rows.map(_._2).sum}%.2fs -> ${rows.map(_._3).sum}%.2fs")
    spark.stop()
  }
}
