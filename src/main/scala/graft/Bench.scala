package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * Methodology:
  *  - Results go to the `noop` sink, not `count()` — count() lets
  *    Catalyst prune unreferenced projections (a narrow transform
  *    would measure as a bare scan), noop forces every output column
  *    to materialize.
  *  - A warmup pass at the smallest scale factor (when present) JITs
  *    codegen/shuffle paths first, so timings reflect steady-state
  *    throughput — the quantity that extrapolates to a long-running
  *    cluster — not single-shot JVM warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the warmup + timed phases compile >100 distinct codegen stages;
      // the default 100-entry codegen class cache would evict warmup's
      // classes and make every timed query pay Janino recompilation
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runAll(dir: String, record: Boolean): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          if (record) System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }

    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001"))
    if (warmupDir != sfDir && new java.io.File(warmupDir).isDirectory)
      runAll(warmupDir, record = false)
    spark.sharedState.cacheManager.clearCache() // warmup must not donate caches

    val results = runAll(sfDir, record = true)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
