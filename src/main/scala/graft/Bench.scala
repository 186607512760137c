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
  *  - Per-query MEDIAN over SPARK_GRAFT_BENCH_REPS (default 3) timed
  *    repetitions: this box has a documented noisy neighbor with
  *    ±2-3× load bursts, and a median absorbs a burst that lands on
  *    one rep instead of poisoning the round's number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // larger codegen class cache: the warmup + timed phases compile
    // >100 distinct stages and the default 100-entry cache would make
    // every timed query pay Janino recompilation
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000"))

    def clearCaches(): Unit = {
      graft.operators.Dedup.releaseCaches()
      graft.operators.Similarity.releaseCaches()
      graft.operators.Corpus.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
    }

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

    val runs = (1 to reps).map { _ =>
      clearCaches() // no rep donates caches to the next
      runAll(sfDir, record = true)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.length - 1) / 2)
    }
    val results = SparkEntry.queries.keys
      .map(name => name -> median(runs.map(_(name)))).toMap
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
