package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** One-off (r10): attribute the r8→r9 bench drift on the three
  * shared dedup entries (dedup_ngram_jaccard 1.51→2.34s,
  * dedup_ngram_jaccard_capped 0.74→1.37s, dedup_survivors
  * 1.15→1.90s at sf0.1 — all +55–65%, outside the documented ±20%
  * noise band; VERDICT r9 "What's wrong #2").
  *
  * Two candidate causes, measured separately:
  *  1. ISOLATION — the three entries timed alone in a fresh session
  *     (cleared caches between reps, the Bench bracket). If isolated
  *     medians reproduce the r8 numbers, the drift is catalog-growth
  *     contention (129 entries' live cache slots + box noise), not a
  *     D3 code regression — D3's code did not change in r9.
  *  2. THE AUTO-CAP DENSITY AGGREGATE — r9's resolvedMaxBucket runs
  *     one count/countDistinct aggregate over the cached banded frame
  *     per D2/D4-family call. A/B: minhashLsh auto (maxBucket=0) vs
  *     explicit (maxBucket=1024) — identical pair output at this
  *     corpus, the delta IS the aggregate's cost.
  *
  * `sbt "Test/runMain graft.DedupDriftDrive [sfDir]"` → one JSON
  * line; findings land in PERF.md. Not part of `test`. */
object DedupDriftDrive {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = 5
    val spark = Sessions.local("32",
      extra = Map("spark.sql.codegen.cache.maxEntries" -> "5000"))

    def clear(): Unit = {
      Dedup.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
    }
    def time(fn: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def isolated(name: String): Double = {
      val fn = SparkEntry.queries(name)
      time(() => fn(spark, "/root/testdata/sf0.001")) // JIT warmup
      median((1 to reps).map { _ => clear(); time(() => fn(spark, sfDir)) })
    }

    // drifted D3-family entries + two CONTROLS that held flat r8→r9
    // (dedup_substring +9%, dedup_embedding_cosine +4%): if controls
    // also run above their recorded numbers today, the box is slower
    // and the right cross-round comparison is the ratio to control
    val targets = Seq("dedup_ngram_jaccard", "dedup_ngram_jaccard_capped",
      "dedup_survivors", "dedup_cluster",
      "dedup_substring", "dedup_embedding_cosine")
    val iso = targets.map(q => q -> isolated(q))

    // A/B the density aggregate on the D2 family itself
    val docs = Tables.documents(spark, sfDir)
    def mhAuto() = Dedup.minhashLsh(docs) // maxBucket = 0 → measured cap
    def mhExplicit() = Dedup.minhashLsh(docs, maxBucket = 1024L)
    time(() => mhAuto()); time(() => mhExplicit()) // warmup both plans
    val auto = median((1 to reps).map { _ => clear(); time(() => mhAuto()) })
    val expl = median((1 to reps).map { _ => clear(); time(() => mhExplicit()) })

    val isoJson = iso.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString(",")
    println(s"""{"drive":"dedup_drift","sf":"$sfDir","reps":$reps,""" +
      s""""isolated":{$isoJson},""" +
      s""""minhash_auto_cap":${f"$auto%.3f"},""" +
      s""""minhash_explicit_cap":${f"$expl%.3f"},""" +
      s""""density_agg_delta":${f"${auto - expl}%.3f"}}""")
    spark.stop()
  }
}
