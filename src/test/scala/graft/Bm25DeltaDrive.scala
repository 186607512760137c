package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Dev drive for the r11 appendable BM25 index: measures what a
  * serve actually READS and PAYS as delta segments accumulate, and
  * what compaction buys back — the numbers behind the "delta reads
  * stay Σ df(term)-shaped" claim.
  *
  * Run: `sbt "Test/runMain graft.Bm25DeltaDrive [nBatches]"`
  * (sf dir via SPARK_GRAFT_SF_DIR, default sf0.1). Half the corpus
  * builds the base index; the other half arrives in nBatches
  * appends. Reported per stage: serve wall (median of 5), posting
  * rows read (base + delta — the Σ df(term) bound), delta files
  * touched. */
object Bm25DeltaDrive {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val terms = Seq("spark", "window", "merge", "dup")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_bm25dd").toString

    def medianWall(reps: Int)(f: => Unit): Double = {
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      xs(xs.length / 2)
    }
    def serveOnce(): Unit =
      TextAnalysis.bm25TopKFromIndex(spark, "bm25_dd", terms, 20)
        .write.format("noop").mode("overwrite").save()
    def deltaStats(): (Long, Long) = {
      val dir = s"$path/bm25_post_delta"
      if (!new java.io.File(dir).isDirectory) (0L, 0L)
      else {
        // the serve's own pruned read shape: terms' pbkt partitions
        // the ONE bucket-count spelling (TextAnalysis.Bm25DeltaBuckets):
        // a second literal here would silently read the wrong
        // partitions if the constant ever moved
        val d = spark.read.parquet(dir)
          .filter(terms.map(t => col("pbkt") ===
            pmod(xxhash64(lit(t)),
              lit(TextAnalysis.Bm25DeltaBuckets))).reduce(_ || _) &&
            col("tok").isin(terms: _*))
        (d.count(), d.select(input_file_name()).distinct().count())
      }
    }

    TextAnalysis.writeBm25Stats(docs.filter(col("doc_id") % 2 === 0),
      "bm25_dd", s"$path/bm25")
    val baseRows = spark.table("bm25_dd_post")
      .filter(col("tok").isin(terms: _*)).count()
    println(f"bm25_delta[base]: serve=${medianWall(5)(serveOnce())}%.3f s " +
      f"post_rows=$baseRows delta_rows=0 delta_files=0")

    val odd = docs.filter(col("doc_id") % 2 =!= 0)
    (0 until nBatches).foreach { i =>
      TextAnalysis.appendToBm25Index(
        odd.filter(pmod(col("doc_id"), lit(2L * nBatches)) === 2 * i + 1),
        "bm25_dd", ingestBatch = i.toLong)
    }
    val (dRows, dFiles) = deltaStats()
    println(f"bm25_delta[${nBatches}_appends]: " +
      f"serve=${medianWall(5)(serveOnce())}%.3f s " +
      f"post_rows=$baseRows delta_rows=$dRows delta_files=$dFiles")

    TextAnalysis.compactBm25Index(spark, "bm25_dd")
    val (cRows, cFiles) = deltaStats()
    println(f"bm25_delta[compacted]: serve=${medianWall(5)(serveOnce())}%.3f s " +
      f"post_rows=$baseRows delta_rows=$cRows delta_files=$cFiles")

    // ground truth: the serve over base+delta ≡ one pass over ALL docs
    val served = TextAnalysis.bm25TopKFromIndex(spark, "bm25_dd", terms, 20)
      .orderBy("rank").collect().toSeq.map(_.toSeq)
    val full = TextAnalysis.bm25TopK(docs, terms, 20)
      .orderBy("rank").collect().toSeq.map(_.toSeq)
    println(s"bm25_delta[parity]: ${if (served == full) "EXACT" else "MISMATCH"}")
    // sweep the index copy — a measurement drive must not leave half
    // a corpus' postings in /tmp per run (the r10 ADVICE lesson)
    Seq("_df", "_meta", "_post").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS bm25_dd$sfx"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(path))
    spark.stop()
  }
}
