package graft

import graft.operators.Bpe

/** Dev drive for the r9 batched BPE rounds: train a production-shaped
  * vocab (nMerges=1024) and report driver rounds + wall vs the
  * sequential lower bound (1024 rounds). The r8 verdict's ask: ≥10×
  * fewer rounds with the merge list unchanged.
  *
  * The corpus is SYNTHESIZED here (the SkewScaleDrive pattern): the
  * testdata documents share a ~30-word vocabulary, which exhausts
  * after ~106 merges with total pair interference — useless for
  * measuring batched rounds at production vocab sizes. This drive
  * builds a 20k-word random-character vocabulary with Zipf-ish
  * counts, the regime a real crawl's word table lives in.
  * Run: `sbt "Test/runMain graft.BpeScaleDrive [nMerges] [vocab] [mode]"`
  * — mode `greedy` skips the strict run + quality diff (r10's
  * production-merge-count measurement: strict at 4096 merges is
  * ~1400 driver rounds by design, the very cost the greedy mode
  * exists to avoid; wall-per-merge flatness 1k → 4k is the claim
  * under test, and the piece-delta vs strict is measured once at the
  * common 1024 vocab where strict is affordable). */
object BpeScaleDrive {
  def main(args: Array[String]): Unit = {
    val nMerges = args.headOption.map(_.toInt).getOrElse(1024)
    val vocabSize = args.lift(1).map(_.toInt).getOrElse(20000)
    val greedyOnly = args.lift(2).contains("greedy")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    // natural-ish words: skewed letter draws (so common bigrams exist),
    // zipf counts via rank — each word repeated cnt times across docs
    val letters = "etaoinshrdlucmfw"
    val words = (1 to vocabSize).map { rank =>
      val len = 3 + rnd.nextInt(8)
      val w = (1 to len).map(_ =>
        letters(math.min(rnd.nextInt(letters.length),
          rnd.nextInt(letters.length)))).mkString
      val cnt = math.max(1, (vocabSize / rank).min(5000))
      (w, cnt)
    }
    val docs = words.grouped(64).zipWithIndex.map { case (g, i) =>
      (i.toLong, g.map { case (w, c) =>
        Array.fill(math.min(c, 50))(w).mkString(" ") }.mkString(" "))
    }.toSeq.toDF("doc_id", "text")
    def run(label: String, strict: Boolean) = {
      val t0 = System.nanoTime()
      val (merges, rounds) = Bpe.trainWithRounds(docs, nMerges, strict = strict)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"bpe_scale[$label]: nMerges=$nMerges merges=${merges.length} " +
        f"rounds=$rounds (sequential would be ${merges.length}) " +
        f"speedup=${merges.length.toDouble / rounds}%.1fx wall=$secs%.1f s " +
        f"wall_per_merge=${1000.0 * secs / merges.length}%.1f ms")
      merges
    }
    val greedy = run("greedy", strict = false)
    if (greedyOnly) { spark.stop(); return }
    val strictM = run("strict", strict = true)
    // quality parity: pieces produced over the corpus by each vocab —
    // the number that matters for a tokenizer (merge ORDER deviation
    // is fine if compression matches)
    def piecesWith(m: Array[(String, String, Long)]): Long =
      Bpe.encode(docs, m.map(t => (t._1, t._2)))
        .agg(org.apache.spark.sql.functions.sum("n_pieces"))
        .head().getLong(0)
    val (pg, ps) = (piecesWith(greedy), piecesWith(strictM))
    val shared = greedy.map(t => (t._1, t._2)).toSet
      .intersect(strictM.map(t => (t._1, t._2)).toSet).size
    println(f"bpe_scale[quality]: pieces greedy=$pg strict=$ps " +
      f"delta=${100.0 * (pg - ps) / ps}%.3f%% " +
      f"vocab_overlap=$shared/${strictM.length}")
    spark.stop()
  }
}
