package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeExprs
import graft.functions.TextFunctions._

/** F21: byte-pair-encoding tokenizer TRAINING and ENCODING (Sennrich
  * et al. 2016) — the "BPE-ish regex" token counter (F3) upgraded to
  * a real learned subword vocabulary, the tokenizer step every
  * pretraining pipeline runs before packing (F7).
  *
  * Scale shape: training iterates over the DISTINCT-WORD table (word,
  * count, symbol array) — the corpus collapses to its vocabulary
  * before any merge work, so a 100 TB crawl with a 100M-word
  * vocabulary trains on 100M rows regardless of corpus size. Each of
  * the `nMerges` iterations is two narrow jobs on that table: a
  * pair-count groupBy (map-side partial agg) + argmax `limit 1`
  * collect (ONE row to the driver — bounded metadata, the FAISS
  * "coarse quantizer on the driver" posture), then a fused
  * [[graft.functions.BpeExprs.BpeMergePass]] scan. `localCheckpoint`
  * truncates the per-iteration lineage (the dedup_cluster rationale)
  * and the superseded checkpoint blocks are explicitly unpersisted.
  *
  * Determinism: argmax ties break on (count desc, left asc, right
  * asc) — the merge list is a pure function of the corpus. */
object Bpe {

  /** Character symbols + the word-end marker — `split(word, "")`
    * keeps possible empty fragments out (engine-dependent trailing
    * empties), and "</w>" marks the boundary so merges can't cross
    * words (Sennrich's construction). */
  private def charSyms(word: Column): Column =
    concat(filter(split(word, ""), s => length(s) > 0),
      array(lit("</w>")))

  /** Distinct-word working table `(word, cnt, syms)`. */
  private def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms", charSyms(col("word")))

  /** Adjacent-pair counts over the current symbol arrays, weighted by
    * word count — one row per distinct (l, r) after the partial agg. */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(2, size(syms)), " +
          "i -> struct(syms[i-2] AS l, syms[i-1] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))

  /** The localCheckpoint-with-explicit-pins pattern (see
    * Dedup.checkpointPinned's scaladoc for why Dataset.unpersist
    * cannot free checkpoint blocks). */
  private def checkpointPinned(df: DataFrame)
      : (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    val pinned = (sc.getPersistentRDDs -- before).values.toSeq
    (out, pinned)
  }

  /** Train `nMerges` merges; returns (left, right, pair_count) in
    * rank order — driver-side bounded metadata (the merge list IS the
    * tokenizer model). Stops early only if no adjacent pair remains
    * anywhere (every word fully merged to one symbol). */
  def train(docs: DataFrame, nMerges: Int): Array[(String, String, Long)] = {
    require(nMerges > 0, s"nMerges=$nMerges must be positive")
    val spark = docs.sparkSession
    var (words, pins) = checkpointPinned(wordTable(docs))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (merges.size < nMerges && continue) {
      val best = pairCounts(words)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (best.isEmpty) continue = false
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((l, r, c))
        val next = BpeExprs.withMergePass(spark, l, r) { fn =>
          words.withColumn("syms", call_function(fn, col("syms")))
        }
        val (w2, p2) = checkpointPinned(next)
        pins.foreach(_.unpersist(false))
        words = w2
        pins = p2
      }
    }
    pins.foreach(_.unpersist(false))
    merges.toArray
  }

  /** A merge list as a DataFrame for the catalog/bench surface:
    * `(rank, left, right, merged, pair_count)`. */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
                 merges: Array[(String, String, Long)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r, c), i) =>
      (i + 1L, l, r, l + r, c)
    }.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** [[train]] + [[mergeTable]] in one call. */
  def trainTable(docs: DataFrame, nMerges: Int): DataFrame =
    mergeTable(docs.sparkSession, train(docs, nMerges))

  /** Memoized [[train]] for catalog entries that compose training and
    * encoding over the same directory (bpe_train + bpe_encode must
    * not each pay the iteration loop in one Verify/Bench run). */
  private val trainMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), Array[(String, String, Long)]]()
  def trainCached(key: String, docs: => DataFrame,
                  nMerges: Int): Array[(String, String, Long)] =
    trainMemo.computeIfAbsent((key, nMerges), _ => train(docs, nMerges))

  /** Drop memoized trainings — Bench calls this between reps so the
    * first bpe entry of EVERY rep re-pays the iteration loop (the
    * memo would otherwise zero reps 2..n and ship a phantom median);
    * within one rep the train/encode pair still shares one training,
    * which is the composition a real pipeline runs. */
  def clearCache(): Unit = trainMemo.clear()

  /** Encode documents with a learned merge list: per-doc BPE piece
    * counts `(doc_id, n_toks, n_pieces)`. The batch's DISTINCT words
    * encode once (fused [[graft.functions.BpeExprs.BpeEncodeExpr]]
    * scan over the vocabulary table — corpus size never multiplies
    * the merge work), docs join the per-word piece counts back on the
    * word key and aggregate. Token-less docs keep a (0, 0) row. */
  def encode(docs: DataFrame,
             merges: Array[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val wcount = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("m"))
    val pieces = BpeExprs.withEncode(spark, merges) { fn =>
      wcount.select(col("word")).distinct()
        .select(col("word"),
          size(call_function(fn, charSyms(col("word"))))
            .cast("bigint").as("wp"))
    }
    docs.select(col("doc_id"))
      .join(wcount.join(pieces, Seq("word"))
          .groupBy(col("doc_id"))
          .agg(sum(col("m")).as("n_toks"),
            sum(col("m") * col("wp")).as("n_pieces")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }
}
