package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta", "en", "web"),
    (2L, "beta beta beta", "en", "web"),
    (3L, "uno dos tres cuatro cinco seis", "es", "books"),
    (4L, "uno uno uno uno", "es", "web"),
    (5L, "alpha alpha beta", "en", "books")
  ).toDF("doc_id", "text", "lang", "source")

  test("F6 sampleStratified is deterministic and respects rate ordering") {
    val all = Corpus.sampleStratified(docs, "lang", Map.empty, defaultRate = 1.0)
    assert(all.count() === 5) // rate 1.0 keeps everything ("g" > any hex)
    val none = Corpus.sampleStratified(docs, "lang", Map.empty, defaultRate = 0.0)
    assert(none.count() === 0) // "00000000" admits nothing
    val a = Corpus.sampleStratified(docs, "lang", Map("en" -> 0.5), 0.5)
      .select("doc_id").as[Long].collect().toSet
    val b = Corpus.sampleStratified(docs, "lang", Map("en" -> 0.5), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b) // same coin, same rows — no RNG state
    // raising a stratum's rate only ever ADDS rows from that stratum
    val low = Corpus.sampleStratified(docs, "lang", Map("en" -> 0.2), 1.0)
      .select("doc_id").as[Long].collect().toSet
    val high = Corpus.sampleStratified(docs, "lang", Map("en" -> 0.8), 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(low.subsetOf(high))
  }

  test("F6 hexThreshold formats the rate as 8 lowercase hex chars") {
    assert(Corpus.hexThreshold(0.25) === "40000000")
    assert(Corpus.hexThreshold(0.5) === "80000000")
    assert(Corpus.hexThreshold(0.9) === "e6666666")
    assert(Corpus.hexThreshold(1.0) === "g")
    assertThrows[IllegalArgumentException](Corpus.hexThreshold(-0.1))
  }

  test("F6b mixPlan computes down-sampling rates that hit the target shares") {
    // counts: en 3, es 2. target 50/50 → binding stratum is es
    // (2/0.5 = 4 < 3/0.5 = 6): T = 4, rate_en = 0.5*4/3, rate_es = 1
    val out = Corpus.mixPlan(docs, "lang", Map("en" -> 0.5, "es" -> 0.5))
      .select("lang", "n_docs", "rate")
      .as[(String, Long, Double)].collect().toMap2
    assert(out("es") === ((2L, 1.0)))         // binding stratum keeps all
    assert(out("en") === ((3L, 0.666667)))    // rounded at 6 dp
    // expected post-sample counts hit the target ratio: 3·⅔ ≈ 2 = es
    assert(math.abs(out("en")._1 * out("en")._2 - 2.0) < 1e-4)
    // excluded stratum → rate 0
    val excl = Corpus.mixPlan(docs, "lang", Map("es" -> 1.0))
      .select("lang", "rate").as[(String, Double)].collect().toMap
    assert(excl("en") === 0.0 && excl("es") === 1.0)
  }

  private implicit class ToMap2(rows: Array[(String, Long, Double)]) {
    def toMap2: Map[String, (Long, Double)] =
      rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("F7 packSequences assigns contiguous budget-sized sequences per stratum") {
    val out = Corpus.packSequences(docs, "lang", budgetTokens = 5)
      .select("doc_id", "lang", "ws_tokens", "seq_id", "seq_offset")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    // en stream ordered by doc_id: doc1 (4 tok) offset 0 → seq 0;
    // doc2 (3 tok) offset 4 → seq 0 spillover starts there; doc5 (3
    // tok) offset 7 → seq 1. es stream: doc3 (6 tok) offset 0, doc4
    // (4 tok) offset 6 → seq 1.
    assert(out === Array(
      (1L, "en", 4L, 0L, 0L),
      (2L, "en", 3L, 0L, 4L),
      (3L, "es", 6L, 0L, 0L),
      (4L, "es", 4L, 1L, 1L),
      (5L, "en", 3L, 1L, 2L)))
  }

  test("F7 packSequences matches the window reference and splits a mega-stratum " +
    "across tasks (no per-stratum window)") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.tokens
    // 90% of rows in one stratum — the pretraining-corpus skew shape
    // that pins a Window.partitionBy(stratum) plan onto one task
    val n = 4000
    val skew = (1 to n).map { i =>
      (i.toLong, Seq.fill(i % 5 + 1)("w").mkString(" "),
        if (i % 10 == 0) "es" else "en")
    }.toDF("doc_id", "text", "lang")
    val out = Corpus.packSequences(skew, "lang", budgetTokens = 7, partitions = 8)
    // plan shape: the running sum must NOT be a window at all
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "packSequences regressed to a per-stratum window")
    // the mega-stratum executes across >1 partition (multi-task)
    val enPids = out.filter(col("lang") === "en")
      .select(spark_partition_id()).distinct().count()
    assert(enPids > 1, s"mega-stratum landed on $enPids partition(s)")
    // bit-identical to the window spelling (what the oracle runs)
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = skew.select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("bigint").as("ws_tokens"))
      .withColumn("tok_offset", coalesce(sum(col("ws_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("ws_tokens"),
        expr("tok_offset div 7").as("seq_id"),
        (col("tok_offset") % 7).as("seq_offset"))
    assert(out.collect().toSet === expected.collect().toSet)
    // a narrow downstream merge must not disturb the seeded offsets:
    // coalesce(1) runs every parent partition's iterator inside ONE
    // task (the Verify sink shape), so any task-context-derived
    // partition id would silently read as 0 for all of them
    assert(out.coalesce(1).collect().toSet === expected.collect().toSet)
  }

  test("F7 packSequences packs a null stratum as its own group") {
    val withNull = docs.withColumn("lang",
      when(col("doc_id") <= 2, lit(null: String)).otherwise(col("lang")))
    val out = Corpus.packSequences(withNull, "lang", budgetTokens = 5)
      .select("doc_id", "lang", "seq_id", "seq_offset")
      .as[(Long, Option[String], Long, Long)].collect().sortBy(_._1)
    // null stream ordered by doc_id: doc1 (4 tok) offset 0 → seq 0;
    // doc2 (3 tok) offset 4 → seq 0 at offset 4 (spillover)
    assert(out.filter(_._2.isEmpty) === Array(
      (1L, None, 0L, 0L), (2L, None, 0L, 4L)))
  }

  test("F8 topTokens ranks by count with deterministic token tie-break") {
    val out = Corpus.topTokens(docs, "lang", k = 2)
      .select("lang", "token", "cnt", "rnk")
      .as[(String, String, Long, Long)].collect().toSet
    // en counts: beta 5 (1+3+1), alpha 3, gamma 1, delta 1
    // es counts: uno 5 (1+4), then cinco/cuatro/dos/seis/tres all 1 —
    // alphabetical tie-break picks cinco
    assert(out === Set(
      ("en", "beta", 5L, 1L), ("en", "alpha", 3L, 2L),
      ("es", "uno", 5L, 1L), ("es", "cinco", 1L, 2L)))
  }

  test("F8 topTokens plan keeps partial aggregation below the exchange") {
    val plan = Corpus.topTokens(docs, "lang", 10).queryExecution.executedPlan.toString
    // two HashAggregates around the shuffle = map-side combine of the
    // exploded token stream before the exchange
    assert("(?s)HashAggregate.*Exchange.*HashAggregate".r.findFirstIn(plan).isDefined)
  }

  test("F7b packStats aggregates the assignment; fill rate counts start-sequence capacity") {
    val out = Corpus.packStats(docs, "lang", budgetTokens = 7)
      .select("lang", "n_docs", "n_seqs", "n_tokens", "fill_rate")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    // en stream (doc_id order): 4+3+3 tokens → offsets 0/4/7 → seqs 0/0/1
    // es stream: 6+4 → offsets 0/6 → both start in seq 0 (the straddle
    // convention: a doc belongs to the sequence it STARTS in, so fill
    // can exceed 1 when the last doc spills past the boundary)
    assert(out === Set(
      ("en", 3L, 2L, 10L, math.rint(10.0 / 14 * 1e6) / 1e6),
      ("es", 2L, 1L, 10L, math.rint(10.0 / 7 * 1e6) / 1e6)))
  }

  test("integrity counts dangling refs, dup ids, and degenerate payloads exactly") {
    val d = Seq(
      (1L, "alpha beta", "en"), (2L, "gamma delta", "en"),
      (2L, "gamma delta", "en"),          // dup doc_id
      (3L, "", "en"),                     // empty text
      (4L, null.asInstanceOf[String], "en"), // null text
      (9L, "orphan doc", "en")            // no vector
    ).toDF("doc_id", "text", "lang")
    val e = Seq(
      (1L, Array(1.0f)), (2L, Array(2.0f)),
      (2L, Array(2.5f)),                  // dup vec_id
      (3L, null.asInstanceOf[Array[Float]]), // null vector
      (4L, Array(4.0f)),
      (77L, Array(7.0f))                  // no doc
    ).toDF("vec_id", "embedding")
    val out = Corpus.integrity(d, e).collect().head
    val byName = out.schema.fieldNames.zip(out.toSeq).toMap
    assert(byName === Map(
      "n_docs" -> 6L, "dup_doc_ids" -> 1L, "empty_text_docs" -> 2L,
      "n_vectors" -> 6L, "dup_vec_ids" -> 1L, "null_vectors" -> 1L,
      "docs_without_vector" -> 1L, "vectors_without_doc" -> 1L))
  }

  test("F25 tfidfTerms: idf re-ranks what raw counts cannot, integer score path") {
    // N=5; df: beta 3, alpha 2, uno 2, the rest 1 each
    // idf4 = round((ln(6/(df+1)) + 1)·1e4): df1→20986, df2→16931, df3→14055
    val out = Corpus.tfidfTerms(docs, "lang", k = 3)
      .select("lang", "token", "tf", "df", "score", "rnk")
      .as[(String, String, Long, Long, Double, Long)].collect().toSet
    assert(out === Set(
      ("en", "beta", 5L, 3L, 5 * 14055 / 10000.0, 1L),
      ("en", "alpha", 3L, 2L, 3 * 16931 / 10000.0, 2L),
      // gamma/delta tie at 20986 — token asc picks delta
      ("en", "delta", 1L, 1L, 20986 / 10000.0, 3L),
      ("es", "uno", 5L, 2L, 5 * 16931 / 10000.0, 1L),
      ("es", "cinco", 1L, 1L, 20986 / 10000.0, 2L),
      ("es", "cuatro", 1L, 1L, 20986 / 10000.0, 3L)))
    // the idf CONTRAST vs F8: alpha (df 2) outscores-per-occurrence
    // beta (df 3) — 16931 > 14055 — while raw counts can only see tf
    val perOcc = out.map(r => (r._2, r._5 / r._3)).toMap
    assert(perOcc("alpha") > perOcc("beta"))
  }

  test("F12 splitAssign covers every doc, is deterministic, and tracks weights") {
    val n = 2000
    val many = (1L to n).map(i => (i, s"doc $i", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val splits = Seq(("train", 0.9), ("val", 0.05), ("test", 0.05))
    val out = Corpus.splitAssign(many, splits)
    val byName = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byName.values.sum === n) // total assignment, no drops
    assert(byName.keySet === Set("train", "val", "test"))
    // md5 coin ≈ uniform: 2000 draws at 0.9 land within a loose band
    assert(byName("train") > (n * 0.85).toLong && byName("train") < (n * 0.95).toLong)
    // pure function of (doc_id, salt): identical on a second run...
    val again = Corpus.splitAssign(many, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(again === out.select("doc_id", "split").as[(Long, String)].collect().toSet)
    // ...and an incremental batch agrees with the full-corpus draw
    val batch = Corpus.splitAssign(many.filter(col("doc_id") <= 100), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(batch.subsetOf(again))
    // a different salt is a fresh draw (decorrelated resplit)
    val resalted = Corpus.splitAssign(many, splits, salt = "v2")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(resalted !== again)
  }

  test("F6/F12 null doc_ids are sampled and split, not silently dropped or pinned") {
    val withNull = Seq((Some(1L), "a", "en"), (None: Option[Long], "b", "en"))
      .toDF("doc_id", "text", "lang")
    // rate 1.0 keeps EVERYTHING, including the null-id row (a null
    // coin would silently drop it)
    assert(Corpus.sampleStratified(withNull, "lang", Map.empty, 1.0).count() === 2)
    // the null-id row gets a real (salted) coin, not the last split
    // unconditionally: across salts it must land in 'a' at least once
    // (md5(':s') varies with s; pinned-to-last would always say 'b')
    val lands = (1 to 8).map { i =>
      Corpus.splitAssign(withNull.filter(col("doc_id").isNull),
          Seq(("a", 0.5), ("b", 0.5)), salt = s"s$i")
        .select("split").as[String].head()
    }.toSet
    assert(lands.contains("a"), s"null-id rows pinned to $lands across salts")
  }

  test("F6b mixPlan raises in-plan when a target stratum is absent from the corpus") {
    // the check is deferred into the plan (mixPlan stays lazy, one
    // corpus scan): building the frame succeeds, materializing raises
    val plan = Corpus.mixPlan(docs, "lang", Map("en" -> 0.4, "zz" -> 0.6))
    val e = intercept[Exception] { plan.collect() }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("zz"), s"missing stratum not named: ${messages(e)}")
    assert(messages(e).contains("unsatisfiable"))
  }

  test("F13 quantileLabel is exact and collision-free") {
    assert(Corpus.quantileLabel(0.25) === "p25")
    assert(Corpus.quantileLabel(0.5) === "p50")
    assert(Corpus.quantileLabel(0.95) === "p95")
    assert(Corpus.quantileLabel(0.025) === "p2_5")
    assert(Corpus.quantileLabel(0.005) === "p0_5")
    assert(Corpus.quantileLabel(1.0) === "p100")
    // rounded-percent labels collided these two
    assert(Corpus.quantileLabel(0.025) !== Corpus.quantileLabel(0.03))
    assertThrows[IllegalArgumentException](
      Corpus.tokenQuantiles(docs, "lang", Seq(0.25, 0.25)))
  }

  test("F12 splitAssign is a zero-shuffle scan projection") {
    val plan = Corpus.splitAssign(docs, Seq(("a", 0.5), ("b", 0.5)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split plan shuffles:\n$plan")
  }

  test("F14 prepPipeline: quality gate → exact dedup → near-dup survivors → packing compose") {
    val good1 = "the quick brown fox jumps over the lazy dog and then " +
      "the dog sleeps" // 14 tokens, stopword-rich
    val near1 = "the quick brown fox jumps over the lazy dog and then " +
      "the dog barks" // only the final tri-gram differs — see premise below
    val good2 = "entirely different words appear in this other document " +
      "about the weather today with more detail" // distinct doc
    val corpus = Seq(
      (1L, good1, "en"),
      (2L, good1, "en"),          // exact dup of 1 → D1 drops (keep 1)
      (3L, near1, "en"),          // near-dup of 1 → D3b/D6 drop (keep 1)
      (4L, good2, "en"),          // kept
      (5L, "", "en"),             // empty → quality 0.0 → dropped
      (6L, null, "en"),           // null text → quality 0.0 → dropped
      (7L, "4 8 15 16 23 42 108 1 2 3", "en") // digit junk → below gate
    ).toDF("doc_id", "text", "lang")

    // the gate threshold separates the planted junk from the real docs
    // (assert the premise, not just the outcome)
    import graft.operators.TextAnalysis
    val scores = TextAnalysis.qualityScore(corpus)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val minQ = 0.3
    assert(Seq(1L, 2L, 3L, 4L).forall(scores(_) >= minQ))
    assert(Seq(5L, 6L, 7L).forall(scores(_) < minQ))

    // near-dup premise: 1 vs 3 share all but the final tri-gram
    // (11 shared of 12 each → Jaccard 11/13 ≈ 0.846 ≥ tau)
    val out = Corpus.prepPipeline(corpus, minQuality = minQ,
        strataCol = "lang", budgetTokens = 16, tau = 0.5)
      .select("doc_id", "lang", "ws_tokens", "seq_id", "seq_offset")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)

    // survivors: 1 (canonical of {1,2,3}) and 4; packed in id order
    // within the en stratum at budget 16: doc 1 (14 tokens) fills
    // [0,14) of seq 0; doc 4 (15 tokens) starts at offset 14 → seq 0
    assert(out.map(_._1).toSeq === Seq(1L, 4L))
    assert(out(0) === ((1L, "en", 14L, 0L, 0L)))
    assert(out(1) === ((4L, "en", 15L, 0L, 14L)))
  }

  test("F17 globalShuffle: bit-identical to the window spelling, dense positions, round-robin shards") {
    import org.apache.spark.sql.expressions.Window
    val corpus = Tables.documents(spark, sfDir).filter(col("doc_id") < 300)
    // partitions=5 forces real multi-partition offsets (the default
    // test parallelism could hide a wrong exclusive scan in 1 part)
    val out = Corpus.globalShuffle(corpus, nShards = 4, partitions = 5)
      .orderBy("pos").collect().toSeq.map(_.toSeq)
    val win = corpus.select(col("doc_id"),
        (row_number().over(Window.orderBy(
          md5(col("doc_id").cast("string")), col("doc_id"))) - 1)
          .cast("long").as("pos"))
      .withColumn("shard", col("pos") % 4)
      .orderBy("pos").collect().toSeq.map(_.toSeq)
    assert(out === win)
    assert(out.map(_(1)) === (0L until out.size.toLong).toSeq)
    // deterministic: a re-run reproduces the identical assignment
    val again = Corpus.globalShuffle(corpus, nShards = 4, partitions = 5)
      .orderBy("pos").collect().toSeq.map(_.toSeq)
    assert(again === out)
  }

  test("F31 curriculum: window-spelling parity, stages partition the quality bands easy-first") {
    import org.apache.spark.sql.expressions.Window
    val corpus = Tables.documents(spark, sfDir).filter(col("doc_id") < 300)
    // multi-partition offsets for the same reason as the F17 spec
    val out = Corpus.curriculum(corpus, nStages = 4, partitions = 5)
      .orderBy("pos").collect().toSeq.map(_.toSeq)
    val staged = graft.operators.TextAnalysis.qualityScore(corpus)
      .select(col("doc_id"),
        (lit(3L) - least(lit(3L),
          expr("(CAST(round(score * 1000000.0) AS BIGINT) * 4) div 1000000")))
          .as("stage"))
    val win = staged.select(col("doc_id"), col("stage"),
        (row_number().over(Window.orderBy(col("stage"),
          md5(col("doc_id").cast("string")), col("doc_id"))) - 1)
          .cast("long").as("pos"))
      .orderBy("pos").collect().toSeq.map(_.toSeq)
    assert(out === win)
    // dense 0-based positions; stage is monotone along the order
    assert(out.map(_(2)) === (0L until out.size.toLong).toSeq)
    assert(out.map(_(1).asInstanceOf[Long]) ===
      out.map(_(1).asInstanceOf[Long]).sorted)
    // the corpus actually spans > 1 band (a one-band corpus would
    // reduce this spec to F17 and prove nothing about staging)
    assert(out.map(_(1)).distinct.size > 1)
    // hand-pinned band edges: score 1.0 → stage 0, empty doc → last
    import spark.implicits._
    val tiny = Seq(
      (1L, ("the a of and to in is " * 20).trim), // high quality
      (2L, "")                                    // score 0 → stage 3
    ).toDF("doc_id", "text")
    val t = Corpus.curriculum(tiny, nStages = 4)
      .select("doc_id", "stage").as[(Long, Long)].collect().toMap
    assert(t(2L) === 3L)
    assert(t(1L) < t(2L))
  }

  test("F33 centralitySample: exact coin law, weightless docs dropped, endpoints pinned") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val pr = (Seq((1L, 1000000L), (2L, 0L)) ++ (3L to 150L).map(i => (i, 150000L)))
      .toDF("vec_id", "pr6")
    val out = Corpus.centralitySample(docs, pr)
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(1L))      // p = 1.0: kept for every coin
    assert(!out.contains(2L))     // p = 0: never kept
    assert(out.forall(_ <= 150L)) // no weight → dropped, not defaulted
    // the exact coin law, driver-recomputed: coin32·1e6 < pr6·2^32
    def coin32(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:cent".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8), 16)
    val want = (1L to 150L).filter { i =>
      val pr6 = if (i == 1L) 1000000L else if (i == 2L) 0L else 150000L
      BigInt(coin32(i)) * 1000000 < BigInt(pr6) * 4294967296L
    }.toSet
    assert(out === want)
    // the 0.15 band keeps ~15% (the coin is uniform)
    val frac = out.count(_ >= 3L).toDouble / 148
    assert(frac > 0.05 && frac < 0.30, f"band keep rate $frac%.3f")
    // surviving rows carry the weight back out
    val row = Corpus.centralitySample(docs, pr)
      .filter(col("doc_id") === 1L).select("pagerank").as[Double].head()
    assert(row === 1.0)
  }

  test("F18 chunkDocs: overlapping windows tile the token stream, short docs get one chunk") {
    val input = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "only two"),                               // < chunk size
      (3L, "")                                        // no tokens → no chunks
    ).toDF("doc_id", "text")
    val out = Corpus.chunkDocs(input, chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_tok", "n_tokens", "chunk_text")
      .collect().toSeq.map(_.toSeq)
    // stride 3: starts 0, 3, 6 — chunk k shares its last `overlap`
    // token with chunk k+1's first, and the tail chunk runs to w10
    assert(out === Seq(
      Seq(1L, 0L, 0L, 4L, "w1 w2 w3 w4"),
      Seq(1L, 1L, 3L, 4L, "w4 w5 w6 w7"),
      Seq(1L, 2L, 6L, 4L, "w7 w8 w9 w10"),
      Seq(2L, 0L, 0L, 2L, "only two")))
    // every token position is covered by some chunk
    val covered = out.filter(_(0) == 1L).flatMap(r =>
      r(4).asInstanceOf[String].split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"w$i").toSet)
  }

  test("F13 tokenQuantiles computes exact interpolated percentiles per stratum") {
    // en token counts by doc_id order: 4, 3, 3 → sorted [3, 3, 4]
    //   p50 = 3.0; p75 at rank 0.75·2 = 1.5 → 3 + 0.5·(4−3) = 3.5
    // es token counts: 6, 4 → sorted [4, 6]: p50 = 5.0 (midpoint),
    //   p75 at rank 0.75·1 = 0.75 → 4 + 0.75·(6−4) = 5.5
    val out = Corpus.tokenQuantiles(docs, "lang", Seq(0.5, 0.75))
      .select("lang", "n_docs", "p50", "p75")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("en") === ((3L, 3.0, 3.5)))
    assert(out("es") === ((2L, 5.0, 5.5)))
  }
}
