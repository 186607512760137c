package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "The quick brown fox jumps over the lazy dog!"),  // exact after normalize, not byte-exact
    (4L, "completely different content about spark engines and data"),
    (5L, "the quick brown fox jumps over the lazy dog")    // byte-exact dup of 1
  ).toDF("doc_id", "text")

  test("D1 exact groups byte-identical texts, keeps min doc_id") {
    val out = Dedup.exact(docs)
    assert(out.count() === 4) // 1&5 merge; 3 differs byte-wise
    val merged = out.filter(col("n_docs") === 2).select("keep_id").as[Long].head()
    assert(merged === 1L)
  }

  test("D3 ngramJaccard finds the near-dup pair with correct set math") {
    val out = Dedup.ngramJaccard(docs, 0.5)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard")
      .collect().toSeq.map(_.toSeq)
    // docs 1,3,5 normalize to identical 7 grams (9 tokens); doc 2 shares 6 of 8 distinct
    val pairs = out.map(r => (r(0), r(1))).toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((1L, 5L)) && pairs.contains((3L, 5L)))
    val p13 = out.find(r => r(0) == 1L && r(1) == 3L).get
    assert(p13(2) === 7L && p13(3) === 7L && p13(4) === 7L && p13(5) === 1.0)
  }

  test("D2 minhashLsh candidates ⊇ true high-jaccard pairs (identical docs always collide)") {
    val cands = Dedup.minhashLsh(docs).as[(Long, Long)].collect().toSet
    // identical shingle sets → identical signatures → all bands collide
    assert(cands.contains((1L, 3L)) && cands.contains((1L, 5L)) && cands.contains((3L, 5L)))
    // the unrelated doc 4 shares no grams: its minhash slots differ from
    // doc 1's with overwhelming probability across all 8 bands
    assert(!cands.contains((1L, 4L)))
  }

  test("D9d fuzzy contamination: cross-set Jaccard with exact set math; within-set pairs excluded") {
    // doc 10 is a light rewrite of bench 100 (all but the final gram
    // shared); docs 11/12 are identical to EACH OTHER (corpus-corpus
    // near-dup — must NOT appear); bench 100/101 share grams with
    // each other (bench-bench — must not appear either)
    val df = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and then sleeps"),
      (11L, "completely different words appear in this other document"),
      (12L, "completely different words appear in this other document"),
      (100L, "the quick brown fox jumps over the lazy dog and then barks"),
      (101L, "the quick brown fox jumps over the lazy dog and then barks")
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationFuzzy(df, col("doc_id") >= 100L, 0.5)
      .select("doc_id", "bench_id", "inter", "n_doc", "n_bench", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._2)
    // 12 tokens → 10 grams, 9 shared → jaccard 9/11
    assert(out === Seq(
      (10L, 100L, 9L, 10L, 10L, 9.0 / 11),
      (10L, 101L, 9L, 10L, 10L, 9.0 / 11)))
    // df cap drops the shared grams (each has df 3 across 10/100/101)
    // → denominators recompute over kept grams and the pairs vanish
    assert(Dedup.contaminationFuzzy(df, col("doc_id") >= 100L, 0.5,
      maxDf = 2L).count() === 0L)
  }

  test("D6-for-embeddings: survivors drop each pair's higher id; zero-norm rows survive") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.1f)),
      (3L, Array(0.9f, 0.0f)), (4L, Array(0.0f, 1.0f)),
      (5L, Array(0.0f, 0.0f)) // zero-norm: never pairs, must survive
    ).toDF("vec_id", "embedding")
    val pairs = Seq((1L, 2L, 0.99), (1L, 3L, 1.0))
      .toDF("vec_a", "vec_b", "cos_sim")
    assert(Dedup.embeddingSurvivors(emb, pairs)
      .as[Long].collect().toSet === Set(1L, 4L, 5L))
    // composed with the exact pair finder on the verify corpus:
    // survivors + dropped partition the id space
    val real = Tables.embeddings(spark, sfDir)
    val realPairs = Dedup.embeddingCosine(real, 0.45)
    val surv = Dedup.embeddingSurvivors(real, realPairs).count()
    val dropped = realPairs.select("vec_b").distinct().count()
    assert(surv + dropped === real.count())
  }

  test("D4 md5Hash64 ≡ signed 64-bit value of the first 16 md5 hex chars (oracle bit contract)") {
    // the DuckDB mirror re-derives per-token bits from substr(md5,1,16);
    // this pins the Spark column to the same signed-long interpretation,
    // covering both sign regimes (first nibble < 8 and ≥ 8)
    graft.functions.VecExprs.register(spark)
    val words = Seq("hello", "world", "a", "zz9", "the", "epsilon")
    def expected(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString
      new java.math.BigInteger(hex, 16).longValue() // wraps to signed
    }
    val got = words.toDF("t")
      .select(col("t"), Dedup.md5Hash64(col("t")).as("h"))
      .as[(String, Long)].collect().toMap
    words.foreach(w => assert(got(w) === expected(w), w))
    assert(got.values.exists(_ < 0L) && got.values.exists(_ > 0L))
  }

  test("D4 simhashPairs: identical token streams → hamming 0; reflexive pairs excluded") {
    val out = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").collect().toSeq.map(_.toSeq)
    val p = out.map(r => ((r(0), r(1)), r(2))).toMap
    assert(p(((1L, 3L))) === 0L && p(((1L, 5L))) === 0L)
    assert(out.forall(r => r(0).asInstanceOf[Long] < r(1).asInstanceOf[Long]))
  }

  test("D4 token-less docs never pair: no hamming-0 quadratic on simhash 0") {
    // punctuation/CJK-only docs tokenize to nothing under this
    // tokenizer — without the guard they would all share simhash 0
    // and report each other as exact duplicates
    val planted = docs.unionByName(Seq(
      (100L, "!!! ???"), (101L, "——— …"),
      (102L, "¿¡ §§")).toDF("doc_id", "text"))
    val out = Dedup.simhashPairs(planted, maxHamming = 3)
      .filter(col("doc_a") >= 100L || col("doc_b") >= 100L)
    assert(out.count() === 0L)
  }

  test("D4 banding derived from maxHamming: candidates ⊇ exhaustive pairs at any bound") {
    import graft.functions.TextFunctions.tokens
    graft.functions.VecExprs.register(spark)
    // ground truth: exhaustive all-pairs hamming over the spec corpus
    val sims = docs
      .withColumn("hs", transform(tokens(col("text")), t => Dedup.md5Hash64(t)))
      .withColumn("simhash", call_function("graft_simhash64", col("hs")))
      .select("doc_id", "simhash").as[(Long, Long)].collect()
    for (maxH <- Seq(0, 3, 5, 9)) {
      val truth = (for {
        (a, sa) <- sims; (b, sb) <- sims if a < b
        if java.lang.Long.bitCount(sa ^ sb) <= maxH
      } yield (a, b)).toSet
      val got = Dedup.simhashPairs(docs, maxH)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got === truth, s"maxHamming=$maxH") // pigeonhole: banding loses nothing
    }
  }

  test("D4 hot band-bucket cap: pair count collapses O(n²)→O(n), identity at ∞") {
    // near-constant-simhash corpus: 80 identical docs share one
    // simhash, so every (band, band_val) bucket holds all 80 members —
    // the pigeonhole trap (band-value space is fixed at 2^16) that
    // makes EVERY bucket hot past ~10⁷ real docs
    val n = 80
    val same = (1L to n.toLong).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.simhashPairs(same, maxHamming = 3, maxBucket = Long.MaxValue)
    assert(uncapped.count() === n.toLong * (n - 1) / 2) // full n² enumeration
    // capped: each bucket star-collapses around the min member → n−1
    // spokes, all exact-hamming-verified against the hub
    val capped = Dedup.simhashPairs(same, maxHamming = 3, maxBucket = 16L)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    assert(capped.length === n - 1)
    assert(capped.forall(p => p._1 == 1L && p._3 == 0L))
    // connectivity survives for D8: every member reachable via the hub
    assert(capped.map(_._2).toSet === (2L to n.toLong).toSet)
    // on a corpus with no hot buckets the cap is the identity
    val base = Dedup.simhashPairs(docs, 3, Long.MaxValue)
      .as[(Long, Long, Long)].collect().toSet
    assert(Dedup.simhashPairs(docs, 3, 16L)
      .as[(Long, Long, Long)].collect().toSet === base)
  }

  test("auto maxBucket: ≡ explicit 1024 at verify density; tracks density on dense corpora") {
    // verify corpus: mean bucket occupancy ~1 → auto resolves to the
    // 1024 floor → results identical to the old fixed default
    val real = Tables.documents(spark, sfDir)
    assert(Dedup.simhashPairs(real).as[(Long, Long, Long)].collect().toSet
      === Dedup.simhashPairs(real, 3, 1024L).as[(Long, Long, Long)].collect().toSet)
    assert(Dedup.minhashLsh(real).as[(Long, Long)].collect().toSet
      === Dedup.minhashLsh(real, maxBucket = 1024L).as[(Long, Long)].collect().toSet)
    // dense corpus (80 identical docs → occupancy 80): auto lifts the
    // cap to 64× measured occupancy, so the legit-dense buckets keep
    // their exact self-join (≡ uncapped) where a fixed cap of 16
    // star-collapses them — "hot" is now relative to measured density
    val n = 80
    val same = (1L to n.toLong).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    assert(Dedup.simhashPairs(same).count() === n.toLong * (n - 1) / 2)
    assert(Dedup.simhashPairs(same, 3, 16L).count() === (n - 1).toLong)
  }

  test("D3 hot-gram df cap: candidate count collapses O(n²)→O(n), identity at ∞") {
    // 60 docs all sharing one boilerplate sentence (its grams have
    // df = 60 — the scale-killer key), in 30 identical-tail pairs
    // (tail grams have df = 2 — the true near-dup signal)
    val boiler = "shared boilerplate header sentence always present in every document"
    val hot = (0L until 60L)
      .map(i => (i, s"$boiler tail${i / 2} alpha${i / 2} beta${i / 2} gamma${i / 2}"))
      .toDF("doc_id", "text")
    // uncapped at tau=0: every pair shares a boilerplate gram → full n²
    assert(Dedup.ngramJaccard(hot, 0.0).count() === 60L * 59 / 2)
    // capped: boilerplate grams (df=60 > 10) leave the join; only the
    // 30 tail-sharing pairs remain — O(n) candidates
    val capped = Dedup.ngramJaccard(hot, 0.0, maxDf = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped === (0L until 30L).map(i => (2 * i, 2 * i + 1)).toSet)
    // per-key bound: after the cap no surviving gram exceeds df=10, so
    // a single join key can fan out at most 10²/2 pairs by construction
    val dfs = Dedup.gramDocFrequencies(hot)
    assert(dfs.agg(max(col("df"))).as[Long].head() === 60L)
    assert(dfs.filter(col("df") > 10).count() > 0) // the cap had work to do
    // capped partners are textually identical → jaccard exactly 1.0
    assert(Dedup.ngramJaccard(hot, 0.0, maxDf = 10)
      .select("jaccard").as[Double].collect().forall(_ === 1.0))
    // a cap larger than any df is the identity (same rows as default)
    val a = Dedup.ngramJaccard(docs, 0.2).orderBy("doc_a", "doc_b")
      .collect().toSeq.map(_.toSeq)
    val b = Dedup.ngramJaccard(docs, 0.2, maxDf = 1000000L)
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    assert(a === b)
    // the frozen-hot-list flavor (streamingDedup's within-batch path)
    // is pairwise identical to the df-threshold cap when the list IS
    // the over-threshold grams — same subspace, same denominators
    val frozenHot = Dedup.gramDocFrequencies(hot)
      .filter(col("df") > 10).select("gh")
    val viaList = Dedup.ngramJaccardWithHotList(hot, 0.0, frozenHot)
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    val viaCap = Dedup.ngramJaccard(hot, 0.0, maxDf = 10)
      .orderBy("doc_a", "doc_b").collect().toSeq.map(_.toSeq)
    assert(viaList === viaCap)
  }

  test("D2 bucket-size cap collapses mega-buckets to star candidates, keeps small ones") {
    val mega = (1L to 40L).map(i =>
      (i, "identical boilerplate text repeated wholesale across the corpus"))
    val near = Seq(
      (100L, "a distinct sentence about spark dataframes and shuffle plans"),
      (101L, "a distinct sentence about spark dataframes and shuffle plans"))
    val corpus = (mega ++ near).toDF("doc_id", "text")
    // default cap (1024) is the identity here: 40-doc bucket → C(40,2)
    assert(Dedup.minhashLsh(corpus).count() === 40L * 39 / 2 + 1)
    // cap 10: the 40-member bucket (same in every band — no other band
    // would rediscover it) collapses to a STAR around its min member:
    // O(size) candidates, connectivity preserved for D8; the 2-member
    // bucket of the true near-dup pair is untouched
    val capped = Dedup.minhashLsh(corpus, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(capped ===
      ((2L to 40L).map(i => (1L, i)).toSet + ((100L, 101L))))
  }

  test("D9 df cap drops boilerplate grams from both sides of the join") {
    // all grams shared with bench doc 3 have df ≥ 3 → cap 2 empties the
    // result; cap 10 (above the corpus max df) equals the uncapped run
    assert(Dedup.contamination(docs, col("doc_id") === 3, 1, maxDf = 2).count() === 0)
    val a = Dedup.contamination(docs, col("doc_id") === 3, 5)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val b = Dedup.contamination(docs, col("doc_id") === 3, 5, maxDf = 10)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(a === b)
  }

  test("D5 embeddingCosine flags only pairs above the threshold") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), "x"),
      (2L, Array(0.9f, 0.1f), "x"),   // cos ≈ 0.9939
      (3L, Array(0.0f, 1.0f), "x")    // orthogonal to 1
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingCosine(emb, 0.95).select("vec_a", "vec_b")
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("survivors removes every doc named as the larger id of a pair") {
    val pairs = Seq((1L, 3L), (1L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.survivors(docs, pairs).select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 2L, 4L))
  }

  test("D8 clusters computes transitive components, labels singletons, sizes") {
    // chain 1-2, 2-3 plus isolated pair 5-6: transitivity must merge
    // {1,2,3} even though (1,3) never pairs directly
    val ds = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusters(ds, pairs)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toMap2
    assert(out === Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      4L -> (4L, 1L),                       // singleton clusters to itself
      5L -> (5L, 2L), 6L -> (5L, 2L)))
  }

  test("D16 dedupProfile: cluster-size histogram with singleton mass, totals conserve") {
    // {1,2,3} one 3-cluster, {5,6} one 2-cluster, {4} a singleton
    val ds = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupProfile(ds, pairs)
      .select("cluster_size", "n_clusters", "n_docs")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((3L, 1L, 3L), (2L, 1L, 2L), (1L, 1L, 1L)))
    // Σ n_docs = corpus; dedup ratio falls out: 1 − 3/6
    assert(out.toSeq.map(_._3).sum === 6L)
    assert(out.toSeq.map(_._2).sum === 3L)
  }

  test("D8 clusters merges a long chain past several propagation rounds") {
    // a path graph 1-2-…-9: min label needs 8 hops to reach the end
    val n = 9L
    val ds = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.clusters(ds, pairs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(out === (1L to n).map(i => (i, 1L)).toSet)
    // and the guard trips when maxIter can't cover the diameter
    assertThrows[IllegalStateException](Dedup.clusters(ds, pairs, maxIter = 2).count())
  }

  test("D8 salted min-label round: identical labeling, hub spread over salt sub-keys") {
    // star graph: node 1 is the hub of a 30-leaf component (the shape
    // whose adjacency funnels through one reducer unsalted)
    val n = 30L
    val ds = (1L to n + 1).toDF("doc_id")
    val pairs = (2L to n + 1).map(i => (1L, i)).toDF("doc_a", "doc_b")
    val plain = Dedup.clusters(ds, pairs)
      .select("doc_id", "cluster_id", "cluster_size")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val salted = Dedup.clusters(ds, pairs, saltBuckets = 4)
      .select("doc_id", "cluster_id", "cluster_size")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(salted === plain)
    // plan shape: phase 1 exchanges on (src, _salt) — the hot key is
    // split across salt sub-keys before the final combine on src
    import graft.operators.Skew
    val adjacency = Seq((1L, 2L, 2L), (1L, 3L, 3L)).toDF("src", "dst", "cluster_id")
    val saltedPlan = Skew.saltedMin(adjacency, Seq("src"), "cluster_id",
      saltBy = "dst", salts = 4, out = "nbr_min")
      .queryExecution.executedPlan.toString
    val keys = "Exchange hashpartitioning\\(([a-zA-Z_0-9#]+), ([a-zA-Z_0-9#]+)"
      .r.findAllMatchIn(saltedPlan)
      .map(m => (m.group(1).takeWhile(_ != '#'), m.group(2).takeWhile(_ != '#'))).toList
    // Catalyst renames the salt alias to _groupingexpression in the
    // physical plan; either spelling proves the two-key phase-1 split
    assert(keys.exists(t => t._1 == "src" &&
        (t._2 == "_salt" || t._2 == "_groupingexpression")),
      s"phase-1 exchange should partition on (src, salt):\n$saltedPlan")
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("D9 contamination flags corpus docs sharing ≥ minShared grams with a bench doc") {
    // doc 3 is the benchmark; docs 1 and 5 share all 7 of its grams,
    // doc 2 shares 6 (only the final gram carries the cat/dog suffix),
    // doc 4 shares none
    val out = Dedup.contamination(docs, col("doc_id") === 3, minShared = 7)
      .select("doc_id", "bench_id", "shared_grams")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 3L, 7L), (5L, 3L, 7L)))
    val loose = Dedup.contamination(docs, col("doc_id") === 3, minShared = 5)
      .select("doc_id", "shared_grams").as[(Long, Long)].collect().toSet
    assert(loose === Set((1L, 7L), (2L, 6L), (5L, 7L))) // doc 2 caught at 5
  }

  test("D9 bloom flavor: row-identical to the broadcast flavor; probe is in the plan") {
    for (minShared <- Seq(5, 7); maxDf <- Seq(Long.MaxValue, 10L)) {
      val plain = Dedup.contamination(docs, col("doc_id") === 3, minShared, maxDf)
        .orderBy("doc_id", "bench_id").collect().toSeq.map(_.toSeq)
      val bloom = Dedup.contaminationBloom(docs, col("doc_id") === 3, minShared, maxDf)
        .orderBy("doc_id", "bench_id").collect().toSeq.map(_.toSeq)
      assert(bloom === plain, s"minShared=$minShared maxDf=$maxDf")
    }
    // the pre-cut survives into the executed plan (probe before the join)
    val plan = Dedup.contaminationBloom(docs, col("doc_id") === 3, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), plan)
  }
}
