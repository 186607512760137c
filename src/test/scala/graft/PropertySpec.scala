package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Corpus, Dedup, Skew, Timeseries}
import graft.functions.TextFunctions

/** Property tests: operators vs naive in-memory reference
  * implementations on randomized inputs (fixed seeds via scalacheck's
  * deterministic default). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Seeded deterministic samples (scalatestplus bridge isn't in the
    * offline cache, so sampling replaces forAll; 5 cases per property
    * — Spark jobs are slow, so few-but-large beats many-small). */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (1 to 5).foreach { i =>
      f(g.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(sys.error("gen failed")))
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 5).foreach { i =>
      f(ga.apply(Gen.Parameters.default, Seed(42L + i)).getOrElse(sys.error("gen failed")),
        gb.apply(Gen.Parameters.default, Seed(1042L + i)).getOrElse(sys.error("gen failed")))
    }

  private val series = for {
    n <- Gen.choose(5, 40)
    keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    ts <- Gen.listOfN(n, Gen.choose(0L, 20L))
    vs <- Gen.listOfN(n, Gen.choose(-50, 50).map(_.toDouble))
  } yield keys.lazyZip(ts).lazyZip(vs).toList.zipWithIndex
    .map { case ((k, t, v), i) => (k, t, i.toLong, v) }

  test("A1 intervalDiff equals per-key sequential diff (random series)") {
    forAll(series) { rows =>
      val df = rows.toDF("k", "t", "id", "v")
      val got = Timeseries.intervalDiff(df, "k", "t", "id", "v")
        .select("k", "id", "delta").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val want = rows.groupBy(_._1).flatMap { case (_, g) =>
        val sorted = g.sortBy(r => (r._2, r._3))
        sorted.zip(sorted.drop(1)).map { case (p, c) => (c._1, c._3, c._4 - p._4) }
      }.toSet
      assert(got === want)
    }
  }

  test("A13 asofJoinLatest equals brute-force latest-at-or-before (random series)") {
    forAll(series, series) { (l, r) =>
      val left = l.toDF("k", "t", "id", "v").select("k", "t", "id")
      // make right unique per (k, t): max v wins, mirroring the query wiring
      val rightRows = r.groupBy(x => (x._1, x._2)).map { case ((k, t), g) =>
        (k, t, g.map(_._4).max) }.toList
      val right = rightRows.toDF("k", "rt", "rv")
      val got = Timeseries.asofJoinLatest(left, right, "k", "t", "rt", "rv")
        .select("k", "id", "asof_value").collect()
        .map(x => (x.getString(0), x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSet
      val want = l.map { case (k, t, id, _) =>
        val cand = rightRows.filter(rr => rr._1 == k && rr._2 <= t)
        (k, id, if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
      }.toSet
      assert(got === want)
    }
  }

  test("salted aggregation equals plain aggregation for any salt count") {
    forAll(series, Gen.choose(1, 32)) { (rows, salts) =>
      val df = rows.toDF("k", "t", "id", "v")
      val got = Skew.saltedSumCount(df, Seq("k"), "v", "id", salts)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).map { case (k, g) =>
        (k, g.map(_._4).sum, g.size.toLong) }.toSet
      assert(got === want)
    }
  }

  private val texts = Gen.listOfN(8, for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
  } yield ws.mkString(" "))

  test("graft_grams3h count equals naive distinct 3-gram count (random token streams)") {
    graft.functions.VecExprs.register(spark)
    forAll(texts) { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = df.select(col("doc_id"),
          size(call_function("graft_grams3h", TextFunctions.tokens(col("text")))).as("n"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      ts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
        val want = if (toks.size < 3) 0 else toks.sliding(3).map(_.mkString(" ")).toSet.size
        assert(got(i.toLong) === want, s"text '$t'")
      }
    }
  }

  private val graphs = for {
    nNodes <- Gen.choose(2, 30)
    nEdges <- Gen.choose(0, 40)
    edges <- Gen.listOfN(nEdges,
      Gen.zip(Gen.choose(0L, nNodes - 1L), Gen.choose(0L, nNodes - 1L)))
  } yield (nNodes.toLong, edges.filter(e => e._1 != e._2).map(e =>
    (math.min(e._1, e._2), math.max(e._1, e._2))).distinct)

  test("D8 clusters equals union-find components (random graphs)") {
    forAll(graphs) { case (n, edges) =>
      val docs = (0L until n).toDF("doc_id")
      val pairs = if (edges.isEmpty)
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
      else edges.toDF("doc_a", "doc_b")
      val got = Dedup.clusters(docs, pairs)
        .select("doc_id", "cluster_id", "cluster_size")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // reference: naive union-find with path compression
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val roots = (0 until n.toInt).map(find)
      val minOf = roots.distinct.map(r => r ->
        (0 until n.toInt).filter(i => roots(i) == r).min).toMap
      val sizeOf = roots.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = (0 until n.toInt).map(i =>
        (i.toLong, minOf(roots(i)).toLong, sizeOf(roots(i)))).toSet
      assert(got === want, s"n=$n edges=$edges")
    }
  }

  test("F7 packSequences conserves tokens and bounds offsets (random docs)") {
    forAll(texts, Gen.choose(1, 20)) { (ts, budget) =>
      val df = ts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, if (i % 2 == 0) "en" else "es") }.toDF("doc_id", "text", "lang")
      val out = graft.operators.Corpus.packSequences(df, "lang", budget)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(out.length === ts.size) // every doc packed exactly once
      out.foreach { case (_, _, _, seqId, off) =>
        assert(off >= 0 && off < budget && seqId >= 0)
      }
      // per stratum: doc at position p starts at the sum of its predecessors
      out.groupBy(_._2).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        var cum = 0L
        sorted.foreach { case (_, _, wsTokens, seqId, off) =>
          assert(seqId === cum / budget)
          assert(off === cum % budget)
          cum += wsTokens
        }
      }
    }
  }

  test("D9 contamination equals brute-force shared-distinct-gram counts (random docs)") {
    forAll(texts) { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.contamination(df, col("doc_id") % 3 === 0, minShared = 1)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      def grams(t: String): Set[String] = {
        val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.size < 3) Set.empty
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val want = (for {
        (tb, ib) <- ts.zipWithIndex if ib % 3 == 0
        (tc, ic) <- ts.zipWithIndex if ic % 3 != 0
        shared = (grams(tb) & grams(tc)).size if shared >= 1
      } yield ((ic.toLong, ib.toLong), shared.toLong)).toMap
      assert(got === want)
      // the Bloom flavor is exact by construction (pre-filter + exact
      // re-join) — same brute-force equality, any random corpus
      val gotBloom = Dedup.contaminationBloom(df, col("doc_id") % 3 === 0, minShared = 1)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      assert(gotBloom === want)
    }
  }

  test("D2 table flow equals in-memory minhashLsh for random corpora and caps") {
    // tiny vocab → heavy shingle sharing → real bucket collisions and,
    // at cap 1/3, real star collapses on random structure
    val corpusGen = for {
      n <- Gen.choose(5, 25)
      texts <- Gen.listOfN(n, Gen.choose(3, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
          .map(_.mkString(" "))))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(corpusGen, Gen.oneOf(1L, 3L, Long.MaxValue)) { (rows, cap) =>
      val docs = rows.toDF("doc_id", "text")
      val wh = java.nio.file.Files.createTempDirectory("graft_prop_mh").toString
      Dedup.writeMinhashTable(docs, "mh_p", s"$wh/mh_p", buckets = 4,
        maxBucket = cap)
      val a = Dedup.minhashFromTable(spark, "mh_p")
        .as[(Long, Long)].collect().toSet
      val b = Dedup.minhashLsh(docs, maxBucket = cap)
        .as[(Long, Long)].collect().toSet
      assert(a === b)
      spark.sql("DROP TABLE IF EXISTS mh_p")
      spark.sql("DROP TABLE IF EXISTS mh_p_hot")
    }
  }

  test("F17 globalShuffle equals in-memory md5 sort for random id sets") {
    forAll(Gen.listOfN(14, Gen.choose(0L, 500L)).map(_.distinct)) { ids =>
      val docs = ids.map(i => (i, s"text $i")).toDF("doc_id", "text")
      val got = Corpus.globalShuffle(docs, nShards = 3, partitions = 3)
        .select("doc_id", "pos", "shard")
        .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
      def hex(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val want = ids.sortBy(i => (hex(i.toString), i))
      assert(got.map(_._1) === want)
      assert(got.map(_._2) === (0L until ids.size.toLong))
      assert(got.forall { case (_, p, s) => s == p % 3 })
    }
  }

  test("E13 knnPagerank equals the reference recurrence on random graphs; mass never mints") {
    import graft.operators.Similarity
    val graphs = for {
      n <- Gen.choose(3, 25)
      nE <- Gen.choose(1, 60)
      es <- Gen.listOfN(nE,
        Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield (n.toLong, es.filter { case (a, b) => a != b }.distinct)
    forAll(graphs) { case (n, edges) =>
      if (edges.nonEmpty) {
        val emb = (0L until n).map(i => (i, Array(1.0f, 0.0f)))
          .toDF("vec_id", "embedding")
        val g = edges.toDF("q_id", "n_id")
        val got = Similarity.knnPagerank(emb, g, iters = 4)
          .select(col("vec_id"),
            round(col("pagerank") * 1e6).cast("long"))
          .as[(Long, Long)].collect().toMap
        // driver reference: same floor-division recurrence
        val deg = edges.groupBy(_._1).map { case (s, e) => s -> e.size.toLong }
        var r = (0L until n).map(_ -> 1000000L).toMap
        for (_ <- 1 to 4) {
          val acc = scala.collection.mutable
            .Map[Long, Long]().withDefaultValue(0L)
          edges.foreach { case (s, d) => acc(d) += r(s) / deg(s) }
          r = (0L until n).map(v => v -> (150000L + 85L * acc(v) / 100L)).toMap
        }
        assert(got === r)
        // dangling mass leaks, never mints: Σ pr6 ≤ n·1e6
        assert(got.values.sum <= n * 1000000L)
      }
    }
  }

  test("F31 curriculum positions are a bijection onto 0..n-1 for random corpora") {
    val corpora = for {
      n <- Gen.choose(2, 40)
      ids <- Gen.listOfN(n, Gen.choose(0L, 500L)).map(_.distinct)
      txts <- Gen.listOfN(n, Gen.oneOf("", "the a of and to in is",
        "xyzzy 12345 !!!", "alpha beta gamma delta common words here"))
    } yield ids.zip(txts)
    forAll(corpora) { rows =>
      val df = rows.toDF("doc_id", "text")
      val out = Corpus.curriculum(df, nStages = 3)
        .select("doc_id", "stage", "pos")
        .as[(Long, Long, Long)].collect()
      // one row per doc, positions dense 0..n-1, stages in range and
      // monotone along the position order
      assert(out.length === rows.length)
      assert(out.map(_._3).sorted.toSeq === (0L until rows.length.toLong))
      assert(out.forall { case (_, s, _) => s >= 0 && s <= 2 })
      val byPos = out.sortBy(_._3).map(_._2)
      assert(byPos.toSeq === byPos.sorted.toSeq)
    }
  }

  test("F33 centralitySample keep set is monotone in the weight (random corpora)") {
    val gens = for {
      n <- Gen.choose(2, 40)
      prs <- Gen.listOfN(n, Gen.choose(0L, 2000000L))
    } yield prs.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    forAll(gens) { rows =>
      val docs = rows.map { case (i, _) => (i, s"t$i") }.toDF("doc_id", "text")
      val keep = Corpus.centralitySample(docs,
          rows.toDF("vec_id", "pr6"))
        .select("doc_id").as[Long].collect().toSet
      // doubling every weight only ever ADDS docs (the coin is fixed
      // per doc — keep is monotone in pr6)
      val keep2 = Corpus.centralitySample(docs,
          rows.map { case (i, p) => (i, math.min(p * 2, 4000000L)) }
            .toDF("vec_id", "pr6"))
        .select("doc_id").as[Long].collect().toSet
      assert(keep.subsetOf(keep2))
      // pr6 ≥ 2^32/1e6 ulp short of certainty: weight ≥ 1e6 ⇒ kept
      rows.foreach { case (i, p) =>
        if (p >= 1000000L) assert(keep.contains(i), s"doc $i p=$p") }
    }
  }

  test("F21 mergePass equals a reference greedy scan on random symbol runs") {
    import org.apache.spark.unsafe.types.UTF8String
    def ref(in: List[String], l: String, r: String): List[String] = in match {
      case a :: b :: rest if a == l && b == r => (l + r) :: ref(rest, l, r)
      case a :: rest => a :: ref(rest, l, r)
      case Nil => Nil
    }
    val syms = Gen.listOfN(18, Gen.oneOf("a", "b", "ab", "</w>"))
    val pair = Gen.oneOf(("a", "b"), ("a", "a"), ("b", "</w>"), ("ab", "ab"))
    forAll(syms, pair) { (s, lr) =>
      val (l, r) = lr
      val got = graft.functions.BpeExprs.mergePass(
        s.map(UTF8String.fromString).toArray,
        UTF8String.fromString(l), UTF8String.fromString(r),
        UTF8String.fromString(l + r)).map(_.toString).toList
      assert(got === ref(s, l, r), s"syms=$s pair=$lr")
    }
  }

  test("F19 frozen NB model reproduces one-pass scores on random corpora") {
    import graft.operators.TextAnalysis
    val corpus = for {
      n <- Gen.choose(4, 12)
      rows <- Gen.listOfN(n, for {
        words <- Gen.listOfN(6, Gen.oneOf("x", "y", "zz", "w q"))
        src <- Gen.oneOf("s1", "s2")
      } yield (words.mkString(" "), src))
    } yield rows.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
    forAll(corpus) { rows =>
      val docs = rows.toDF("doc_id", "text", "source")
      val wh = java.nio.file.Files.createTempDirectory("graft_nbp").toString
      TextAnalysis.writeNbModel(docs, "nb_p", s"$wh/nb_p", buckets = 2)
      val a = TextAnalysis.nbScoreAgainst(spark, "nb_p", docs)
        .orderBy("doc_id").collect().toSeq.map(_.toSeq)
      val b = TextAnalysis.nbClassify(docs)
        .orderBy("doc_id").collect().toSeq.map(_.toSeq)
      assert(a === b)
      Seq("nb_p_tok", "nb_p_cls", "nb_p_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("F20 dsir rank is a permutation ordered by (weight desc, id)") {
    forAll(Gen.listOfN(12, Gen.choose(0L, 300L)).map(_.distinct)) { ids =>
      val docs = ids.map(i =>
        (i, s"tok$i shared words here", if (i % 2 == 0) "en" else "fr"))
        .toDF("doc_id", "text", "lang")
      val out = Corpus.dsirSample(docs, selectRate = 0.5, partitions = 3)
        .select("doc_id", "rank", "dsir_weight", "selected")
        .as[(Long, Long, Double, Boolean)].collect().toSeq
      assert(out.map(_._2).sorted === (1L to ids.size.toLong))
      val byRank = out.sortBy(_._2)
      assert(byRank.sliding(2).forall {
        case Seq((ia, _, wa, _), (ib, _, wb, _)) =>
          wa > wb || (wa == wb && ia < ib)
        case _ => true
      })
      val nSel = math.floor(0.5 * ids.size).toLong
      assert(out.forall { case (_, r, _, sel) => sel == (r <= nSel) })
    }
  }

  test("minhash signature similarity estimates Jaccard (statistical, fixed sets)") {
    graft.functions.VecExprs.register(spark)
    // two sets with known overlap: J = 50/150 = 1/3
    val a = (1 to 100).map(i => s"tok$i")
    val b = (51 to 150).map(i => s"tok$i")
    val df = Seq((1L, a), (2L, b)).toDF("id", "toks")
      .select(col("id"), call_function("graft_minhash32",
        expr("transform(toks, t -> xxhash64(t))")).as("sig"))
    val Array(s1, s2) = df.orderBy("id").as[(Long, Seq[Long])].collect().map(_._2)
    val agree = s1.zip(s2).count { case (x, y) => x == y } / 32.0
    assert(math.abs(agree - 1.0 / 3.0) < 0.2) // 32 slots: crude but unbiased
  }

  test("zkey2 is a bijection on 16-bit pairs (round-trips through a reference de-interleave)") {
    import graft.operators.Layout
    def unzip(z: Long): (Long, Long) = {
      var (a, b) = (0L, 0L)
      for (i <- 0 until 16) {
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    forAll(Gen.listOfN(200, Gen.zip(
        Gen.chooseNum(0L, 0xFFFFL), Gen.chooseNum(0L, 0xFFFFL)))) { ps =>
      val rows = ps.toDF("a", "b")
        .select(col("a"), col("b"), Layout.zkey2(col("a"), col("b")).as("z"))
        .as[(Long, Long, Long)].collect()
      rows.foreach { case (a, b, z) => assert(unzip(z) === ((a, b)), s"$a,$b") }
    }
  }

  test("evalPairs metrics are bounded, symmetric under the prec/rec swap, and monotone in tp") {
    forAll(Gen.listOfN(40, Gen.zip(Gen.chooseNum(1L, 30L), Gen.chooseNum(31L, 60L))),
           Gen.listOfN(40, Gen.zip(Gen.chooseNum(1L, 30L), Gen.chooseNum(31L, 60L)))) {
      (cs, rs) =>
        val cand = cs.toDF("doc_a", "doc_b")
        val ref = rs.toDF("doc_a", "doc_b")
        val m = Dedup.evalPairs(cand, ref).collect().head
        val (tp, fp, fn) = (m.getLong(0), m.getLong(1), m.getLong(2))
        val (p, r, f1) = (m.getDouble(3), m.getDouble(4), m.getDouble(5))
        assert(tp + fp === cs.distinct.size.toLong)
        assert(tp + fn === rs.distinct.size.toLong)
        Seq(p, r, f1).foreach(x => assert(x >= 0.0 && x <= 1.0))
        // swapping cand and ref swaps precision and recall exactly
        val sw = Dedup.evalPairs(ref, cand).collect().head
        assert((sw.getDouble(3), sw.getDouble(4), sw.getDouble(5)) ===
          ((r, p, f1)))
    }
  }

  test("evalClustering ARI is symmetric and invariant under label renaming") {
    val labGen = Gen.listOfN(60, Gen.chooseNum(0L, 5L)).map(ls =>
      ls.zipWithIndex.map { case (l, i) => (i.toLong, l) })
    forAll(labGen, labGen) { (la, lb) =>
      def df(p: Seq[(Long, Long)]) = p.toDF("doc_id", "cluster_id")
      val ab = Dedup.evalClustering(df(la), df(lb)).collect().head.getDouble(4)
      val ba = Dedup.evalClustering(df(lb), df(la)).collect().head.getDouble(4)
      assert(ab === ba, "ARI must be symmetric")
      // renaming cluster ids (an injective map) changes nothing
      val renamed = la.map { case (id, l) => (id, 1000L - 7L * l) }
      val rn = Dedup.evalClustering(df(renamed), df(lb))
        .collect().head.getDouble(4)
      assert(rn === ab, "ARI must ignore label identities")
      // a labeling agrees with itself perfectly
      assert(Dedup.evalClustering(df(la), df(la))
        .collect().head.getDouble(4) === 1.0)
    }
  }
}
