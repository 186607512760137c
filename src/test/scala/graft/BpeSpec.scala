package graft

import org.apache.spark.sql.functions._
import graft.functions.BpeExprs
import graft.operators.Bpe

/** F21 BPE tokenizer: the canonical Sennrich corpus merges, the
  * greedy-scan semantics, encode losslessness, and operator gates. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al. 2016's worked example: low×5 lower×2 newest×6
  // widest×3 — first merges (e,s) (es,t) (est,</w>) (l,o) (lo,w),
  // all hand-derivable (ties break on smallest left symbol)
  private def sennrich = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("F21 train reproduces the canonical Sennrich merges in order") {
    val merges = Bpe.train(sennrich, 5).toSeq
    assert(merges === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("F21 selectBatch: interference and dominance cuts (unit pins)") {
    def p(l: String, r: String, c: Long) = (l, r, c)
    // disjoint picks all accepted
    assert(Bpe.selectBatch(Array(p("a","b",10), p("c","d",9)), complete = true, 8).toSeq
      === Seq(p("a","b",10), p("c","d",9)))
    // shared raw symbol stops the prefix (maximal disjoint PREFIX —
    // (d,e) after the stop is never considered)
    assert(Bpe.selectBatch(Array(p("a","b",10), p("b","c",9), p("d","e",8)),
      complete = true, 8).toSeq === Seq(p("a","b",10)))
    // the concatenated symbol of an accepted pick interferes too
    assert(Bpe.selectBatch(Array(p("a","b",10), p("c","ab",9)),
      complete = true, 8).toSeq === Seq(p("a","b",10)))
    // dominance: an equal-count interferer ANYWHERE in the snapshot
    // voids later picks (a grown pair could tie and win the canonical
    // tie-break)
    assert(Bpe.selectBatch(Array(p("a","b",10), p("c","d",10), p("x","a",10)),
      complete = true, 8).toSeq === Seq(p("a","b",10)))
    // truncated snapshot: unseen tail bounds every pick after the first
    assert(Bpe.selectBatch(Array(p("a","b",10), p("c","d",10)),
      complete = false, 8).toSeq === Seq(p("a","b",10)))
    assert(Bpe.selectBatch(Array(p("a","b",11), p("c","d",10)),
      complete = false, 8).toSeq === Seq(p("a","b",11)))
    // maxPick clamps
    assert(Bpe.selectBatch(Array(p("a","b",10), p("c","d",9), p("e","f",8)),
      complete = true, 2).toSeq === Seq(p("a","b",10), p("c","d",9)))
  }

  test("F21 batched training ≡ sequential training on random hostile corpora") {
    // tiny alphabet → heavy pair interference, the regime where a
    // wrong batch rule would diverge from sequential Sennrich
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 8) {
      val vocab = (1 to (6 + rnd.nextInt(8))).map { _ =>
        (1 to (2 + rnd.nextInt(5)))
          .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }.distinct
      val corpus = vocab.zipWithIndex.map { case (w, i) =>
        (i.toLong, Array.fill(1 + rnd.nextInt(9))(w).mkString(" "))
      }.toDF("doc_id", "text")
      val seq = Bpe.train(corpus, 16, batchMerges = 1).toSeq
      val bat = Bpe.train(corpus, 16, batchMerges = 64).toSeq
      assert(bat === seq, s"trial $trial vocab=$vocab")
    }
  }

  test("F21 non-strict (parallel) mode: unique merges, count-threshold guard, lossless") {
    val docs = Tables.documents(spark, sfDir).limit(300)
    val (merges, rounds) = Bpe.trainWithRounds(docs, 32, strict = false)
    assert(merges.length === 32)
    assert(merges.map(m => (m._1, m._2)).distinct.length === 32)
    val (_, seqRounds) = Bpe.trainWithRounds(docs, 32, batchMerges = 1)
    assert(rounds <= seqRounds) // never worse than sequential
    // any merge list encodes losslessly (order deviation can't break it)
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("word")).distinct()
    val bad = BpeExprs.withEncode(spark, merges.map(t => (t._1, t._2))) { fn =>
      words.select(col("word"),
        concat_ws("", call_function(fn,
          concat(filter(split(col("word"), ""), s => length(s) > 0),
            array(lit("</w>"))))).as("joined"))
    }.filter(col("joined") =!= concat(col("word"), lit("</w>"))).count()
    assert(bad === 0L)
    // the unit guard: non-strict never accepts below half the round max
    val picks = Bpe.selectBatch(
      Array(("a","b",100L), ("c","d",50L), ("e","f",49L)),
      complete = true, 8, strict = false)
    assert(picks.toSeq === Seq(("a","b",100L), ("c","d",50L)))
  }

  test("F21 merge pass is greedy left-to-right, non-overlapping") {
    // "a a a" under (a,a): first two merge, third stands — the merged
    // symbol is not reconsidered as LEFT within the same pass
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a")).toDF("syms")
    val out = BpeExprs.withMergePass(spark, "a", "a") { fn =>
      df.select(call_function(fn, col("syms")).as("m"))
    }.as[Seq[String]].collect().toSeq
    assert(out === Seq(Seq("aa", "a"), Seq("aa", "aa")))
  }

  test("F21 encode is lossless: pieces concatenate back to word+</w>") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val merges = Bpe.train(docs, 32).map(t => (t._1, t._2))
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("word")).distinct()
    val bad = BpeExprs.withEncode(spark, merges) { fn =>
      words.select(col("word"),
        concat_ws("", call_function(fn,
          concat(filter(split(col("word"), ""), s => length(s) > 0),
            array(lit("</w>"))))).as("joined"))
    }.filter(col("joined") =!= concat(col("word"), lit("</w>"))).count()
    assert(bad === 0L)
  }

  test("F21 bpe_encode operator: row per doc, piece counts bounded, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.train(docs, 16).map(t => (t._1, t._2))
    val out = Bpe.encode(docs, merges).cache()
    assert(out.count() === docs.count())
    // each word is ≥1 piece and ≤ chars+1 pieces; doc sums inherit it
    assert(out.filter(col("n_pieces") < col("n_toks") &&
      col("n_toks") > 0).count() === 0L)
    val a = out.orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val b = Bpe.encode(docs.repartition(7), merges)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(a === b)
    out.unpersist()
  }

  test("F21 frozen tokenizer artifact: write → read preserves merge PRIORITY, encodeAgainst ≡ encode") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val trained = Bpe.train(docs, 32)
    val path = java.nio.file.Files.createTempDirectory("graft_bpe_model").toString
    Bpe.writeBpeModel(spark, trained, path)
    // rank order round-trips exactly — merge priority IS the
    // artifact's semantics (greedy encoding applies merges in order;
    // a scrambled read would tokenize differently)
    val back = Bpe.readBpeModel(spark, path)
    assert(back.toSeq === trained.map(t => (t._1, t._2)).toSeq)
    // encoding from the artifact ≡ encoding from the in-memory result
    val direct = Bpe.encode(docs, trained.map(t => (t._1, t._2)))
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val frozen = Bpe.encodeAgainst(spark, path, docs)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(frozen === direct)
    // and the streaming flavor takes the same frozen list (the
    // train-once-encode-anywhere composition)
    assert(Bpe.readBpeModel(spark, path).length === 32)
  }
}
