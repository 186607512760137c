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
}
