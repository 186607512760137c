package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** F19 multinomial Naive Bayes classifier: hand-computed integer
  * scores, class-name tie-break, frozen-model ≡ one-pass invariant,
  * OOV backoff, and partitioning-invariance. */
class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  // corpus: class A = {1:"a a b", 2:"a b"}, class B = {3:"c c", 4:""}
  // V=3, n_docs=4, N_A=5, N_B=2, k=0.5 → denominators 6.5 / 3.5;
  // scale-4 ln terms: (a,A)=-6190 (b,A)=-9555 (c,A)=-25649
  // (a,B)=(b,B)=-19459 (c,B)=-3365; priors ln(2/4) → -6931 both
  private def tiny = Seq(
    (1L, "a a b", "A"), (2L, "a b", "A"),
    (3L, "c c", "B"), (4L, "", "B")
  ).toDF("doc_id", "text", "source")

  test("F19 nbClassify: hand-computed integer scores and argmax") {
    val out = TextAnalysis.nbClassify(tiny).orderBy("doc_id")
      .select("doc_id", "pred_source", "nb_score", "n_toks")
      .as[(Long, String, Double, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "A", -2.8866, 3L),   // -6931 + 2·(-6190) + (-9555)
      (2L, "A", -2.2676, 2L),   // -6931 - 6190 - 9555
      (3L, "B", -1.3661, 2L),   // -6931 + 2·(-3365)  (vs A -5.8229)
      (4L, "A", -0.6931, 0L)))  // prior-only TIE → class-name tie-break
  }

  test("F19 deploy flow: frozen model reproduces self-scores on real docs") {
    val wh = java.nio.file.Files.createTempDirectory("graft_nb").toString
    val corpus = Tables.documents(spark, sfDir).filter(col("doc_id") < 200)
    TextAnalysis.writeNbModel(corpus, "nb_m", s"$wh/nb_m", buckets = 4)
    val a = TextAnalysis.nbScoreAgainst(spark, "nb_m", corpus)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val b = TextAnalysis.nbClassify(corpus)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(a.nonEmpty && a === b)

    // fully-OOV arrival: every (tok, class) backs off to c_tc = 0 →
    // score_c = prior_c + n·round(ln(k/(N_c+kV))·1e4); every class is
    // still scored (no error, no dropped doc)
    val cls = spark.table("nb_m_cls")
      .select("source", "prior_i", "n_toks_c")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    val v = spark.table("nb_m_meta").select("v").as[Long].head()
    val oov = Seq((9000L, "zzqq wwrr zzqq")).toDF("doc_id", "text")
    val got = TextAnalysis.nbScoreAgainst(spark, "nb_m", oov)
      .select("pred_source", "nb_score", "n_toks")
      .as[(String, Double, Long)].head()
    val scores = cls.map { case (s, p, n) =>
      (s, p + 3L * math.rint(math.log(0.5 / (n + 0.5 * v)) * 1e4).toLong)
    }
    val bestScore = scores.map(_._2).max
    val pred = scores.filter(_._2 == bestScore).map(_._1).min
    assert(got === ((pred, bestScore.toDouble / 1e4, 3L)))

    spark.sql("DROP TABLE IF EXISTS nb_m_tok")
    spark.sql("DROP TABLE IF EXISTS nb_m_cls")
    spark.sql("DROP TABLE IF EXISTS nb_m_meta")
  }

  test("F19 is partitioning-invariant") {
    val a = TextAnalysis.nbClassify(tiny).orderBy("doc_id")
      .collect().toSeq.map(_.toSeq)
    val b = TextAnalysis.nbClassify(tiny.repartition(5)).orderBy("doc_id")
      .collect().toSeq.map(_.toSeq)
    assert(a === b)
  }
}
