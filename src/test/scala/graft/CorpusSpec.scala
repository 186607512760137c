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
}
