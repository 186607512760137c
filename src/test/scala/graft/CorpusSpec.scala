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
