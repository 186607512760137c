package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** F15/F15b: exact vocabulary vs the DataSketches HLL estimate — the
  * error bound the rows-only entry ships under, and the shard-merge
  * identity that makes the sketch the 100 TB plan (per-shard sketches
  * unioned ≡ one pass over the union). */
class VocabSketchSpec extends SparkSpec {
  import spark.implicits._

  private def docsTable = Tables.documents(spark, sfDir)

  test("F15 counts distinct normalized tokens per lang") {
    val docs = Seq(
      (1L, "the cat, the CAT!", "en"),
      (2L, "una casa", "es"),
      (3L, "casa casa casa", "es"),
      (4L, "???", "zh") // zero tokens -> no group row
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.vocabExact(docs)
      .as[(String, Long)].collect().toMap
    assert(out === Map("en" -> 2L, "es" -> 2L)) // {the,cat}, {una,casa}
  }

  test("F15b estimate lands within 5% of F15 exact on every lang") {
    val exact = TextAnalysis.vocabExact(docsTable)
      .as[(String, Long)].collect().toMap
    val est = TextAnalysis.vocabHll(docsTable)
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (lang, ex) =>
      val rel = math.abs(est(lang) - ex).toDouble / ex
      assert(rel <= 0.05, f"$lang: est ${est(lang)} vs exact $ex (rel $rel%.4f)")
    }
  }

  test("F15b shard-merged sketches reproduce the single-pass estimate exactly") {
    val toks = docsTable
      .select(col("lang"), pmod(col("doc_id"), lit(4)).as("shard"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    // per-shard sketches (what 1000 independent corpus shards would
    // persist), unioned per lang — HLL union is lossless at equal lgK,
    // so the estimate must be bit-identical to the one-pass sketch
    val merged = toks.groupBy("lang", "shard")
      .agg(hll_sketch_agg(col("tok"), lit(12)).as("sk"))
      .groupBy("lang")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("vocab_est"))
      .as[(String, Long)].collect().toMap
    val direct = TextAnalysis.vocabHll(docsTable)
      .as[(String, Long)].collect().toMap
    assert(merged === direct)
  }

  test("F15b aggregates partially before the exchange (map-side sketch)") {
    val plan = TextAnalysis.vocabHll(docsTable)
      .queryExecution.executedPlan.toString
    // the partial ObjectHashAggregate must sit under the shuffle: the
    // wire carries one 2^12-bucket sketch per (partition, lang), never
    // the token stream
    assert(plan.contains("partial_hll_sketch_agg") ||
      plan.toLowerCase.contains("partial_hllsketchagg"), plan.take(2000))
  }
}
