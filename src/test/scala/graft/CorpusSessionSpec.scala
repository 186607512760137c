package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Timeseries}

class CorpusSessionSpec extends SparkSpec {
  import spark.implicits._

  test("A15 sessionize splits on gaps, 1-based per key, deterministic ties") {
    val df = Seq(
      ("u1", 0L, 1L), ("u1", 100L, 2L), ("u1", 5000L, 3L), ("u1", 5100L, 4L),
      ("u2", 0L, 5L)
    ).toDF("k", "t", "id")
    val out = Timeseries.sessionize(df, "k", "t", "id", gapTicks = 1000L)
      .orderBy("id").select("session_id").as[Long].collect()
    assert(out.toSeq === Seq(1L, 1L, 2L, 2L, 1L))
  }

  test("D7 corpusSimilarity: identical corpora estimate ~1, disjoint ~0") {
    val docs = (
      (1 to 30).map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta token$i", "s1")) ++
      (31 to 60).map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta token${i - 30}", "s2")) ++
      (61 to 90).map(i => (i.toLong, s"uno dos tres cuatro cinco seis other$i", "s3"))
    ).toDF("doc_id", "text", "source")
    val out = Dedup.corpusSimilarity(docs, "source")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    assert(out(("s1", "s2")) === 1.0)   // same shingle sets → identical merged sigs
    assert(out(("s1", "s3")) < 0.2)     // disjoint shingle sets
    assert(out(("s2", "s3")) < 0.2)
  }

  test("graft_minhash_merge32 is partition-invariant (associative merge)") {
    graft.functions.VecExprs.register(spark)
    val docs = Tables.documents(spark, sfDir).limit(200)
    def mergedSig(parts: Int) = docs.repartition(parts)
      .select(call_function("graft_minhash32",
        call_function("graft_grams3h",
          graft.functions.TextFunctions.tokens(col("text")))).as("sig"))
      .agg(call_function("graft_minhash_merge32", col("sig")))
      .as[Seq[Long]].head()
    assert(mergedSig(1) === mergedSig(13))
  }
}
