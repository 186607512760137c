package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** F20 DSIR importance resampling: rank ≡ the window spelling,
  * exact top-N selection, target-slice preference, degenerate-target
  * robustness, and partitioning-invariance. */
class DsirSpec extends SparkSpec {

  test("F20 dsirSample: rank ≡ (weight desc, doc_id) window; exactly top-N selected") {
    val docs = Tables.documents(spark, sfDir)
    val out = Corpus.dsirSample(docs, selectRate = 0.25).cache()
    val n = docs.count()
    val nSel = math.floor(0.25 * n).toLong
    assert(out.count() === n)
    assert(out.filter(col("selected")).count() === nSel)
    // the distributed two-phase numbering must be bit-identical to
    // the single-task window spelling the oracle keeps (dsir_weight
    // = w_i/1e4 is order-isomorphic to the integer weight)
    val w = Window.orderBy(col("dsir_weight").desc, col("doc_id"))
    val mism = out
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") =!= col("rank") ||
        col("selected") =!= (col("rank") <= nSel))
      .count()
    assert(mism === 0L)
    out.unpersist()
  }

  test("F20 weights pull toward the target slice") {
    val docs = Tables.documents(spark, sfDir)
    val means = Corpus.dsirSample(docs, targetLang = "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("dsir_weight")).as("mw"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} should exceed non-en ${means(false)}")
  }

  test("F20 degenerate target (no docs) still ranks deterministically") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val out = Corpus.dsirSample(docs, targetLang = "zz", selectRate = 0.1)
    assert(out.count() === 50L)
    assert(out.filter(col("selected")).count() === 5L)
  }

  test("F20 is partitioning-invariant") {
    val docs = Tables.documents(spark, sfDir)
    val a = Corpus.dsirSample(docs, partitions = 3)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val b = Corpus.dsirSample(docs.repartition(7), partitions = 5)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(a === b)
  }
}
