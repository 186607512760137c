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

  test("F20 deploy flow: frozen model reproduces weights; threshold gates arrivals") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    val docs = Tables.documents(spark, sfDir)
    Corpus.writeDsirModel(docs, "dsir_m", s"$wh/dsir_m")

    // frozen-model weights on the training corpus ≡ one-pass weights
    val frozen = Corpus.dsirScoreAgainst(spark, "dsir_m", docs)
      .select("doc_id", "dsir_weight", "n_toks", "selected").cache()
    val ranked = Corpus.dsirSample(docs)
      .select("doc_id", "dsir_weight", "n_toks", "selected")
    val wMismatch = frozen.as("f")
      .join(ranked.as("r"), "doc_id")
      .filter(col("f.dsir_weight") =!= col("r.dsir_weight") ||
        col("f.n_toks") =!= col("r.n_toks")).count()
    assert(wMismatch === 0L)
    // flags agree except possibly AT the threshold weight (the
    // training id tie-break has no arrival-time analog)
    val thr = spark.table("dsir_m_meta").select("thr_i").as[Long].head()
    val flagMismatch = frozen.as("f")
      .join(ranked.as("r"), "doc_id")
      .filter(col("f.selected") =!= col("r.selected") &&
        round(col("f.dsir_weight") * 1e4).cast("long") =!= thr).count()
    assert(flagMismatch === 0L)

    // fully-OOV arrival: every bucket unseen → weight = n · λ_oov
    val (nR, nT) = spark.table("dsir_m_meta")
      .select("n_r", "n_t").as[(Long, Long)].head()
    val lamSeen = spark.table("dsir_m_lam").select("b").as[String]
      .collect().toSet
    // craft a token whose md5 bucket is NOT in the λ table (the lam
    // table only holds occupied buckets; find one by search)
    val tok = (1 to 10000).map(i => s"zzqq$i").find { t =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      !lamSeen.contains(h.substring(0, 2))
    }
    assume(tok.nonEmpty, "all 256 buckets occupied — craft impossible")
    val oov = Seq((9000L, s"${tok.get} ${tok.get}")).toDF("doc_id", "text")
    val got = Corpus.dsirScoreAgainst(spark, "dsir_m", oov)
      .select("dsir_weight", "n_toks").as[(Double, Long)].head()
    val lamOov = math.rint(math.log((nR + 128.0) / (nT + 128.0)) * 1e4).toLong
    assert(got === ((2L * lamOov).toDouble / 1e4, 2L))

    frozen.unpersist()
    Seq("dsir_m_lam", "dsir_m_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
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
