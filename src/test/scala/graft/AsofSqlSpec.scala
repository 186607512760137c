package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Timeseries}

class AsofSqlSpec extends SparkSpec {
  import spark.implicits._

  test("A13 asofJoinLatest: latest right ≤ left time, equal-time matches, null before first") {
    val left = Seq(("u1", 5L, 1L), ("u1", 10L, 2L), ("u1", 20L, 3L), ("u2", 7L, 4L))
      .toDF("k", "t", "id")
    val right = Seq(("u1", 10L, 100.0), ("u1", 15L, 150.0)).toDF("k", "rt", "rv")
    val out = Timeseries.asofJoinLatest(left, right, "k", "t", "rt", "rv")
      .orderBy("id").select("id", "asof_value").collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(out === Seq(
      (1L, null),     // t=5: no right yet
      (2L, 100.0),    // t=10: equal-time right matches (<=)
      (3L, 150.0),    // t=20: latest of {10,15}
      (4L, null)))    // u2 has no right rows at all
  }

  test("A13 preserves left row count (no fan-out, no loss)") {
    val leftSrc = Tables.events(spark, sfDir)
    val left = leftSrc
      .select(col("user_id"), col("event_id"), Tables.eventTsUs(leftSrc).as("t"))
    val right = left.groupBy(col("user_id"), col("t").as("rt")).agg(count(lit(1)).as("rv"))
    val joined = Timeseries.asofJoinLatest(left, right, "user_id", "t", "rt", "rv")
    assert(joined.count() === left.count())
  }

  test("G2 frameSample explodes every step-th frame of videos only") {
    val meta = Seq((1L, "video", 10, 100, 100, 70), (2L, "image", 5, 64, 64, 1))
      .toDF("doc_id", "kind", "n_bytes", "width", "height", "frames")
    val out = Multimodal.frameSample(meta, step = 30, fps = 24.0)
      .orderBy("frame_idx").collect()
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 30, 60))
    assert(out.forall(_.getAs[Long]("doc_id") == 1L))
    assert(out.last.getAs[Double]("t_offset_s") === 2.5)
  }

  test("G3 featureExtract emits deterministic fixed-width float vectors") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val a = Multimodal.featureExtract(docs).orderBy("doc_id").collect()
    val b = Multimodal.featureExtract(docs.repartition(5)).orderBy("doc_id").collect()
    assert(a.length === 50)
    assert(a.head.getAs[Seq[Float]]("embedding").size === 16)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("G4 resize fits within bounds, keeps aspect ratio, never upscales") {
    val docs = Tables.documents(spark, sfDir).limit(60)
    val out = Multimodal.resize(docs, maxW = 224, maxH = 224).collect()
    assert(out.nonEmpty) // ~1/3 of docs are tagged image
    out.foreach { r =>
      val (sw, sh) = (r.getAs[Int]("src_w"), r.getAs[Int]("src_h"))
      val (dw, dh) = (r.getAs[Int]("dst_w"), r.getAs[Int]("dst_h"))
      assert(dw <= 224 && dh <= 224)
      assert(dw <= sw && dh <= sh) // no upscaling
      // aspect preserved up to integer truncation (relative: the
      // smaller scaled edge can be single digits, where floor() costs
      // up to ~1/edge of the ratio)
      assert(math.abs((dw.toDouble / dh) / (sw.toDouble / sh) - 1.0) < 0.2,
        s"aspect drift: $sw x $sh -> $dw x $dh")
      assert(r.getAs[Array[Byte]]("payload").length === r.getAs[Int]("n_bytes"))
    }
    // already-small payloads pass through at native size
    val small = out.filter(r => r.getAs[Int]("src_w") <= 224 && r.getAs[Int]("src_h") <= 224)
    small.foreach { r =>
      assert(r.getAs[Int]("dst_w") === r.getAs[Int]("src_w"))
      assert(r.getAs[Int]("dst_h") === r.getAs[Int]("src_h"))
    }
    // deterministic and partition-invariant, like G1/G3 (payload
    // compared as a Seq — Array[Byte] equality is referential)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Int]("src_w"), r.getAs[Int]("src_h"),
        r.getAs[Int]("dst_w"), r.getAs[Int]("dst_h"),
        r.getAs[Array[Byte]]("payload").toSeq)
    val b = Multimodal.resize(docs.repartition(7), 224, 224).collect()
    assert(out.map(key).sortBy(_._1).toSeq === b.map(key).sortBy(_._1).toSeq)
  }

  test("SQL surface: registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      """SELECT count(*) AS n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey""".stripMargin).as[Long].head()
    assert(n > 0)
    assert(spark.sql("SELECT * FROM documents LIMIT 1").columns.contains("text"))
  }
}
