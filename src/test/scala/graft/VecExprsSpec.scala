package graft

import org.apache.spark.sql.functions._
import graft.functions.VecExprs
import graft.operators.Multimodal

class VecExprsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = { super.beforeAll(); VecExprs.register(spark) }

  test("graft_dot matches sequential accumulation exactly") {
    val out = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").select(call_function("graft_dot", col("a"), col("b")))
      .as[Double].head()
    assert(out === 32.0)
  }

  test("wrong element type fails at analysis, not silently reads wrong bytes") {
    // the public SQL surface: graft_dot over array<float> must be an
    // analysis error (the codegen loop reads 8-byte slots)
    val floats = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      floats.select(call_function("graft_dot", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<double>"))
    val strs = Seq(Seq("a", "b")).toDF("s")
    val e2 = intercept[Exception] {
      strs.select(call_function("graft_simhash64", col("s"))).collect()
    }
    assert(e2.getMessage.contains("array<bigint>"))
    // and the documented casts still pass analysis
    val ok = floats.select(call_function("graft_dot",
      col("a").cast("array<double>"), col("b").cast("array<double>"))).as[Double].head()
    assert(ok === (1.0f.toDouble * 3.0f.toDouble + 2.0f.toDouble * 4.0f.toDouble))
  }

  test("nearestCentroidsLocal ≡ the distributed NearestCentroids expression (r17)") {
    // the seeded graph serve assigns probes driver-side with this
    // mirror — it must be bit-identical to the expression the IVF
    // serves plan, including dot order, insertion top-n and
    // first-wins ties (two equal-dot centroids below)
    val cents = Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0),
      Array(0.0, 1.0, 0.0), // duplicate of c1 — tie, earlier index wins
      Array(0.6, 0.64, 0.48), Array(-1.0, 0.0, 0.0))
    val vecs = Seq(
      Seq(0.3, 0.9, 0.1), Seq(1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0),
      Seq(-0.5, 0.5, 0.1), Seq(0.577, 0.577, 0.577))
    for (n <- Seq(1, 2, 3)) {
      val dist = VecExprs.withNearestCentroids(spark, cents, n) { fn =>
        vecs.map(Tuple1(_)).toDF("v")
          .select(call_function(fn, col("v")))
          .as[Seq[Int]].collect().toSeq
      }
      val local = vecs.map(v =>
        VecExprs.nearestCentroidsLocal(v, cents, n).toSeq)
      assert(local === dist, s"driver mirror drifted at n=$n")
    }
  }

  test("graft_dot on empty arrays is 0, null array is null") {
    val df = Seq((Some(Array.empty[Double]), Some(Array.empty[Double])),
                 (None, Some(Array(1.0)))).toDF("a", "b")
    val out = df.select(call_function("graft_dot", col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) === 0.0)
    assert(out(1) === null)
  }

  test("graft_simhash64: all-identical hashes give the hash itself; empty gives 0") {
    val df = Seq(Seq(5L, 5L, 5L), Seq.empty[Long]).toDF("hs")
    val out = df.select(call_function("graft_simhash64", col("hs"))).as[Long].collect()
    assert(out(0) === 5L)
    assert(out(1) === 0L)
  }

  test("graft_minhash32: monotone — superset's slot minima ≤ subset's") {
    val df = Seq(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L, 4L, 5L)).toDF("hs")
    val sigs = df.select(call_function("graft_minhash32", col("hs"))).as[Seq[Long]].collect()
    assert(sigs(0).size === 32 && sigs(1).size === 32)
    sigs(0).zip(sigs(1)).foreach { case (a, b) => assert(b <= a) }
  }

  test("graft_grams3h equals distinct count of 3-gram strings") {
    val df = Seq("a b c d a b c d", "x y").toDF("text")
      .select(call_function("graft_grams3h",
        graft.functions.TextFunctions.tokens(col("text"))).as("g"))
    val out = df.as[Seq[Long]].collect()
    // 8 tokens → 6 grams; "a b c"/"b c d" repeat → 4 distinct (abc, bcd, cda, dab)
    assert(out(0).size === 4)
    assert(out(0) === out(0).sorted)
    assert(out(1) === Seq.empty)
  }

  test("graft_hyperplane8 buckets colinear vectors together, stays in [0, 255]") {
    val df = Seq(Array(1.0, 2.0, 3.0), Array(2.0, 4.0, 6.0), Array(-1.0, -2.0, -3.0))
      .toDF("v").select(call_function("graft_hyperplane8", col("v"))).as[Long]
    val out = df.collect()
    assert(out(0) === out(1))            // same direction → same signs
    assert(out.forall(b => b >= 0 && b < 256))
  }

  test("bloom probe: no false negatives, bounded false positives, bigint-only input") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    (0L until 1000L).foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    // every inserted key passes (a Bloom filter never drops a member)
    val hits = VecExprs.withBloomContains(spark, bytes) { fn =>
      spark.range(1000).selectExpr(s"$fn(id) AS p").filter(col("p")).count()
    }
    assert(hits === 1000L)
    // fresh keys pass only at ~fpp (1% built; assert with 5× slack)
    val fps = VecExprs.withBloomContains(spark, bytes) { fn =>
      spark.range(10000).selectExpr(s"$fn(id + 1000000) AS p")
        .filter(col("p")).count()
    }
    assert(fps < 500L, s"false-positive count $fps")
    // wrong input type is an analysis error, not a wrong-bytes probe
    val e = intercept[Exception] {
      VecExprs.withBloomContains(spark, bytes) { fn =>
        spark.range(3).selectExpr(s"$fn(cast(id AS string))").collect()
      }
    }
    assert(e.getMessage.contains("bigint"))
  }

  test("graft_residual subtracts the referenced centroid row; bad list id throws") {
    val cents = Array(Array(1.0, 2.0), Array(0.5, 0.5))
    val df = Seq((Array(3.0, 4.0), 0), (Array(3.0, 4.0), 1)).toDF("v", "c")
    val out = VecExprs.withResidual(spark, cents) { fn =>
      df.selectExpr(s"$fn(v, c) AS r").as[Seq[Double]].collect()
    }
    assert(out(0) === Seq(2.0, 2.0) && out(1) === Seq(2.5, 3.5))
    // an out-of-range list id is a loud failure, not a raw-vector encode
    val bad = Seq((Array(1.0), 7)).toDF("v", "c")
    val e = intercept[Exception] {
      VecExprs.withResidual(spark, cents) { fn =>
        bad.selectExpr(s"$fn(v, c)").collect()
      }
    }
    assert(e.getMessage.contains("outside") ||
      Option(e.getCause).exists(_.getMessage.contains("outside")))
  }

  test("G1 decodeMeta is deterministic and batch-invariant") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val a = Multimodal.decodeMeta(docs).orderBy("doc_id").collect()
    val b = Multimodal.decodeMeta(docs.repartition(7)).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(r => r.getAs[Int]("width") >= 64 && r.getAs[Int]("height") >= 64))
  }
}
