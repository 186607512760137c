package graft

import org.apache.spark.sql.functions._
import graft.operators.Timeseries

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  // (key, time, id, value) — two series; series "a" has a null value mid-way
  private def ts = Seq(
    ("a", 10L, 1L, Some(5.0)), ("a", 20L, 2L, Some(8.0)),
    ("a", 30L, 3L, None),      ("a", 40L, 4L, Some(9.0)),
    ("b", 10L, 5L, Some(1.0)), ("b", 25L, 6L, Some(4.0))
  ).toDF("k", "t", "id", "v")

  test("A1 intervalDiff drops exactly the first row per series, keeps null measurements") {
    val out = Timeseries.intervalDiff(ts, "k", "t", "id", "v")
      .orderBy("k", "t").select("k", "t", "delta").collect().toSeq.map(_.toSeq)
    assert(out === Seq(
      Seq("a", 20L, 3.0), Seq("a", 30L, null), Seq("a", 40L, null),
      Seq("b", 25L, 3.0)))
  }

  test("A2 tzShiftLk adds +5:30 and floors to the minute") {
    // 2020-01-01 00:00:59 UTC in micros → 05:30:00 LK string
    val us = 1577836859000000L
    val out = Timeseries.tzShiftLk(Seq(us).toDF("ts_us"), "ts_us")
      .select("lk_time").as[String].head()
    assert(out === "2020-01-01 05:30:00")
  }

  test("A3 resample sums per (key, bucket)") {
    val df = Seq(("a", 100L, 1.0), ("a", 800L, 2.0), ("a", 950L, 4.0), ("b", 100L, 8.0))
      .toDF("k", "t", "v")
    val out = Timeseries.resample(df, "k", Timeseries.bucketEpochSec("t", 900L, 1L), "v")
      .orderBy("k", "bucket").collect().toSeq.map(_.toSeq)
    assert(out === Seq(Seq("a", 0L, 3.0), Seq("a", 900L, 4.0), Seq("b", 0L, 8.0)))
  }

  test("A4 latestRun keeps the newest row per key with id tie-break") {
    val df = Seq(("a", 10L, 1L, 1.0), ("a", 20L, 2L, 2.0), ("a", 20L, 3L, 3.0))
      .toDF("k", "t", "id", "v")
    val out = Timeseries.latestRun(df, "k", "t", "id").select("id").as[Long].collect()
    assert(out.toSeq === Seq(3L))
  }

  test("A5 upsertDedup last-write-wins per business key") {
    val df = Seq(("a", "x", 10L, 1L, 1.0), ("a", "x", 20L, 2L, 2.0), ("a", "y", 5L, 3L, 3.0))
      .toDF("k", "kind", "ver", "id", "v")
    val out = Timeseries.upsertDedup(df, Seq("k", "kind"), "ver", "id")
      .orderBy("kind").select("id").as[Long].collect()
    assert(out.toSeq === Seq(2L, 3L))
  }

  test("A6 ensembleMean averages across sources per bucket") {
    val df = Seq(("st1", "A", 0L, 2.0), ("st1", "B", 0L, 4.0), ("st1", "A", 1000L, 6.0))
      .toDF("k", "src", "t", "v")
    val out = Timeseries.ensembleMean(df, "k", "src", Timeseries.bucketEpochSec("t", 900L, 1L), "v")
      .orderBy("bucket").select("mean_value", "n_sources").collect().toSeq.map(_.toSeq)
    assert(out === Seq(Seq(3.0, 2L), Seq(6.0, 1L)))
  }

  test("A7 hybridObsFcst keeps only overlapping buckets, prefers obs") {
    val obs  = Seq(("a", 0L, 1.0), ("a", 900L, 2.0)).toDF("k", "bucket", "value")
    val fcst = Seq(("a", 900L, 9.0), ("a", 1800L, 8.0)).toDF("k", "bucket", "value")
    val out = Timeseries.hybridObsFcst(obs, fcst, "k")
      .select("bucket", "hybrid_value").collect().toSeq.map(_.toSeq)
    assert(out === Seq(Seq(900L, 2.0)))
  }

  test("A6b hybridWide pivots one column per system and drops partial rows") {
    val df = Seq(
      ("st1", "obs", 0L, 2.0), ("st1", "A", 0L, 4.0), ("st1", "A", 100L, 1.0),
      ("st1", "obs", 1000L, 6.0),                 // bucket 900: obs only → dropped
      ("st2", "A", 0L, 9.0))                      // no obs → dropped
      .toDF("k", "src", "t", "v")
    val out = Timeseries.hybridWide(df, "k", "src",
      Timeseries.bucketEpochSec("t", 900L, 1L), "v", Seq("obs", "A"))
      .orderBy("k", "bucket").collect().toSeq.map(_.toSeq)
    // only (st1, bucket 0) has BOTH systems; A sums its two readings
    assert(out === Seq(Seq("st1", 0L, 2.0, 5.0)))
  }

  test("A8 activeKeys filters to keys active within the horizon") {
    val day = 86400L
    val df = Seq(("old", 0L), ("new", 10L * day), ("edge", 3L * day + 1))
      .toDF("k", "t")
    val out = Timeseries.activeKeys(df, "k", "t", days = 7, ticksPerSec = 1L)
      .select("k").as[String].collect().toSet
    assert(out === Set("new", "edge"))
  }

  test("A9 stationRegistry keys on 6-dp-rounded coords (float jitter collapses)") {
    val df = Seq((6.50000004, 79.25), (6.5, 79.25)).toDF("lat", "lon")
    val out = Timeseries.stationRegistry(df, Seq("lat", "lon"), "wrf")
    assert(out.count() === 1)
    assert(out.select("station_name").as[String].head() === "wrf_6.5_79.25")
  }

  test("A9 stationRegistry names match the reference's str(float('%.6f')) byte-for-byte") {
    // wrf_data_pusher.py renders keys via str(float('%.6f' % v)):
    // trailing zeros stripped, at least one fractional digit kept
    val df = Seq((6.9, 79.85), (7.0, 80.0), (6.123456789, 79.0))
      .toDF("lat", "lon")
    val names = Timeseries.stationRegistry(df, Seq("lat", "lon"), "wrf")
      .select("station_name").as[String].collect().toSet
    assert(names === Set("wrf_6.9_79.85", "wrf_7.0_80.0", "wrf_6.123457_79.0"))
    // md5 ids are derived from those exact strings
    val id = Timeseries.stationRegistry(
        Seq((6.9, 79.85)).toDF("lat", "lon"), Seq("lat", "lon"), "wrf")
      .select("station_id").as[String].head()
    assert(id === org.apache.commons.codec.digest.DigestUtils.md5Hex("wrf_6.9_79.85"))
  }

  test("A9 stationRegistry matches Python's scientific notation below 1e-4") {
    // str(float('%.6f' % v)) goes scientific for 0 < |v| < 1e-4;
    // expected strings pinned against CPython: 5e-05, 1.5e-05, 1e-05,
    // 9.9e-05, 1e-06, -5e-05; boundary cases 9.999e-05 -> '0.0001'
    // (rounds up, positional) and 4e-07 -> '0.0' (rounds to zero)
    val df = Seq(0.00005, 0.000015, 0.00001, 0.000099, 0.000001,
      -0.00005, 0.00009999, 0.0000004, 0.0001)
      .toDF("lat").withColumn("lon", lit(79.0))
    val names = Timeseries.stationRegistry(df, Seq("lat", "lon"), "wrf")
      .select("station_name").as[String].collect().toSet
    assert(names === Set(
      "wrf_5e-05_79.0", "wrf_1.5e-05_79.0", "wrf_1e-05_79.0",
      "wrf_9.9e-05_79.0", "wrf_1e-06_79.0", "wrf_-5e-05_79.0",
      "wrf_0.0001_79.0", "wrf_0.0_79.0"))
  }

  test("A20 seasonalAnomaly measures departure from the same-hour climatology") {
    val h = 3600000000L // one hour of µs
    val df = Seq(
      ("a", 0 * h, 10.0),  // hour 0
      ("a", 24 * h, 20.0), // hour 0, next day  → clim(a, 0) = 15
      ("a", 1 * h, 7.0),   // hour 1, single    → clim(a, 1) = 7
      ("b", 0 * h, 100.0)  // other key, hour 0 → clim(b, 0) = 100
    ).toDF("k", "ts_us", "v").withColumn("vd", col("v").cast("decimal(14,2)"))
    val out = Timeseries.seasonalAnomaly(df, "k", "ts_us", "vd")
      .select("k", "hour_of_day", "v", "clim_value", "anomaly")
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(out === Set(
      ("a", 0L, 10.0, 15.0, -5.0), ("a", 0L, 20.0, 15.0, 5.0),
      ("a", 1L, 7.0, 7.0, 0.0), ("b", 0L, 100.0, 100.0, 0.0)))
  }

  test("A20 seasonalAnomaly plans one exchange, no sort") {
    val df = Seq(("a", 0L, 1.0)).toDF("k", "ts_us", "v")
    val plan = Timeseries.seasonalAnomaly(df, "k", "ts_us", "v")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length == 2, s"expected 1 exchange:\n$plan")
  }

  test("A10 tmsId is deterministic in the metadata tuple") {
    val df = Seq(("s1", "stA", "src", "rain", "mm")).toDF("sim", "st", "src", "vr", "un")
    val cols = Seq("sim", "st", "src", "vr", "un")
    val a = Timeseries.tmsId(df, cols).select("tms_id").as[String].head()
    val b = Timeseries.tmsId(df, cols).select("tms_id").as[String].head()
    assert(a === b && a.length === 32)
  }

  test("A10 tmsId encoding is injective across null position and ':' in values") {
    def id(t: (Option[String], Option[String], Option[String])): String =
      Timeseries.tmsId(Seq(t).toDF("a", "b", "c"), Seq("a", "b", "c"))
        .select("tms_id").as[String].head()
    // concat_ws skipped nulls: these collided before
    assert(id((Some("x"), None, Some("y"))) !== id((Some("x"), Some("y"), None)))
    // ':' inside a value shifted the boundary: these collided before
    assert(id((Some("a:b"), Some("c"), None)) !== id((Some("a"), Some("b:c"), None)))
    // null is distinguishable from the string "null"
    assert(id((Some("null"), Some("y"), None)) !== id((None, Some("y"), None)))
  }

  test("A13 asofJoinLatest returns the matched NULL value, not an older fill") {
    // right at rt=10 matched but its VALUE is null — the ASOF LEFT
    // JOIN semantics return that null, never forward-fill rt=5's 3.0
    val left = Seq(("k", 12L)).toDF("k", "t")
    val right = Seq(("k", 5L, Some(3.0)), ("k", 10L, None: Option[Double]))
      .toDF("k", "rt", "rv")
    val out = Timeseries.asofJoinLatest(left, right, "k", "t", "rt", "rv")
      .select("asof_value").collect().head
    assert(out.isNullAt(0), s"expected matched NULL, got $out")
  }

  test("A9 stationRegistry propagates a NULL coordinate to a NULL name/id") {
    val df = Seq((None: Option[Double], Some(79.85)), (Some(6.9), Some(79.85)))
      .toDF("lat", "lon")
    val out = Timeseries.stationRegistry(df, Seq("lat", "lon"), "wrf")
      .select("station_name", "station_id").collect()
    val names = out.map(r => Option(r.getString(0))).toSet
    // the null-lat row yields a NULL name and id — not "wrf_null_79.85"
    assert(names === Set(None, Some("wrf_6.9_79.85")))
    assert(out.count(_.isNullAt(1)) === 1)
  }

  test("A11 fgtWatermark is max per key") {
    val df = Seq(("a", 1L), ("a", 9L), ("b", 4L)).toDF("k", "fgt")
    val out = Timeseries.fgtWatermark(df, "k", "fgt")
      .orderBy("k").collect().toSeq.map(_.toSeq)
    assert(out === Seq(Seq("a", 9L), Seq("b", 4L)))
  }

  test("A12 gapFillForward carries the last non-null forward, leading nulls stay") {
    val df = Seq(("a", 1L, 1L, None), ("a", 2L, 2L, Some(5.0)),
                 ("a", 3L, 3L, None), ("a", 4L, 4L, Some(7.0)))
      .toDF("k", "t", "id", "v")
    val out = Timeseries.gapFillForward(df, "k", "t", "id", "v")
      .orderBy("t").select("filled").collect().toSeq.map(_.toSeq)
    assert(out === Seq(Seq(null), Seq(5.0), Seq(5.0), Seq(7.0)))
  }

  test("A17 interpLinear time-weights interior gaps, back/forward-fills edges") {
    val df = Seq(
      ("a", 0L, 1L, None),             // leading null → backfill to 1.0
      ("a", 10L, 2L, Some(1.0)),
      ("a", 20L, 3L, None),            // 1 + 3·(10/30) = 2.0
      ("a", 30L, 4L, None),            // 1 + 3·(20/30) = 3.0
      ("a", 40L, 5L, Some(4.0)),
      ("a", 50L, 6L, None)             // trailing null → forward fill 4.0
    ).toDF("k", "t", "id", "v")
    val out = Timeseries.interpLinear(df, "k", "t", "id", "v")
      .orderBy("t").select("interp").as[Option[Double]].collect().toSeq
    assert(out === Seq(Some(1.0), Some(1.0), Some(2.0), Some(3.0), Some(4.0), Some(4.0)))
    // an all-null series stays null
    val empty = Timeseries.interpLinear(
      Seq(("b", 1L, 1L, Option.empty[Double])).toDF("k", "t", "id", "v"),
      "k", "t", "id", "v").select("interp").as[Option[Double]].head()
    assert(empty === None)
  }

  test("A18 rollingStats computes trailing k-row sum/count/mean") {
    val df = (1 to 6).map(i => ("a", i.toLong, i.toLong, i.toDouble))
      .toDF("k", "t", "id", "v")
      .withColumn("vd", col("v").cast("decimal(14,2)"))
    val out = Timeseries.rollingStats(df, "k", "t", "id", "vd", k = 3)
      .orderBy("t").select("roll_sum", "roll_n", "roll_mean")
      .as[(Double, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1.0, 1L, 1.0), (3.0, 2L, 1.5), (6.0, 3L, 2.0),
      (9.0, 3L, 3.0), (12.0, 3L, 4.0), (15.0, 3L, 5.0)))
  }

  test("A19 ewma matches the hand recurrence, partition-invariant") {
    val dfn = Seq((1L, 1L, 1L, 10.0), (1L, 2L, 2L, 20.0), (1L, 3L, 3L, 10.0),
                  (2L, 1L, 1L, 5.0)).toDF("k", "t", "id", "v")
    val out = Timeseries.ewma(dfn, "k", "t", "id", "v", alpha = 0.3)
      .orderBy("k", "t").select("ewma").as[Double].collect().toSeq
    // e1=10; e2=.3·20+.7·10=13; e3=.3·10+.7·13=12.1; b: 5
    assert(out === Seq(10.0, 13.0, 12.1, 5.0))
    val rep = Timeseries.ewma(dfn.repartition(5), "k", "t", "id", "v", 0.3)
      .orderBy("k", "t").select("ewma").as[Double].collect().toSeq
    assert(rep === out)
  }

  test("A16 zscoreOutliers flags only the spike, constant series flag nothing") {
    val base = (1 to 10).map(i => ("a", i.toLong, i.toLong, 0.0)) :+
      (("a", 11L, 11L, 100.0))                    // z ≈ 3.16
    val flat = (1 to 5).map(i => ("c", i.toLong, i.toLong, 2.0)) // σ = 0
    val df = (base ++ flat).toDF("k", "t", "id", "v")
      .withColumn("vd", col("v").cast("decimal(14,2)"))
    val out = Timeseries.zscoreOutliers(df, "k", "t", "id", "v", "vd", 3.0)
      .select("id", "z").as[(Long, Double)].collect().toSeq
    assert(out.map(_._1) === Seq(11L))
    assert(math.abs(out.head._2 - 3.162278) < 1e-6)
  }
}
