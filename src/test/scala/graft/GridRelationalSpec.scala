package graft

import org.apache.spark.sql.functions._
import graft.operators.{Grid, Relational}

class GridRelationalSpec extends SparkSpec {
  import spark.implicits._

  test("B1/B2 rfieldFlatten aggregates per cell sorted by (lon, lat); bbox cuts the extent") {
    val grid = Seq((0L, 1.0), (0L, 2.0), (10L, 5.0)).toDF("user_id", "v")
    val derived = Grid.deriveGrid(grid, "user_id")
    val flat = Grid.rfieldFlatten(derived, "v").collect().toSeq.map(_.toSeq)
    // user 0 → (lat 6.0, lon 79.0) sum 3.0 ; user 10 → (lat 6.0, lon 79.25)
    assert(flat === Seq(Seq(79.0, 6.0, 3.0), Seq(79.25, 6.0, 5.0)))
    val cut = Grid.bboxFilter(Grid.rfieldFlatten(derived, "v"), 79.0, 79.1, 5.0, 7.0)
    assert(cut.count() === 1)
  }

  test("B3 nearestGridPoint picks the argmin cell with deterministic tie-break") {
    val stations = Seq(("s1", 6.1, 79.1), ("s2", 6.9, 79.9))
      .toDF("station_id", "s_lat", "s_lon")
    val grid = Seq((6.0, 79.0), (6.25, 79.25), (7.0, 80.0)).toDF("lat", "lon")
    val out = Grid.nearestGridPoint(stations, grid)
      .orderBy("station_id").select("station_id", "g_lat", "g_lon")
      .collect().toSeq.map(_.toSeq)
    assert(out === Seq(Seq("s1", 6.0, 79.0), Seq("s2", 7.0, 80.0)))
  }

  test("B3 nearestGridPoint passes extra station attributes through") {
    import spark.implicits._
    val stations = Seq(("s1", 6.1, 79.1, "Colombo", 7.5), ("s2", 6.9, 79.9, "Kandy", 500.0))
      .toDF("station_id", "s_lat", "s_lon", "name", "elev_m")
    val grid = Seq((6.0, 79.0), (7.0, 80.0)).toDF("lat", "lon")
    val out = Grid.nearestGridPoint(stations, grid).orderBy("station_id")
    // every station column survives, best cell appended
    assert(out.columns.toSeq ===
      Seq("station_id", "s_lat", "s_lon", "name", "elev_m", "g_lat", "g_lon", "d2"))
    val rows = out.select("station_id", "name", "elev_m", "g_lat").collect().toSeq.map(_.toSeq)
    assert(rows === Seq(Seq("s1", "Colombo", 7.5, 6.0), Seq("s2", "Kandy", 500.0, 7.0)))
  }

  test("B3 nearestGridPoint: duplicate ids keep per-row argmins, null ids survive") {
    // a dirty registry: two rows share 's1' at DIFFERENT coords (each
    // must keep its OWN nearest cell, not a mixed argmin stamped on
    // both) and one row has a null id (must not vanish in the
    // join-back)
    val stations = Seq((Some("s1"), 6.1, 79.1), (Some("s1"), 6.9, 79.9),
        (None: Option[String], 6.1, 79.1))
      .toDF("station_id", "s_lat", "s_lon")
    val grid = Seq((6.0, 79.0), (7.0, 80.0)).toDF("lat", "lon")
    val out = Grid.nearestGridPoint(stations, grid)
      .select("station_id", "s_lat", "g_lat").orderBy("s_lat", "station_id")
      .collect().toSeq.map(_.toSeq)
    assert(out === Seq(
      Seq(null, 6.1, 6.0), Seq("s1", 6.1, 6.0), Seq("s1", 6.9, 7.0)))
  }

  test("B5 regrid coarsens 0.25° cells into 0.5° blocks conserving the sum") {
    import spark.implicits._
    val fine = Seq((79.0, 6.0, 1.0), (79.25, 6.25, 2.0),   // same 0.5° block
                   (79.5, 6.0, 4.0), (79.75, 6.25, 8.0))   // next block east
      .toDF("lon", "lat", "v").withColumn("vd", col("v").cast("decimal(14,2)"))
    val out = graft.operators.Grid.regrid(fine, 0.5, "vd")
      .orderBy("lon_c").collect().map(r =>
        (r.getDouble(0), r.getDouble(1), r.getDecimal(2).doubleValue())).toSeq
    assert(out === Seq((79.0, 6.0, 3.0), (79.5, 6.0, 12.0)))
  }

  test("B4 idw recovers a station's value at its own location, blends in between") {
    import spark.implicits._
    val stations = Seq((0.0, 0.0, 10.0), (1.0, 0.0, 20.0))
      .toDF("s_lon", "s_lat", "s_val")
    val mesh = Seq((0.0, 0.0), (0.5, 0.0), (1.0, 0.0)).toDF("lon", "lat")
    val out = graft.operators.Grid.idw(mesh, stations)
      .orderBy("lon").select("idw_value").as[Double].collect().toSeq
    // at a station: its (floored-d²) weight dwarfs the other's → its value
    assert(math.abs(out.head - 10.0) < 1e-6)
    assert(math.abs(out.last - 20.0) < 1e-6)
    // midpoint: equal weights → plain mean
    assert(math.abs(out(1) - 15.0) < 1e-6)
  }

  test("C4 topKPerGroup returns k rows per group ordered desc with tie-break") {
    val df = Seq(("g1", 10.0, 1L), ("g1", 30.0, 2L), ("g1", 30.0, 3L), ("g1", 5.0, 4L),
                 ("g2", 1.0, 5L)).toDF("g", "x", "id")
    val out = Relational.topKPerGroup(df, "g", "x", "id", 2)
      .orderBy("g", "id").select("id").as[Long].collect()
    assert(out.toSeq === Seq(2L, 3L, 5L))
  }

  test("C5 q14 promo share is a percentage in (0, 100) on sf0.001") {
    val pct = Relational.q14PromoRevenue(
        Tables.part(spark, sfDir), Tables.lineitem(spark, sfDir))
      .as[Double].head()
    assert(pct > 0.0 && pct < 100.0)
  }

  test("A14 cumulative is the exact inverse of A1 intervalDiff") {
    val df = Seq(("a", 1L, 1L, 3.0), ("a", 2L, 2L, 4.0), ("a", 3L, 3L, 10.0))
      .toDF("k", "t", "id", "v")
    val cum = graft.operators.Timeseries.cumulative(df, "k", "t", "id", "v")
      .withColumnRenamed("cum_value", "cv")
    val back = graft.operators.Timeseries.intervalDiff(cum, "k", "t", "id", "cv")
      .orderBy("t").select("delta").as[Double].collect()
    assert(back.toSeq === Seq(4.0, 10.0)) // diffs of cumsum = original values
  }

  test("C6 q18 keeps exactly the orders whose lineitem qty clears the threshold") {
    import graft.operators.Relational
    val li = Tables.lineitem(spark, sfDir)
    val out = Relational.q18LargeOrders(
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir), li, 140)
    val keys = out.select("o_orderkey").as[Long].collect().toSet
    val want = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("q"))
      .filter(col("q") > 140)
      .select(col("l_orderkey").cast("long")).as[Long].collect().toSet
    assert(keys === want && keys.nonEmpty)
    // every qualifying order appears exactly once (customer join is 1:1)
    assert(out.count() === keys.size)
  }

  test("C8 q21: semi/anti planned as equi-joins (no BNLJ), brute-force parity") {
    import graft.operators.Relational
    val out = Relational.q21WaitingOrders(
      Tables.nation(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir),
      "NATION_19")
    // plan pin: EXISTS → LeftSemi, NOT EXISTS → LeftAnti, both as
    // hash/sort-merge EQUI-joins on the order key with the supplier
    // inequality as residual — never a nested-loop product
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
    // brute-force parity on sf0.001: recompute the sole-late-supplier
    // property per (order, supplier) with plain collections
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").cast("long"), col("l_suppkey").cast("long"),
        col("l_shipdate").cast("long")).as[(Long, Long, Long)].collect()
    val ordF = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").cast("long"), col("o_orderdate").cast("long"))
      .as[(Long, Long)].collect().toMap
    val suppName = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir).filter(col("n_name") === "NATION_19"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").cast("long"), col("s_name"))
      .as[(Long, String)].collect().toMap
    val byOrder = li.groupBy(_._1)
    val lateBy = 60L * 86400L // 60 days in seconds (timestamp cast long = epoch s)
    val want = li.iterator.flatMap { case (ok, sk, ship) =>
      ordF.get(ok).toSeq.flatMap { od =>
        val others = byOrder(ok).filter(_._2 != sk)
        val late = ship > od + lateBy
        val othersExist = others.nonEmpty
        val otherLate = others.exists(r => r._3 > od + lateBy)
        if (late && othersExist && !otherLate) suppName.get(sk) else None
      }
    }.toSeq.groupBy(identity).map { case (n, o) => n -> o.size.toLong }
    val got = out.select(col("s_name"), col("numwait"))
      .as[(String, Long)].collect().toMap
    assert(got === want && got.nonEmpty)
  }

  test("C9 q22: scalar-threshold cross is the only BNLJ, anti-join planned, brute-force parity") {
    import graft.operators.Relational
    val out = Relational.q22DormantCapital(
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir))
    val plan = out.queryExecution.executedPlan.toString
    // NOT EXISTS → LeftAnti equi-join; the single BNLJ is the
    // declared one-row scalar-aggregate broadcast cross (the Q22
    // scalar-subquery spelling), never a row-by-row product
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastNestedLoop".r.findAllIn(plan).size <= 1, plan)
    // brute-force parity with plain collections + BigDecimal (the
    // same scale-2 HALF_UP rounding as the dec2 cast)
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("int"),
        col("c_acctbal")).as[(Long, Int, Double)].collect()
    val pos = cust.filter(_._3 > 0)
    val (sPos, nPos) = (pos.map(c => d2(c._3)).sum, pos.length)
    val cutoff = java.sql.Timestamp.valueOf("2000-01-01 00:00:00").getTime / 1000L
    val active = Tables.orders(spark, sfDir)
      .select(col("o_custkey").cast("long"), col("o_orderdate").cast("long"))
      .as[(Long, Long)].collect()
      .filter(_._2 >= cutoff).map(_._1).toSet
    val want = cust.iterator
      .filter(c => d2(c._3) * nPos > sPos && !active.contains(c._1))
      .toSeq.groupBy(_._2)
      .map { case (nk, cs) =>
        nk -> (cs.size.toLong, cs.map(c => d2(c._3)).sum.toDouble) }
    val got = out.select(col("c_nationkey"), col("n_cust"), col("total_bal"))
      .as[(Int, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === want && got.nonEmpty)
  }

  test("C10 q15: winners are exactly the max-revenue suppliers, ties all surface, no BNLJ") {
    import spark.implicits._
    import graft.operators.Relational
    val out = Relational.q15TopSupplier(
        Tables.supplier(spark, sfDir), Tables.lineitem(spark, sfDir))
      .select("s_suppkey", "total_rev").as[(Long, Double)].collect()
    assert(out.nonEmpty)
    // driver-side parity: recompute per-supplier revenue in BigDecimal
    // and check the winner set is exactly the argmax set
    val rows = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
      .select(col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(6,4)") -
            col("l_discount").cast("decimal(6,4)"))).as("r"))
      .as[(Long, java.math.BigDecimal)].collect()
    val bySupp = rows.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(_._2).reduce(_.add(_)) }
    val mx = bySupp.values.max(Ordering.by((b: java.math.BigDecimal) => b))
    val winners = bySupp.collect {
      case (k, v) if v.compareTo(mx) == 0 => k }.toSet
    assert(out.map(_._1).toSet === winners)
    out.foreach { case (_, r) => assert(r === mx.doubleValue()) }
    // a forced revenue tie surfaces BOTH suppliers (the Q15 contract)
    val li = Seq(
      (1L, java.sql.Timestamp.valueOf("1998-02-01 00:00:00"), 100.0, 0.0),
      (2L, java.sql.Timestamp.valueOf("1998-02-02 00:00:00"), 50.0, 0.0),
      (2L, java.sql.Timestamp.valueOf("1998-02-03 00:00:00"), 50.0, 0.0),
      (3L, java.sql.Timestamp.valueOf("1998-02-04 00:00:00"), 10.0, 0.0)
    ).toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val sup = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("s_suppkey", "s_name")
    val tied = Relational.q15TopSupplier(sup, li)
      .select("s_suppkey").as[Long].collect().toSet
    assert(tied === Set(1L, 2L))
    // plan: no BNLJ anywhere — the scalar max joins back as an
    // equi-join on the revenue value
    val plan = Relational.q15TopSupplier(
        Tables.supplier(spark, sfDir), Tables.lineitem(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("C11 q17: qualifying set matches a driver BigDecimal reference, both branches live") {
    import spark.implicits._
    import graft.operators.Relational
    val got = Relational.q17SmallQtyRevenue(
        Tables.part(spark, sfDir), Tables.lineitem(spark, sfDir))
      .as[Double].head()
    // driver-side reference: exact BigDecimal per-part stats and the
    // same cross-multiplied predicate
    val brandParts = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#19")
      .select("p_partkey").as[Long].collect().toSet
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        col("l_quantity").cast("decimal(12,2)"),
        col("l_extendedprice").cast("decimal(12,2)"))
      .as[(Long, java.math.BigDecimal, java.math.BigDecimal)].collect()
      .filter(r => brandParts.contains(r._1))
    val byPart = rows.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.map(_._2).reduce(_.add(_)), xs.length.toLong)) }
    val qual = rows.filter { case (k, q, _) =>
      val (sq, c) = byPart(k)
      q.multiply(java.math.BigDecimal.valueOf(5 * c)).compareTo(sq) < 0 }
    assert(qual.nonEmpty && qual.length < rows.length) // both branches
    val want = qual.map(_._3).reduce(_.add(_)).doubleValue() / 7.0
    assert(got === want)
  }

  test("C1 q1 on sf0.001 matches aggregate invariants") {
    val li = Tables.lineitem(spark, sfDir)
    val out = Relational.q1PricingSummary(li)
    val total = out.agg(sum("count_order")).as[Long].head()
    val filtered = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total === filtered)
    // avg_qty is exactly sum_qty / count per group
    val bad = out.filter(abs(col("avg_qty") - col("sum_qty") / col("count_order")) > lit(1e-9)).count()
    assert(bad === 0)
  }

  test("C12 q13: LEFT OUTER kept (zero bucket real), filter below the join, driver parity") {
    val out = Relational.q13OrderDistribution(
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftOuter") && !plan.contains("BroadcastNestedLoop"),
      plan)
    // driver parity: per-customer qualifying-order counts by hand
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long")).as[Long].collect()
    val perCust = Tables.orders(spark, sfDir)
      .filter(!col("o_orderpriority").contains("I"))
      .select(col("o_custkey").cast("long")).as[Long].collect()
      .groupBy(identity).map { case (c, o) => c -> o.length.toLong }
    val want = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).map { case (n, cs) => n -> cs.length.toLong }
    val got = out.select(col("c_count"), col("custdist"))
      .as[(Long, Long)].collect().toMap
    assert(got === want && got.nonEmpty)
    // every customer lands in exactly one bucket — the outer join
    // dropped nobody (and the zero bucket is populated at this sf)
    assert(got.values.sum === custs.length.toLong)
    assert(got.contains(0L))
  }

  test("C13 q20: three LeftSemi equi-joins (no BNLJ), driver parity on the qualifying set") {
    val out = Relational.q20PotentialPromotion(
      Tables.nation(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.part(spark, sfDir), Tables.lineitem(spark, sfDir),
      namePattern = "%a%", minQty = 20L)
    val plan = out.queryExecution.executedPlan.toString
    assert("LeftSemi".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
    // driver parity with plain collections
    val pk = Tables.part(spark, sfDir).filter(col("p_name").contains("a"))
      .select(col("p_partkey").cast("long")).as[Long].collect().toSet
    val cut = java.time.Instant.parse("1996-01-01T00:00:00Z").getEpochSecond
    val heavy = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").cast("long"), col("l_partkey").cast("long"),
        col("l_shipdate").cast("long"), col("l_quantity"))
      .as[(Long, Long, Long, Double)].collect()
      .filter(r => r._3 >= cut && pk(r._2))
      .groupBy(r => (r._1, r._2))
      .collect { case ((sk, _), rs) if rs.map(r =>
        BigDecimal(r._4).setScale(2)).sum > BigDecimal(20) => sk }
      .toSet
    val nk = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_11",
        "NATION_19", "NATION_22"))
      .select(col("n_nationkey").cast("long")).as[Long].collect().toSet
    val want = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"),
        col("s_name")).as[(Long, Long, String)].collect()
      .filter(r => nk(r._2) && heavy(r._1)).map(_._3).toSet
    val got = out.select(col("s_name")).as[String].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("C14 q6: zero joins, predicates at the scan, BigDecimal parity") {
    val out = Relational.q6ForecastRevenue(Tables.lineitem(spark, sfDir))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"), plan)
    val lo = java.time.Instant.parse("1996-01-01T00:00:00Z").getEpochSecond
    val hi = java.time.Instant.parse("1997-01-01T00:00:00Z").getEpochSecond
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate").cast("long"), col("l_extendedprice"),
        col("l_discount"), col("l_quantity"))
      .as[(Long, Double, Double, Double)].collect()
      .filter { case (sd, _, d, q) =>
        sd >= lo && sd < hi && q < 24 &&
          BigDecimal(d).setScale(4) >= BigDecimal("0.05") &&
          BigDecimal(d).setScale(4) <= BigDecimal("0.07") }
      .map { case (_, p, d, _) =>
        BigDecimal(p).setScale(2) * BigDecimal(d).setScale(4) }
      .sum
    val got = out.as[Double].head()
    assert(got === want.toDouble && got > 0.0)
  }

  test("C15 q4: EXISTS as one LeftSemi, driver parity on late-order counts") {
    val out = Relational.q4OrderPriority(
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && !plan.contains("BroadcastNestedLoop"),
      plan)
    val lo = java.time.Instant.parse("1996-01-01T00:00:00Z").getEpochSecond
    val hi = java.time.Instant.parse("1996-07-01T00:00:00Z").getEpochSecond
    val shipByOrder = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").cast("long"), col("l_shipdate").cast("long"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val want = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long"), col("o_orderdate").cast("long"),
        col("o_orderpriority")).as[(Long, Long, String)].collect()
      .filter { case (ok, od, _) => od >= lo && od < hi &&
        shipByOrder.getOrElse(ok, Array.empty[(Long, Long)])
          .exists(_._2 > od + 30L * 86400L) }
      .groupBy(_._3).map { case (p, os) => p -> os.length.toLong }
    val got = out.as[(String, Long)].collect().toMap
    assert(got === want && got.nonEmpty)
  }

  test("C16 q10: top-k planned as TakeOrderedAndProject (no global sort), exact-decimal cutoff parity") {
    val out = Relational.q10ReturnedItems(
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
    val plan = out.queryExecution.executedPlan.toString
    // the limit rides the order as a per-partition top-k + merge —
    // never a full exchange-and-sort of the grouped frame
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    val lo = java.time.Instant.parse("1996-01-01T00:00:00Z").getEpochSecond
    val hi = java.time.Instant.parse("1996-04-01T00:00:00Z").getEpochSecond
    val ordWin = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        col("o_orderdate").cast("long")).as[(Long, Long, Long)].collect()
      .filter(r => r._3 >= lo && r._3 < hi).map(r => r._1 -> r._2).toMap
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").cast("long"), col("l_extendedprice"),
        col("l_discount")).as[(Long, Double, Double)].collect()
      .flatMap { case (ok, p, d) => ordWin.get(ok).map(c => c ->
        (BigDecimal(p).setScale(2) *
          (BigDecimal(1).setScale(4) - BigDecimal(d).setScale(4)))) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum }
    val want = rev.toSeq.sortBy { case (c, r) => (-r, c) }.take(20)
      .map { case (c, r) => (c, r.toDouble) }
    val got = out.select(col("c_custkey").cast("long"), col("revenue"))
      .as[(Long, Double)].collect().toSeq
    assert(got === want && got.size === 20)
  }

  test("C17 q12: one join, both conditional counts in one grouped pass, driver parity") {
    val out = Relational.q12PriorityShipping(
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
    val plan = out.queryExecution.executedPlan.toString
    // count actual join NODES (tree strings print e.g.
    // "SortMergeJoin [l_orderkey…], [o_orderkey…], Inner" — the
    // "Join type:" form exists only in EXPLAIN FORMATTED, so a pin on
    // it would be vacuous; r14 review)
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).size == 1 &&
      !plan.contains("BroadcastNestedLoop"), plan)
    val lo = java.time.Instant.parse("1996-01-01T00:00:00Z").getEpochSecond
    val hi = java.time.Instant.parse("1997-01-01T00:00:00Z").getEpochSecond
    val prio = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long"), col("o_orderpriority"))
      .as[(Long, String)].collect().toMap
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").cast("long"), col("l_linestatus"),
        col("l_shipdate").cast("long")).as[(Long, String, Long)].collect()
      .filter(r => r._3 >= lo && r._3 < hi)
      .groupBy(_._2).map { case (st, rs) =>
        val high = rs.count(r =>
          Set("1-URGENT", "2-HIGH")(prio(r._1)))
        st -> ((high.toLong, (rs.length - high).toLong)) }
    val got = out.as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === want && got.nonEmpty)
  }

  test("C18 q19: disjunction stays ONE broadcast hash join with pushed " +
      "per-side unions, driver parity") {
    val out = Relational.q19DiscountEligibility(
      Tables.part(spark, sfDir), Tables.lineitem(spark, sfDir))
    val plan = out.queryExecution.executedPlan.toString
    // the OR must NOT degrade the equi-join: exactly one hash join
    // node, never a nested loop; the quantity envelope reaches the
    // lineitem parquet scan as a pushed range filter
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).size == 1 &&
      plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      plan)
    val bands = Seq(("Brand#12", 1, 15, 1, 11), ("Brand#23", 1, 25, 10, 20),
      ("Brand#34", 1, 35, 20, 30))
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey").cast("long"), col("p_brand"), col("p_size"))
      .as[(Long, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("long"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .as[(Long, Double, Double, Double)].collect()
      .flatMap { case (pk, q, p, d) => parts.get(pk).collect {
        case (brand, size) if bands.exists(b => brand == b._1 &&
            size >= b._2 && size <= b._3 && q >= b._4 && q <= b._5) =>
          BigDecimal(p).setScale(2) *
            (BigDecimal(1).setScale(4) - BigDecimal(d).setScale(4))
      } }.sum
    val got = out.as[Double].head()
    assert(got === want.toDouble && got > 0.0)
  }

  test("C19 q8: market share — no nested loop, fact aggregated before " +
      "the supplier join, driver parity") {
    // hand mirror in exact BigDecimal, then pick the share nation
    // DYNAMICALLY (the most-supplying nation in the qualifying set) so
    // the numerator is non-zero at sf0.001 and the test can't pass
    // vacuously on an all-zeros share column
    val lo = java.time.Instant.parse("1995-01-01T00:00:00Z").getEpochSecond
    val hi = java.time.Instant.parse("1997-01-01T00:00:00Z").getEpochSecond
    val regionKey = Tables.region(spark, sfDir)
      .filter(col("r_name") === "AMERICA")
      .select(col("r_regionkey").cast("long")).as[Long].head()
    val nations = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .as[(Long, String, Long)].collect()
    val regionNations = nations.filter(_._3 == regionKey).map(_._1).toSet
    val custIn = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .as[(Long, Long)].collect()
      .filter(r => regionNations(r._2)).map(_._1).toSet
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        col("o_orderdate").cast("long")).as[(Long, Long, Long)].collect()
      .filter(r => r._3 >= lo && r._3 < hi && custIn(r._2))
      .map(r => r._1 ->
        java.time.Instant.ofEpochSecond(r._3)
          .atZone(java.time.ZoneOffset.UTC).getYear).toMap
    val econParts = Tables.part(spark, sfDir)
      .filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey").cast("long")).as[Long].collect().toSet
    val suppNation = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"))
      .as[(Long, Long)].collect()
      .map(r => r._1 -> nations.find(_._1 == r._2).get._2).toMap
    val vols = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"),
        col("l_suppkey").cast("long"), col("l_extendedprice"),
        col("l_discount")).as[(Long, Long, Long, Double, Double)].collect()
      .filter(r => econParts(r._2) && ord.contains(r._1))
      .map { case (ok, _, sk, p, d) => (ord(ok), suppNation(sk),
        BigDecimal(p).setScale(2) *
          (BigDecimal(1).setScale(4) - BigDecimal(d).setScale(4))) }
    assert(vols.nonEmpty, "fixture must populate the q8 star at sf0.001")
    val topNation = vols.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      .toSeq.maxBy(v => (v._2, v._1))._1
    val want = vols.groupBy(_._1).toSeq.sortBy(_._1).map { case (y, rs) =>
      val tot = rs.map(_._3).sum
      val sh = rs.filter(_._2 == topNation).map(_._3).sum
      (y, sh.toDouble / tot.toDouble)
    }
    val out = Relational.q8MarketShare(
      Tables.region(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir),
      Tables.part(spark, sfDir), shareNation = topNation)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"), plan)
    // exactly the seven equi-join nodes of the star spelling — a
    // collapsed/cross shape would change the count
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).size == 7, plan)
    val got = out.as[(Int, Double)].collect().toSeq
    assert(got === want && got.exists(_._2 > 0.0))
  }

  test("C20 rollup: one Expand+aggregate pass (no per-level re-shuffle), " +
      "subtotals exactly sum their details, driver parity") {
    val out = Relational.qRollupRevenue(
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
    val plan = out.queryExecution.executedPlan.toString
    // the grouping sets come from ONE Expand feeding ONE hash
    // aggregate chain — a per-level union spelling would multiply the
    // fact joins (3 here) per level
    assert(plan.contains("Expand"), plan)
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).size == 3 &&
      !plan.contains("BroadcastNestedLoop"), plan)
    val rows = out.as[(String, Int, Long, Double)].collect().toSeq
    // exact-decimal internal sums: each nation subtotal equals the
    // exact sum of its detail rows at the double edge, and the grand
    // total equals the sum of subtotals
    val details = rows.filter(_._3 == 0L)
    val subs = rows.filter(_._3 == 1L)
    val grand = rows.filter(_._3 == 3L)
    assert(details.nonEmpty && subs.nonEmpty && grand.size == 1)
    assert(rows.size === details.size + subs.size + 1)
    // driver parity in BigDecimal (exact until the final double cast)
    val lo = java.time.Instant.parse("1995-01-01T00:00:00Z").getEpochSecond
    val hi = java.time.Instant.parse("1997-01-01T00:00:00Z").getEpochSecond
    val nat = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .as[(Long, String)].collect().toMap
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .as[(Long, Long)].collect().toMap
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        col("o_orderdate").cast("long")).as[(Long, Long, Long)].collect()
      .filter(r => r._3 >= lo && r._3 < hi)
      .map(r => r._1 -> ((nat(cust(r._2)),
        java.time.Instant.ofEpochSecond(r._3)
          .atZone(java.time.ZoneOffset.UTC).getYear))).toMap
    val vols = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").cast("long"), col("l_extendedprice"),
        col("l_discount")).as[(Long, Double, Double)].collect()
      .flatMap { case (ok, p, d) => ord.get(ok).map { case (n, y) =>
        (n, y, BigDecimal(p).setScale(2) *
          (BigDecimal(1).setScale(4) - BigDecimal(d).setScale(4))) } }
    def sums(key: ((String, Int, BigDecimal)) => (String, Int)) =
      vols.groupBy(key).view
        .mapValues(_.map(_._3).sum.toDouble).toMap
    val wantDetail = sums(v => (v._1, v._2))
    val wantSub = sums(v => (v._1, -1))
    val wantGrand = vols.map(_._3).sum.toDouble
    assert(details.map(r => (r._1, r._2) -> r._4).toMap === wantDetail)
    assert(subs.map(r => (r._1, r._2) -> r._4).toMap ===
      wantSub.map { case ((n, _), v) => (n, -1) -> v })
    assert(grand.head === (("ALL", -1, 3L, wantGrand)))
  }
}
