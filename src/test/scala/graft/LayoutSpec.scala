package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout (r12): key correctness, content round-trip, and the
  * measured point of the exercise — a z-clustered table concentrates
  * a 2-D rectangle's rows in few files where a linearly-sorted one
  * prunes on its sort dim only. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zkey2 interleaves bits: a in even positions, b in odd") {
    // a = 3 (0b11) -> bits 0,2 = 5; b = 5 (0b101) -> bits 1,5 = 34
    val out = Seq((3L, 5L), (0L, 0L), (0xFFFFL, 0L), (0L, 0xFFFFL))
      .toDF("a", "b")
      .select(Layout.zkey2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(39L, 0L, 0x55555555L, 0xAAAAAAAAL))
    // monotone blocks: the 4 quadrant corners of a 2-bit space order
    // as the z curve visits them
    val quad = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).toDF("a", "b")
      .select(Layout.zkey2(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(quad === Seq(0L, 1L, 2L, 3L))
  }

  test("rangeBucket: fixed integer chunks, full range lands in [0, 2^bits)") {
    val b = Seq(0L, 99L, 100L, 9999L, 10000L * 100 - 1)
      .toDF("c")
      .select(Layout.rangeBucket(col("c"), 0L, 10000L * 100 - 1, 10).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b.head === 0L && b.last === (1L << 10) - 1)
    assert(b.forall(x => x >= 0 && x < (1L << 10)))
  }

  test("rangeBucket: a span within 2^bits of Long.MaxValue buckets without overflow") {
    // passes the BigInt span require, but the additive ceil trick
    // (span + 2^bits - 1) wraps negative here — the width must come
    // from overflow-free division (r12 ADVICE)
    val hi = Long.MaxValue - 2L
    val b = Seq(0L, hi / 2, hi).toDF("c")
      .select(Layout.rangeBucket(col("c"), 0L, hi, 16).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b.forall(x => x >= 0 && x < (1L << 16)), b.toString)
    assert(b === b.sorted && b.head === 0L && b.last === (1L << 16) - 1,
      b.toString)
  }

  test("zkeyN: 3-dim interleave bit positions; every dim of a 3-D box prunes") {
    // dim j's bit i lands at position i*3 + j
    val keys = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (1L, 1L, 1L),
        (2L, 0L, 0L)).toDF("a", "b", "c")
      .select(Layout.zkeyN(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(keys === Seq(1L, 2L, 4L, 7L, 8L))
    // a 50×50×8 grid clustered on all three dims: a narrow slab on
    // ANY single dim reads a strict subset of the files
    val df3 = spark.range(20000).select(
      (col("id") % 50).as("x"), ((col("id") / 50) % 50).cast("long").as("y"),
      ((col("id") / 2500) % 8).cast("long").as("zz"), col("id"))
    val base = java.nio.file.Files.createTempDirectory("graft_l3").toString
    Layout.writeZorderedN(df3, s"$base/z3", Seq("x", "y", "zz"), files = 27)
    val z3 = spark.read.parquet(s"$base/z3")
    assert(z3.count() === 20000L)
    def hit(p: org.apache.spark.sql.Column): Long =
      z3.filter(p).select(input_file_name()).distinct().count()
    val (hx, hy, hz) =
      (hit(col("x") < 7), hit(col("y") < 7), hit(col("zz") === 0))
    assert(hx < 27 && hy < 27 && hz < 27, s"$hx/$hy/$hz of 27")
    // the 3-D box reads no more files than its loosest single-dim slab
    val box = hit(col("x") < 7 && col("y") < 7 && col("zz") === 0)
    assert(box <= Seq(hx, hy, hz).min, s"box=$box vs $hx/$hy/$hz")
  }

  test("writeZordered round-trips content and prunes 2-D rectangles where a linear sort cannot") {
    val sf01 = "/root/testdata/sf0.01" // 10k events: enough rows for 16 files
    val e = Tables.events(spark, sf01)
    val ev = e.select(col("event_id"), col("user_id"),
      Tables.eventTsUs(e).as("ts_us"), col("event_type"), col("value"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    Layout.writeZordered(ev, s"$base/z", "user_id", "ts_us", files = 16)
    // the linear strawman: same file count, sorted on user_id only
    ev.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.parquet(s"$base/lin")
    val z = spark.read.parquet(s"$base/z")
    val lin = spark.read.parquet(s"$base/lin")
    // row-identical content — the layout never touches the rows
    assert(z.orderBy("event_id").collect().toSeq ===
      ev.orderBy("event_id").collect().toSeq)
    assert(z.inputFiles.length === 16 && lin.inputFiles.length === 16)
    def filesHit(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    // a ts-only predicate (first day of the ~26-day range): the
    // user-sorted layout scatters it over every file; the z layout
    // concentrates it — parquet min/max on ts then skips the rest
    val day1 = col("ts_us") >= 1704067200000000L &&
      col("ts_us") < 1704153600000000L
    val zTs = filesHit(z.filter(day1))
    val linTs = filesHit(lin.filter(day1))
    assert(linTs === 16L, s"user-sorted layout should scatter ts: $linTs")
    assert(zTs * 2 <= linTs, s"z layout files for ts-only: $zTs vs $linTs")
    // the 2-D rectangle: strictly fewer files than its own ts-only
    // superset — both dims prune together
    val rect = day1 && col("user_id").between(40, 59)
    assert(filesHit(z.filter(rect)) <= zTs)
    // and the predicate reaches the scan (row-group pruning rides
    // the same footer stats)
    val plan = z.filter(rect).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ts_us"),
      s"expected pushed filters in:\n$plan")
  }
}
