package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.streaming.EventStream
import graft.streaming.EventStream.{CumulReading, IntervalDelta}

class SkewStatefulSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals the unsalted groupBy on a skewed key") {
    // hot key: 90% of rows on one key
    val df = ((1 to 900).map(i => ("hot", i.toLong, 1.0)) ++
      (1 to 100).map(i => (s"k${i % 7}", 1000L + i, 2.0))).toDF("k", "id", "v")
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", saltBy = "id", salts = 8)
      .orderBy("k").collect().toSeq.map(_.toSeq)
    val plain = df.groupBy("k").agg(sum("v").as("value"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq.map(_.toSeq)
    assert(salted === plain)
  }

  test("saltedSumCount spreads the hot key across salt partitions in phase 1") {
    val df = (1 to 100).map(i => ("hot", i.toLong, 1.0)).toDF("k", "id", "v")
    val nSalts = df.select(Skew.saltCol(col("id"), 8)).distinct().count()
    assert(nSalts > 4) // 100 ids across 8 salt slots: all (or nearly all) hit
  }

  test("streamingIntervalDiff diffs across micro-batch boundaries via state") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = new Timestamp(1577836800000L + min * 60000L)
    val mem = MemoryStream[CumulReading]
    val q = EventStream.streamingIntervalDiff(mem.toDS())
      .writeStream.format("memory").queryName("sid").outputMode("append").start()
    // batch 1: cumulative 5, 8 for s1; 100 for s2
    mem.addData(CumulReading("s1", t(0), 5.0), CumulReading("s1", t(15), 8.0),
      CumulReading("s2", t(0), 100.0))
    q.processAllAvailable()
    // batch 2: s1 continues from 8 (state), s2 from 100
    mem.addData(CumulReading("s1", t(30), 10.0), CumulReading("s2", t(15), 104.0))
    q.processAllAvailable()
    val out = spark.table("sid").as[IntervalDelta].collect()
      .map(d => (d.station, d.ts.getTime / 60000 % 1000, d.delta)).sorted.toSeq
    q.stop()
    assert(out === Seq(
      ("s1", 295, 3.0),   // t(15): 8-5 within batch 1
      ("s1", 310, 2.0),   // t(30): 10-8 ACROSS batches — state carried
      ("s2", 295, 4.0)))  // t(15): 104-100 across batches
  }

  test("streamingIntervalDiff drops late and duplicate cross-batch events") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = new Timestamp(1577836800000L + min * 60000L)
    val mem = MemoryStream[CumulReading]
    val q = EventStream.streamingIntervalDiff(mem.toDS())
      .writeStream.format("memory").queryName("sid_late").outputMode("append").start()
    mem.addData(CumulReading("s1", t(0), 5.0), CumulReading("s1", t(15), 8.0))
    q.processAllAvailable()
    // batch 2: a LATE event (t(10) < state's t(15)) and a replayed
    // duplicate (t(15)) — diffing either would regress the cumulative
    // state (phantom negative delta) and double-count the next
    // interval; both must be dropped. The in-order t(30) still diffs
    // against the ORIGINAL state value 8.
    mem.addData(CumulReading("s1", t(10), 6.0), CumulReading("s1", t(15), 8.0),
      CumulReading("s1", t(30), 10.0))
    q.processAllAvailable()
    val out = spark.table("sid_late").as[IntervalDelta].collect()
      .map(d => (d.station, d.ts.getTime / 60000 % 1000, d.delta)).sorted.toSeq
    q.stop()
    assert(out === Seq(("s1", 295, 3.0), ("s1", 310, 2.0)))
  }
}
