package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.PreparedStatement
import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sinks.JdbcUpsert
import graft.streaming.EventStream

class SinkStreamSpec extends SparkSpec {
  import spark.implicits._

  test("JdbcUpsert MySQL dialect builds INSERT .. ON DUPLICATE KEY UPDATE") {
    val sql = JdbcUpsert.MySqlDialect.sql("data", Seq("id", "time", "value", "fgt"), Seq("id", "time"))
    assert(sql === "INSERT INTO data (id, time, value, fgt) VALUES (?, ?, ?, ?) " +
      "ON DUPLICATE KEY UPDATE value = VALUES(value), fgt = VALUES(fgt)")
  }

  test("JdbcUpsert Postgres dialect builds ON CONFLICT DO UPDATE") {
    val sql = JdbcUpsert.PostgresDialect.sql("data", Seq("id", "v"), Seq("id"))
    assert(sql === "INSERT INTO data (id, v) VALUES (?, ?) " +
      "ON CONFLICT (id) DO UPDATE SET v = EXCLUDED.v")
  }

  test("JdbcUpsert.writeBatches binds all rows and flushes partial batches") {
    val calls = ArrayBuffer[String]()
    val stmt = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "setObject" => calls += s"set(${args(0)},${args(1)})"; null
          case "addBatch"  => calls += "addBatch"; null
          case "executeBatch" => calls += "executeBatch"; Array.empty[Int]
          case _ => null
        }
      }).asInstanceOf[PreparedStatement]
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").collect().iterator
    val n = JdbcUpsert.writeBatches(rows, stmt, 2, batchSize = 2)
    assert(n === 3)
    assert(calls.count(_ == "executeBatch") === 2) // full batch + tail flush
    assert(calls.count(_ == "addBatch") === 3)
    assert(calls.take(3) === Seq("set(1,1)", "set(2,a)", "addBatch"))
  }

  test("EventStream.windowedSums aggregates 15-min windows with watermark (MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "station", "value")
    val q = EventStream.windowedSums(df, "ts", "station", "value")
      .writeStream.format("memory").queryName("win_sums").outputMode("complete").start()
    def t(min: Int) = new Timestamp(1577836800000L + min * 60000L) // 2020-01-01 UTC
    mem.addData((t(0), "s1", 1.0), (t(5), "s1", 2.0), (t(16), "s1", 4.0), (t(2), "s2", 8.0))
    q.processAllAvailable()
    val out = spark.table("win_sums")
      .orderBy("station", "bucket_start")
      .select("station", "value", "n_events").collect().toSeq.map(_.toSeq)
    q.stop()
    assert(out === Seq(Seq("s1", 3.0, 2L), Seq("s1", 4.0, 1L), Seq("s2", 8.0, 1L)))
  }

  test("EventStream.dedupStream drops re-pushed (key, time) duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "station", "value")
    val q = EventStream.dedupStream(df, "ts", Seq("station"))
      .writeStream.format("memory").queryName("dedup_s").outputMode("append").start()
    def t(min: Int) = new Timestamp(1577836800000L + min * 60000L)
    mem.addData((t(0), "s1", 1.0), (t(0), "s1", 1.0))        // dup within batch
    q.processAllAvailable()
    mem.addData((t(0), "s1", 1.0), (t(5), "s1", 2.0))        // dup across batches
    q.processAllAvailable()
    val out = spark.table("dedup_s").collect()
    q.stop()
    assert(out.length === 2) // one row per distinct (station, ts)
  }

  test("EventStream.runningWatermark tracks max event time per key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "station")
    val q = EventStream.runningWatermark(df, "ts", "station")
      .writeStream.format("memory").queryName("run_wm").outputMode("complete").start()
    def t(min: Int) = new Timestamp(1577836800000L + min * 60000L)
    mem.addData((t(0), "s1"), (t(30), "s1"), (t(10), "s2"))
    q.processAllAvailable()
    mem.addData((t(45), "s1"))
    q.processAllAvailable()
    val out = spark.table("run_wm").orderBy("station")
      .select("latest_fgt").as[Timestamp].collect()
    q.stop()
    assert(out.toSeq === Seq(t(45), t(10)))
  }
}
