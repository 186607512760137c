package graft

import java.sql.{SQLIntegrityConstraintViolationException, SQLSyntaxErrorException}

import graft.sinks.JdbcUpsert
import graft.sinks.JdbcUpsert.RetryPolicy

/** The MySQL dialect executed for REAL: the exact `INSERT … ON
  * DUPLICATE KEY UPDATE` string the reference issues (and
  * `Pipeline.run` builds) runs against [[MiniMySql]] — a grammar-
  * parsing embedded interpreter of that statement class with live
  * PK-conflict + transaction semantics (see its scaladoc for why no
  * full engine is available here: Derby rejects the syntax, no
  * H2/MariaDB jar exists in this zero-egress container). The Derby
  * spec covers the ANSI MERGE dialect against a full engine; this one
  * covers the statement the reference actually ships
  * (`wrf_data_pusher.py:103-140`). */
class MySqlDialectLiveSpec extends SparkSpec {
  import spark.implicits._
  import MySqlDialectLiveSpec._

  override def beforeAll(): Unit = {
    super.beforeAll()
    val db = MiniMySql.create(dbName)
    // the reference's fact table: PK (id, time), non-key fgt/value
    // (curw_fcst.data — wrf_data_pusher.py:103)
    db.createTable("curw_fcst.data", Seq("id", "time", "fgt", "value"),
      pk = Seq("id", "time"), notNull = Set("value"))
  }

  test("the reference's exact upsert statement executes: insert, conflicting upsert, replay") {
    // byte-for-byte the statement Pipeline.run builds (Pipeline.scala)
    val sql = JdbcUpsert.MySqlDialect.sql("curw_fcst.data",
      Seq("id", "time", "fgt", "value"), Seq("id", "time"))
    assert(sql === "INSERT INTO curw_fcst.data (id, time, fgt, value) " +
      "VALUES (?, ?, ?, ?) " +
      "ON DUPLICATE KEY UPDATE fgt = VALUES(fgt), value = VALUES(value)")

    val first = Seq(("ts1", "t0", "f0", 1.5), ("ts1", "t1", "f0", 2.5))
      .toDF("id", "time", "fgt", "value")
    val r1 = JdbcUpsert.upsert(first, "curw_fcst.data", Seq("id", "time"),
      () => MiniMySql.connect(dbName), sleep = noSleep) // default = MySqlDialect
    assert(r1.ok && r1.rowsWritten === 2L)
    assert(value("ts1", "t1") === 2.5)

    // conflicting upsert: (ts1, t1) updated in place, (ts1, t2) inserted
    val second = Seq(("ts1", "t1", "f1", 9.75), ("ts1", "t2", "f1", 3.25))
      .toDF("id", "time", "fgt", "value")
    val r2 = JdbcUpsert.upsert(second, "curw_fcst.data", Seq("id", "time"),
      () => MiniMySql.connect(dbName), sleep = noSleep)
    assert(r2.ok && r2.rowsWritten === 2L)
    assert(state().size === 3)
    assert(value("ts1", "t1") === 9.75 && fgt("ts1", "t1") === "f1")
    assert(value("ts1", "t0") === 1.5) // untouched row stays

    // replaying the same push is idempotent (the A5/at-least-once
    // contract the reference's retry loop relies on)
    val r3 = JdbcUpsert.upsert(second, "curw_fcst.data", Seq("id", "time"),
      () => MiniMySql.connect(dbName), sleep = noSleep)
    assert(r3.ok && state().size === 3 && value("ts1", "t1") === 9.75)

    // the engine RECEIVED the dialect string verbatim — executed, not
    // string-compared
    assert(MiniMySql.get(dbName).statements.contains(sql))
  }

  test("induced failure: NOT NULL violation retries, ledgers, rolls back; healthy batches land") {
    val rows = Seq(("ts2", "t0", "f", 4.0: java.lang.Double),
        ("ts2", "t1", "f", null: java.lang.Double),
        ("ts2", "t2", "f", 6.0: java.lang.Double))
      .toDF("id", "time", "fgt", "value").coalesce(1)
    val r = JdbcUpsert.upsert(rows, "curw_fcst.data", Seq("id", "time"),
      () => MiniMySql.connect(dbName), batchSize = 1,
      policy = RetryPolicy(maxAttempts = 2, initialBackoffMs = 1),
      sleep = noSleep)
    assert(!r.ok && r.rowsWritten === 2L && r.rowsFailed === 1L)
    assert(r.errors.size === 1 && r.errors.head.attempts === 2)
    assert(r.errors.head.message.contains("cannot be null"))
    assert(value("ts2", "t0") === 4.0 && value("ts2", "t2") === 6.0)
    assert(!state().contains(Seq("ts2", "t1"))) // rolled back, never committed
    // the reference-style alert body carries the ledger
    val report = JdbcUpsert.formatReport("mysql-live", r, java.time.Instant.EPOCH)
    assert(report.contains("rows_failed=1") && report.contains("Email Content"))
  }

  test("the statement is parsed by a grammar, not string-matched") {
    // arity mismatch, mismatched VALUES() assignment, junk → prepare fails
    intercept[SQLSyntaxErrorException](
      MiniMySql.parse("INSERT INTO t (a, b) VALUES (?) " +
        "ON DUPLICATE KEY UPDATE b = VALUES(b)"))
    intercept[SQLSyntaxErrorException](
      MiniMySql.parse("INSERT INTO t (a, b) VALUES (?, ?) " +
        "ON DUPLICATE KEY UPDATE a = VALUES(b)"))
    intercept[SQLSyntaxErrorException](MiniMySql.parse("DELETE FROM t"))
    // a bare INSERT parses — and raises MySQL's duplicate-entry error
    // on PK conflict instead of upserting
    val p = MiniMySql.parse("insert into curw_fcst.data (id, time, fgt, value) values (?, ?, ?, ?)")
    assert(!p.hasOdku && p.columns === Seq("id", "time", "fgt", "value"))
    val conn = MiniMySql.connect(dbName)
    try {
      val st = conn.prepareStatement(
        "INSERT INTO curw_fcst.data (id, time, fgt, value) VALUES (?, ?, ?, ?)")
      Seq("ts1", "t0", "fX", java.lang.Double.valueOf(0.0)).zipWithIndex
        .foreach { case (v, i) => st.setObject(i + 1, v) }
      st.addBatch()
      intercept[SQLIntegrityConstraintViolationException](st.executeBatch())
    } finally conn.close()
    // a malformed statement fails AT PREPARE, like a real driver
    val conn2 = MiniMySql.connect(dbName)
    try intercept[SQLSyntaxErrorException](
      conn2.prepareStatement("INSERT INTO curw_fcst.data (id) VALUES (?, ?)"))
    finally conn2.close()
  }
}

object MySqlDialectLiveSpec {
  // companion members, NOT spec fields: upsert() ships its connection
  // factory to executors, and a field reference would drag the whole
  // (non-serializable) suite into the task
  val dbName = "graft_mysql_live"
  val noSleep: Long => Unit = _ => ()
  def state(): Map[Seq[Any], Map[String, Any]] =
    MiniMySql.get(dbName).snapshot("curw_fcst.data")
  def value(id: String, t: String): Any = state()(Seq(id, t))("value")
  def fgt(id: String, t: String): Any = state()(Seq(id, t))("fgt")
}
