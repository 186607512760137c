package graft

import org.apache.spark.sql.functions._

/** [[Tables.eventTsUs]] must floor BOTH physical `ts` encodings the
  * data generator has shipped to the same epoch-µs long — the r6
  * dataset regeneration switched TIMESTAMP(NANOS) → TIMESTAMP(MICROS)
  * and silently dropped every events-table query from the oracle run.
  * This spec pins the contract so the next flip is a red test, not a
  * vanished correctness row. */
class TablesTsSpec extends SparkSpec {
  import spark.implicits._

  private val micros = Seq(1700000000123456L, 1700000360000001L, 0L)

  test("eventTsUs on epoch-nanos LongType floors to micros") {
    val df = micros.map(_ * 1000L + 789L).toDF("ts") // nanos with sub-µs noise
    val out = df.select(Tables.eventTsUs(df).as("ts_us"))
      .as[Long].collect().toSeq
    assert(out === micros)
  }

  test("eventTsUs FLOORS negative sub-µs nanos (div would truncate toward zero)") {
    val df = Seq(-1500L, -1000L, -999L).toDF("ts") // ns
    val out = df.select(Tables.eventTsUs(df).as("ts_us"))
      .as[Long].collect().toSeq
    assert(out === Seq(-2L, -1L, -1L))
  }

  test("eventTsUs on TimestampType yields identical micros") {
    val df = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val out = df.select(Tables.eventTsUs(df).as("ts_us"))
      .as[Long].collect().toSeq
    assert(out === micros)
  }

  test("eventTsUs rejects an unsupported ts type loudly") {
    val df = Seq("2023-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException](Tables.eventTsUs(df))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("the shipped events table resolves through eventTsUs end-to-end") {
    val ev = Tables.events(spark, sfDir)
    val n = ev.select(Tables.eventTsUs(ev).as("ts_us"))
      .filter(col("ts_us") > 0L).count()
    assert(n === ev.count(), "every event row must carry a positive epoch-µs ts")
  }
}
