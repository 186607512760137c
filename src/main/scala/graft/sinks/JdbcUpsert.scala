package graft.sinks

import java.sql.{Connection, PreparedStatement}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}

/** Batched JDBC upsert sink — the Spark-side equivalent of the
  * reference's `Timeseries.insert_formatted_data(ts_data, upsert=True)`
  * (wrf_data_pusher.py:127, backed by MySQL
  * `INSERT … ON DUPLICATE KEY UPDATE`) and its `update_latest_fgt`
  * single-row upserts.
  *
  * Scale posture: `foreachPartition` — one connection + prepared
  * statement per partition, rows streamed into JDBC batches of
  * `batchSize`; no driver-side collection, parallelism = partition
  * count (repartition upstream to match the DB's write concurrency).
  * Statement construction is pure and unit-tested; the container has
  * no database, so the connection factory is injected.
  *
  * Fault tolerance mirrors the reference's push/retry/ledger contract
  * (`wrf_data_pusher.py:119-140` wraps every push in try/except,
  * retries, and accumulates an email-able error ledger instead of
  * aborting the run): each JDBC batch is retried with exponential
  * backoff and, if it still fails, lands in an accumulator-backed
  * ledger while the remaining batches keep flowing. The accumulators
  * are Spark's own cross-executor channel, so at 1000 executors the
  * ledger still materializes on the driver without any side I/O.
  */
object JdbcUpsert {

  /** Bounded-retry policy with exponential backoff. `maxAttempts = 1`
    * means no retry. */
  final case class RetryPolicy(maxAttempts: Int = 3, initialBackoffMs: Long = 200,
                               backoffFactor: Double = 2.0) {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    def backoffMs(attempt: Int): Long =
      (initialBackoffMs * math.pow(backoffFactor, (attempt - 1).toDouble)).toLong
  }

  /** One ledger entry: a batch (or a whole partition, batch = -1 when
    * the connection itself never came up) that failed after
    * `attempts` tries. Serializable — travels executor → driver via a
    * CollectionAccumulator. */
  final case class PushError(partition: Int, batch: Int, rows: Long,
                             attempts: Int, message: String)

  /** Driver-side summary of one upsert action: rows that reached the
    * database, rows that exhausted retries, and the error ledger (the
    * reference emails this; callers here decide — log, alert, replay). */
  final case class UpsertResult(rowsWritten: Long, rowsFailed: Long,
                                errors: Seq[PushError]) {
    def ok: Boolean = rowsFailed == 0L && errors.isEmpty
  }

  /** Run `op` up to `policy.maxAttempts` times; Left((attempts, lastError))
    * after exhaustion. Pure apart from `sleep` (injected for tests). */
  def withRetry[A](policy: RetryPolicy, sleep: Long => Unit = Thread.sleep)
                  (op: => A): Either[(Int, Throwable), A] = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < policy.maxAttempts) {
      attempt += 1
      try return Right(op)
      catch {
        case e: Exception =>
          last = e
          if (attempt < policy.maxAttempts) sleep(policy.backoffMs(attempt))
      }
    }
    Left((attempt, last))
  }

  sealed trait Dialect {
    /** Upsert statement with `?` placeholders for `columns`. */
    def sql(table: String, columns: Seq[String], keyColumns: Seq[String]): String

    /** Column index bound to each `?` marker, in marker order. The
      * MySQL/Postgres statements take one marker per column in column
      * order (the identity); MERGE-family statements repeat columns
      * across the ON / UPDATE / INSERT clauses. */
    def bindIndexes(columns: Seq[String], keyColumns: Seq[String]): Seq[Int] =
      columns.indices
  }

  /** MySQL `INSERT … ON DUPLICATE KEY UPDATE` — what the reference's
    * db adapter emits; key columns are the table's PK, non-key columns
    * are overwritten (last-write-wins, matching A5 semantics). */
  case object MySqlDialect extends Dialect {
    def sql(table: String, columns: Seq[String], keyColumns: Seq[String]): String = {
      val updates = columns.filterNot(keyColumns.contains)
      require(updates.nonEmpty, "all columns are key columns — nothing to update")
      s"INSERT INTO $table (${columns.mkString(", ")}) " +
        s"VALUES (${columns.map(_ => "?").mkString(", ")}) " +
        s"ON DUPLICATE KEY UPDATE ${updates.map(c => s"$c = VALUES($c)").mkString(", ")}"
    }
  }

  /** ANSI/PostgreSQL `INSERT … ON CONFLICT (keys) DO UPDATE`. */
  case object PostgresDialect extends Dialect {
    def sql(table: String, columns: Seq[String], keyColumns: Seq[String]): String = {
      val updates = columns.filterNot(keyColumns.contains)
      require(updates.nonEmpty, "all columns are key columns — nothing to update")
      s"INSERT INTO $table (${columns.mkString(", ")}) " +
        s"VALUES (${columns.map(_ => "?").mkString(", ")}) " +
        s"ON CONFLICT (${keyColumns.mkString(", ")}) DO UPDATE SET " +
        updates.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    }
  }

  /** Derby/DB2-family `MERGE INTO … USING <dummy table>` upsert —
    * those engines reject a VALUES source ("must be a base table or
    * table function"), so the source is the one-row system dummy table
    * and the row's values ride as parameters in the ON / UPDATE /
    * INSERT clauses directly. That repeats columns across clauses —
    * [[bindIndexes]] declares the marker→column map (keys, then
    * updates, then all columns). Parameter markers can't be typed by
    * context there, so callers supply SQL type names per column for
    * CASTs (absent columns bind as bare `?`). This dialect is what the
    * embedded-engine round-trip spec executes for real — the same
    * statement/commit/rollback machinery the MySQL deployment runs. */
  final case class AnsiMergeDialect(columnTypes: Map[String, String] = Map.empty,
                                    dummyTable: String = "SYSIBM.SYSDUMMY1")
      extends Dialect {
    private def p(c: String): String =
      columnTypes.get(c).map(t => s"CAST(? AS $t)").getOrElse("?")

    def sql(table: String, columns: Seq[String], keyColumns: Seq[String]): String = {
      val updates = columns.filterNot(keyColumns.contains)
      require(updates.nonEmpty, "all columns are key columns — nothing to update")
      s"MERGE INTO $table t USING $dummyTable ON " +
        keyColumns.map(k => s"t.$k = ${p(k)}").mkString(" AND ") +
        s" WHEN MATCHED THEN UPDATE SET ${updates.map(c => s"$c = ${p(c)}").mkString(", ")}" +
        s" WHEN NOT MATCHED THEN INSERT (${columns.mkString(", ")}) " +
        s"VALUES (${columns.map(p).mkString(", ")})"
    }

    override def bindIndexes(columns: Seq[String], keyColumns: Seq[String]): Seq[Int] = {
      val idx = columns.zipWithIndex.toMap
      val updates = columns.filterNot(keyColumns.contains)
      (keyColumns ++ updates ++ columns).map(idx)
    }
  }

  /** Bind rows into JDBC batches and execute every `batchSize` rows.
    * `bind(i)` is the row column feeding marker i+1 (a dialect's
    * [[Dialect.bindIndexes]]; identity for one-marker-per-column
    * statements). Pure w.r.t. the statement interface — unit-testable
    * with a recording proxy. Returns rows written. */
  def writeBatches(rows: Iterator[Row], stmt: PreparedStatement,
                   bind: Seq[Int], batchSize: Int): Long = {
    // materialize once: dialects build bind by List concatenation, and
    // bind(i)/bind.length inside the innermost per-row loop would be
    // O(markers) pointer chases each — O(markers²) per row on a List
    val b = bind.toArray; val n = b.length
    var inBatch = 0; var total = 0L
    rows.foreach { row =>
      var i = 0
      while (i < n) { stmt.setObject(i + 1, row.get(b(i))); i += 1 }
      stmt.addBatch()
      inBatch += 1; total += 1
      if (inBatch >= batchSize) { stmt.executeBatch(); inBatch = 0 }
    }
    if (inBatch > 0) stmt.executeBatch()
    total
  }

  /** Like [[writeBatches]], but each batch is buffered, retried per
    * [[RetryPolicy]] (the JDBC batch state is undefined after a failed
    * `executeBatch`, so every attempt clears and re-binds the batch),
    * and on exhaustion reported via `onError` instead of thrown — the
    * remaining batches keep going, matching the reference's
    * accumulate-errors-and-continue push loop.
    * Returns (rowsWritten, rowsFailed). */
  /** `onBatchOk` runs after each successful batch (the upsert path
    * commits there — a batch that executed must not be erasable by a
    * LATER batch's failure poisoning the shared transaction);
    * `onAttemptFail` runs after each failed executeBatch attempt (the
    * upsert path rolls back there — on PostgreSQL a failed statement
    * ABORTS the transaction, so without the rollback every retry and
    * every later batch would fail with "current transaction is
    * aborted" and the final commit would silently become a rollback
    * of rows already counted as written). */
  def writeBatchesRetrying(rows: Iterator[Row], stmt: PreparedStatement,
                           bind: Seq[Int], batchSize: Int, policy: RetryPolicy,
                           onError: PushError => Unit,
                           partitionId: Int = -1,
                           sleep: Long => Unit = Thread.sleep,
                           onBatchOk: () => Unit = () => (),
                           onAttemptFail: () => Unit = () => ()): (Long, Long) = {
    val b = bind.toArray; val n = b.length // see writeBatches
    var written = 0L; var failed = 0L; var batchIdx = 0
    rows.grouped(batchSize).foreach { batch =>
      def bindAndExec(): Unit =
        try {
          stmt.clearBatch()
          batch.foreach { row =>
            var i = 0
            while (i < n) { stmt.setObject(i + 1, row.get(b(i))); i += 1 }
            stmt.addBatch()
          }
          // check the per-statement results: a driver in
          // continue-on-error mode reports EXECUTE_FAILED entries
          // WITHOUT throwing, and counting those rows as written
          // would silently under-fill the error ledger
          val counts = stmt.executeBatch()
          val nFailed = counts.count(_ == java.sql.Statement.EXECUTE_FAILED)
          if (nFailed > 0) throw new java.sql.SQLException(
            s"executeBatch reported $nFailed failed statements without raising")
        } catch { case e: Throwable =>
          // a rollback that ITSELF throws (dead connection — the
          // common case) must not replace the root cause the ledger
          // needs for triage; attach it as suppressed instead
          try onAttemptFail()
          catch { case scala.util.control.NonFatal(r) => e.addSuppressed(r) }
          throw e
        }
      withRetry(policy, sleep)(bindAndExec()) match {
        case Right(_) =>
          written += batch.size
          onBatchOk()
        case Left((attempts, e)) =>
          failed += batch.size
          onError(PushError(partitionId, batchIdx, batch.size, attempts,
            String.valueOf(e)))
      }
      batchIdx += 1
    }
    (written, failed)
  }

  private def jsonStr(s: String): String = graft.Jsons.str(s)

  /** Reference-style run report for an [[UpsertResult]] — the
    * formatted alert body the reference builds from its
    * `email_content` ledger and prints/mails at run end
    * (`wrf_data_pusher.py:33,59,138`; every gen_* job closes with
    * `"{now} ::: … ::: Email Content {json} ::: Config Data {json}"`,
    * e.g. gen_rfields.py:505). Each ledger entry becomes one keyed
    * message in the Email Content map; run totals ride in the header
    * line. `now` is injected so tests (and replayed reports) are
    * deterministic. */
  def formatReport(job: String, result: UpsertResult,
                   now: java.time.Instant,
                   config: Map[String, String] = Map.empty): String = {
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      .format(now)
    val content = result.errors.map { e =>
      val where = if (e.batch < 0) s"partition ${e.partition} connection"
                  else s"partition ${e.partition} batch ${e.batch}"
      jsonStr(s"$where (${e.rows} rows, ${e.attempts} attempts)") +
        ": " + jsonStr(e.message)
    }.mkString("{", ", ", "}")
    val cfg = config.toSeq.sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ": " + jsonStr(v) }
      .mkString("{", ", ", "}")
    s"$ts ::: $job rows_written=${result.rowsWritten} " +
      s"rows_failed=${result.rowsFailed} ok=${result.ok}\n" +
      s"::: Email Content $content\n::: Config Data $cfg"
  }

  /** Ready-made `onResult` hook for [[upsertStream]]: formats the
    * report and hands it to `send` ONLY when the batch's ledger is
    * non-empty — the reference likewise only has something to mail
    * when `email_content` accumulated entries. `send` is the
    * deployment's transport (log line, webhook, SMTP gateway); the
    * container has none, so it stays injected. */
  def alertingOnResult(job: String, send: String => Unit,
                       clock: () => java.time.Instant = () => java.time.Instant.now(),
                       config: Map[String, String] = Map.empty)
      : (Long, UpsertResult) => Unit =
    (batchId, result) =>
      if (!result.ok)
        send(formatReport(s"$job batch=$batchId", result, clock(), config))

  /** Upsert a DataFrame into `table`. `connect` runs on executors —
    * pass a serializable factory (driver class + URL + credentials),
    * never a Connection.
    *
    * Connections and batches are retried per `policy`; batches that
    * exhaust retries land in the returned ledger (like the reference's
    * email ledger) without failing the job. A partition whose
    * connection never opens ledgers all its rows under batch = -1.
    */
  /** The reference's always-on push loop as a stream sink: every
    * micro-batch lands via [[upsert]] (same retry + ledger contract),
    * and the per-batch [[UpsertResult]] is handed to `onResult` — the
    * driver-side hook where a production deployment acks, alerts on a
    * non-empty ledger, or emits metrics (the streaming analogue of the
    * reference's per-run email ledger). Pair with update-mode
    * aggregations (e.g. `EventStream.runningWatermark` — the
    * `update_latest_fgt` contract) so only changed keys re-push each
    * batch. The caller sets trigger/checkpoint and calls `.start()`.
    */
  def upsertStream(stream: DataFrame, table: String, keyColumns: Seq[String],
                   connect: () => Connection, dialect: Dialect = MySqlDialect,
                   batchSize: Int = 1000, policy: RetryPolicy = RetryPolicy(),
                   onResult: (Long, UpsertResult) => Unit = (_, _) => (),
                   outputMode: String = "update")
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    // outputMode is a parameter because the mode is a property of the
    // UPSTREAM query, not this sink: update-mode aggregations
    // (runningWatermark) need "update", while flatMapGroupsWithState
    // streams (streamingIntervalDiff/streamingEwma) are built with
    // OutputMode.Append and throw at start() under update
    stream.writeStream.outputMode(outputMode)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        onResult(batchId,
          upsert(df, table, keyColumns, connect, dialect, batchSize, policy))
      }

  def upsert(df: DataFrame, table: String, keyColumns: Seq[String],
             connect: () => Connection, dialect: Dialect = MySqlDialect,
             batchSize: Int = 1000, policy: RetryPolicy = RetryPolicy(),
             sleep: Long => Unit = Thread.sleep): UpsertResult = {
    val columns = df.columns.toSeq
    // fail FAST on the driver: a key column missing from the frame
    // (wrong case, typo) would otherwise either silently overwrite
    // the real keys (MySQL: updates = all columns) or die per-task in
    // AnsiMerge's bind lookup with a bare "key not found"; a
    // non-positive batch size would only surface as grouped()'s
    // opaque requirement failure inside every executor
    require(batchSize > 0, s"batchSize=$batchSize must be positive")
    require(keyColumns.nonEmpty, "keyColumns must be non-empty")
    val missingKeys = keyColumns.filterNot(columns.contains)
    require(missingKeys.isEmpty,
      s"key columns ${missingKeys.mkString(", ")} not in frame columns " +
        s"${columns.mkString(", ")}")
    val statement = dialect.sql(table, columns, keyColumns)
    val bind = dialect.bindIndexes(columns, keyColumns)
    val sc = df.sparkSession.sparkContext
    val written = sc.longAccumulator("graft.jdbc.rows_written")
    val failedRows = sc.longAccumulator("graft.jdbc.rows_failed")
    val ledger = sc.collectionAccumulator[PushError]("graft.jdbc.error_ledger")
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(-1)
        withRetry(policy, sleep)(connect()) match {
          case Left((attempts, e)) =>
            // connection never came up: ledger the whole partition
            val nRows = rows.size.toLong
            failedRows.add(nRows)
            ledger.add(PushError(pid, -1, nRows, attempts, String.valueOf(e)))
          case Right(conn) =>
            try {
              // session setup can still fail AFTER a successful
              // connect (proxy idle-kill, max_connections race):
              // those failures take the same ledger path as a failed
              // connect — the contract is "ledger and continue",
              // never "abort the job on one partition's session"
              val stmtOrNull =
                try { conn.setAutoCommit(false); conn.prepareStatement(statement) }
                catch {
                  case scala.util.control.NonFatal(e) =>
                    val nRows = rows.size.toLong
                    failedRows.add(nRows)
                    ledger.add(PushError(pid, -1, nRows, 1, String.valueOf(e)))
                    null
                }
              if (stmtOrNull != null) try {
                val stmt = stmtOrNull
                // commit PER successful batch, roll back per failed
                // attempt: one shared end-of-partition commit lets a
                // late batch's failure (which aborts the transaction
                // on PostgreSQL) discard earlier batches already
                // counted as written
                val (ok, bad) = writeBatchesRetrying(rows, stmt, bind, batchSize,
                  policy, ledger.add, pid, sleep,
                  onBatchOk = () => conn.commit(),
                  onAttemptFail = () => conn.rollback())
                written.add(ok); failedRows.add(bad)
              } finally stmtOrNull.close()
            } finally conn.close()
        }
      }
    }
    import scala.jdk.CollectionConverters._
    UpsertResult(written.value, failedRows.value, ledger.value.asScala.toSeq)
  }
}
