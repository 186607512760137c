package graft.sinks

import java.sql.{Connection, PreparedStatement}

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
  */
object JdbcUpsert {

  sealed trait Dialect {
    /** Upsert statement with `?` placeholders for `columns`. */
    def sql(table: String, columns: Seq[String], keyColumns: Seq[String]): String
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

  /** Bind rows into JDBC batches and execute every `batchSize` rows.
    * Pure w.r.t. the statement interface — unit-testable with a
    * recording proxy. Returns rows written. */
  def writeBatches(rows: Iterator[Row], stmt: PreparedStatement,
                   numCols: Int, batchSize: Int): Long = {
    var inBatch = 0; var total = 0L
    rows.foreach { row =>
      var i = 0
      while (i < numCols) { stmt.setObject(i + 1, row.get(i)); i += 1 }
      stmt.addBatch()
      inBatch += 1; total += 1
      if (inBatch >= batchSize) { stmt.executeBatch(); inBatch = 0 }
    }
    if (inBatch > 0) stmt.executeBatch()
    total
  }

  /** Upsert a DataFrame into `table`. `connect` runs on executors —
    * pass a serializable factory (driver class + URL + credentials),
    * never a Connection. */
  def upsert(df: DataFrame, table: String, keyColumns: Seq[String],
             connect: () => Connection, dialect: Dialect = MySqlDialect,
             batchSize: Int = 1000): Unit = {
    val columns = df.columns.toSeq
    val statement = dialect.sql(table, columns, keyColumns)
    val n = columns.size
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          val stmt = conn.prepareStatement(statement)
          try { writeBatches(rows, stmt, n, batchSize); conn.commit() }
          finally stmt.close()
        } finally conn.close()
      }
    }
  }
}
