package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, SQLException,
  SQLIntegrityConstraintViolationException, SQLSyntaxErrorException}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** A minimal embedded interpreter for the MySQL statement class the
  * reference ships — `INSERT INTO t (cols) VALUES (?, …) ON DUPLICATE
  * KEY UPDATE c = VALUES(c), …` (`wrf_data_pusher.py:103-140`) — so
  * the EXACT [[graft.sinks.JdbcUpsert.MySqlDialect]] string executes
  * against live PK-conflict semantics, transactions included.
  *
  * Why this exists: this container ships NO engine that accepts MySQL
  * upsert syntax (Derby rejects it — its round-trip spec exercises the
  * ANSI MERGE dialect instead; there is no H2/MariaDB jar anywhere on
  * the classpath or cache, and the build has zero network egress), so
  * the realistic alternative to leaving the deployed statement
  * proxy-tested forever is a statement-CLASS interpreter: the SQL
  * string is PARSED by a general grammar (table, column list, marker
  * arity, `col = VALUES(col)` assignment forms — malformed statements
  * throw [[SQLSyntaxErrorException]] like a real driver), bound via
  * the standard JDBC surface, and executed with MySQL's documented
  * semantics: PK-conflict rows apply the ODKU assignments
  * (last-write-wins), bare INSERTs raise "Duplicate entry", NOT NULL
  * violations raise mid-batch, `commit`/`rollback`/`close` honor the
  * per-connection transaction. It is NOT a MySQL wire clone — it is
  * the smallest engine that can fail this statement for real.
  *
  * JDBC objects are reflective [[Proxy]]s implementing only the calls
  * the sink makes (prepare/bind/batch/execute/commit/rollback/close);
  * anything else returns a zero value. Databases live in a
  * process-wide registry so executor-side connection factories can
  * reach them by name from `local[*]` tasks.
  */
object MiniMySql {

  /** One parsed upsert statement. `updates` empty + `hasOdku` false =
    * a bare INSERT (duplicates throw). */
  final case class ParsedUpsert(table: String, columns: Seq[String],
                                updates: Seq[String], hasOdku: Boolean)

  private val stmtRe =
    ("""(?is)^\s*INSERT\s+INTO\s+([A-Za-z_][\w.]*)\s*""" +
      """\(\s*([^)]+?)\s*\)\s*VALUES\s*\(\s*([^)]+?)\s*\)""" +
      """(?:\s*ON\s+DUPLICATE\s+KEY\s+UPDATE\s+(.+?))?\s*;?\s*$""").r
  private val assignRe = """(?i)^(\w+)\s*=\s*VALUES\s*\(\s*(\w+)\s*\)$""".r

  /** Parse one statement of the supported class; syntax errors throw
    * like a real driver's prepare. */
  def parse(sql: String): ParsedUpsert = sql match {
    case stmtRe(table, cols, markers, odku) =>
      val columns = cols.split(",").map(_.trim).toSeq
      val ms = markers.split(",").map(_.trim).toSeq
      if (!ms.forall(_ == "?"))
        throw new SQLSyntaxErrorException(
          s"only parameter markers are supported in VALUES, got: $markers")
      if (ms.length != columns.length)
        throw new SQLSyntaxErrorException(
          s"column count ${columns.length} != marker count ${ms.length}")
      val updates = Option(odku).map {
        _.split(",").map(_.trim).map {
          case assignRe(l, r) if l.equalsIgnoreCase(r) => l
          case a => throw new SQLSyntaxErrorException(
            s"unsupported ON DUPLICATE KEY UPDATE assignment: $a")
        }.toSeq
      }
      ParsedUpsert(table, columns, updates.getOrElse(Seq.empty), odku != null)
    case _ =>
      throw new SQLSyntaxErrorException(s"cannot parse statement: $sql")
  }

  /** In-memory table: committed rows in `base`, keyed by PK tuple. */
  final class MiniTable(val columns: Seq[String], val pk: Seq[String],
                        val notNull: Set[String]) {
    require(pk.forall(columns.contains), "pk must be a subset of columns")
    val base: mutable.LinkedHashMap[Seq[Any], Array[Any]] =
      mutable.LinkedHashMap.empty
  }

  /** One named database. All state mutations synchronize on `this` —
    * parallel `local[*]` partitions each carry their own connection/
    * transaction overlay but share the committed base. */
  final class MiniDb(val name: String) {
    private[MiniMySql] val tables = TrieMap.empty[String, MiniTable]
    /** Every SQL string a connection actually prepared — lets specs
      * assert the engine received the dialect's statement verbatim. */
    val statements: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty

    def createTable(table: String, columns: Seq[String], pk: Seq[String],
                    notNull: Set[String] = Set.empty): Unit =
      tables.put(table, new MiniTable(columns, pk, notNull))

    /** Committed state: PK tuple → column-name map. */
    def snapshot(table: String): Map[Seq[Any], Map[String, Any]] =
      synchronized {
        val t = tables(table)
        t.base.map { case (k, row) =>
          k -> t.columns.zip(row.toSeq).toMap
        }.toMap
      }

    private[MiniMySql] def table(name: String): MiniTable =
      tables.getOrElse(name,
        throw new SQLSyntaxErrorException(s"Table '$name' doesn't exist"))

    private[MiniMySql] def executeUpserts(conn: ConnHandler, p: ParsedUpsert,
                                          batch: Seq[Array[Any]]): Array[Int] =
      synchronized {
        val t = table(p.table)
        val overlay = conn.overlay(p.table)
        batch.foreach { values =>
          val byName = p.columns.zip(values.toSeq).toMap
          t.notNull.foreach { c =>
            if (byName.get(c).exists(_ == null))
              throw new SQLIntegrityConstraintViolationException(
                s"Column '$c' cannot be null")
          }
          val key = t.pk.map(c => byName.getOrElse(c,
            throw new SQLException(s"no value bound for key column '$c'")))
          val existing = overlay.get(key).orElse(t.base.get(key))
          existing match {
            case None =>
              overlay(key) = t.columns.map(c => byName.getOrElse(c, null)).toArray
            case Some(_) if !p.hasOdku =>
              throw new SQLIntegrityConstraintViolationException(
                s"Duplicate entry '${key.mkString("-")}' for key 'PRIMARY'")
            case Some(row) =>
              val next = row.clone()
              p.updates.foreach(c => next(t.columns.indexOf(c)) = byName(c))
              overlay(key) = next
          }
        }
        if (conn.autoCommit) commit(conn)
        Array.fill(batch.size)(1)
      }

    private[MiniMySql] def commit(conn: ConnHandler): Unit = synchronized {
      conn.overlays.foreach { case (tbl, pending) =>
        table(tbl).base ++= pending
      }
      conn.overlays.clear()
    }

    private[MiniMySql] def rollback(conn: ConnHandler): Unit = synchronized {
      conn.overlays.clear()
    }
  }

  private val registry = TrieMap.empty[String, MiniDb]

  /** Create (or replace) a named database. */
  def create(name: String): MiniDb = {
    val db = new MiniDb(name); registry.put(name, db); db
  }

  /** The registered database, for spec-side state assertions. */
  def get(name: String): MiniDb = registry(name)

  /** Open a connection to a registered database — the serializable
    * factory shape [[graft.sinks.JdbcUpsert.upsert]] expects is
    * `() => MiniMySql.connect("name")`. */
  def connect(name: String): Connection = {
    val db = registry.getOrElse(name,
      throw new SQLException(s"Unknown database '$name'"))
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), new ConnHandler(db)).asInstanceOf[Connection]
  }

  private def zeroOf(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE   => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE   => Integer.valueOf(0)
    case java.lang.Long.TYPE      => java.lang.Long.valueOf(0L)
    case java.lang.Short.TYPE     => java.lang.Short.valueOf(0.toShort)
    case java.lang.Byte.TYPE      => java.lang.Byte.valueOf(0.toByte)
    case java.lang.Double.TYPE    => java.lang.Double.valueOf(0.0)
    case java.lang.Float.TYPE     => java.lang.Float.valueOf(0.0f)
    case java.lang.Character.TYPE => java.lang.Character.valueOf(' ')
    case java.lang.Void.TYPE      => null
    case _                        => null
  }

  private[MiniMySql] final class ConnHandler(db: MiniDb) extends InvocationHandler {
    @volatile var autoCommit = true
    @volatile private var closed = false
    /** table → per-transaction pending rows (PK tuple → row). */
    val overlays: mutable.Map[String, mutable.LinkedHashMap[Seq[Any], Array[Any]]] =
      TrieMap.empty
    def overlay(table: String): mutable.LinkedHashMap[Seq[Any], Array[Any]] =
      overlays.getOrElseUpdate(table, mutable.LinkedHashMap.empty)

    override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
      def arg0s = args(0).asInstanceOf[String]
      m.getName match {
        case "prepareStatement" =>
          if (closed) throw new SQLException("connection is closed")
          val parsed = parse(arg0s) // syntax errors throw here, like prepare
          db.table(parsed.table)    // unknown table throws here too
          val bad = parsed.columns.filterNot(db.table(parsed.table).columns.contains) ++
            parsed.updates.filterNot(parsed.columns.contains)
          if (bad.nonEmpty)
            throw new SQLSyntaxErrorException(s"Unknown column '${bad.head}'")
          db.statements.synchronized { db.statements += arg0s }
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(classOf[PreparedStatement]), new StmtHandler(db, this, parsed))
        case "setAutoCommit" =>
          autoCommit = args(0).asInstanceOf[java.lang.Boolean]; null
        case "getAutoCommit" => java.lang.Boolean.valueOf(autoCommit)
        case "commit"        => db.commit(this); null
        case "rollback"      => db.rollback(this); null
        case "close" =>
          // MySQL rolls back an open transaction on close without commit
          if (!closed) { db.rollback(this); closed = true }; null
        case "isClosed" => java.lang.Boolean.valueOf(closed)
        case "toString" => s"MiniMySqlConnection(${db.name})"
        case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
        case "equals"   => java.lang.Boolean.valueOf(proxy eq args(0))
        case _          => zeroOf(m.getReturnType)
      }
    }
  }

  private final class StmtHandler(db: MiniDb, conn: ConnHandler,
                                  parsed: ParsedUpsert) extends InvocationHandler {
    private val current = new Array[Any](parsed.columns.length)
    private val batch = mutable.ArrayBuffer.empty[Array[Any]]

    override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
      m.getName match {
        case "setObject" =>
          val i = args(0).asInstanceOf[java.lang.Integer].intValue()
          if (i < 1 || i > current.length)
            throw new SQLException(s"parameter index $i out of range 1..${current.length}")
          current(i - 1) = args(1); null
        case "addBatch"   => batch += current.clone(); null
        case "clearBatch" => batch.clear(); null
        case "executeBatch" =>
          val res = db.executeUpserts(conn, parsed, batch.toSeq)
          batch.clear() // JDBC: a successful executeBatch resets the batch
          res
        case "close"    => null
        case "toString" => s"MiniMySqlStatement(${parsed.table})"
        case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
        case "equals"   => java.lang.Boolean.valueOf(proxy eq args(0))
        case _          => zeroOf(m.getReturnType)
      }
  }
}
