package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.{Connection, DriverManager, SQLException, Types}
import java.util.Properties

/** SQL-text generation for one destination engine family. The typed
  * sink's control flow (connection per batch, prepared-statement
  * batching, replay idempotency) is engine-independent; what varies is
  * the DDL type lexicon, identifier quoting, and HOW a replayed batch
  * is made a no-op — ANSI engines do delete+insert in one transaction,
  * ClickHouse attaches a server-side dedup token
  * ([[ClickHouseSinkDialect]]).
  */
trait SinkDialect extends Serializable {
  def quote(ident: String): String
  def ddlType(f: StructField): String
  def createTableSql(table: String, schema: StructType): String
  /** `Some(sql)` = replay overwrites via this delete (one `?` = batch
    * key) inside a transaction; `None` = the engine dedups replayed
    * inserts natively and no delete is issued. */
  def deleteBatchSql(table: String): Option[String]
  def insertSql(table: String, schema: StructType): String
  /** Whether delete+insert must be one transaction (requires the
    * driver to support autocommit=false). */
  def transactional: Boolean
  /** Per-batch connection properties (e.g. CH dedup token). */
  def batchProperties(batchKey: String): Map[String, String]
  /** SQLStates meaning "table already exists" to swallow when the DDL
    * has no IF NOT EXISTS form (concurrent partitions race to create). */
  def createRaceSqlStates: Set[String]
}

/** ANSI/Derby dialect — the embedded zero-egress test target. This is
  * byte-for-byte the SQL the sink issued before dialects existed, so
  * the Derby-backed specs pin it.
  */
object AnsiSinkDialect extends SinkDialect {
  def quote(ident: String): String = ident // checkIdentifier restricts to plain
  def ddlType(f: StructField): String = Jdbc.ddlType(f.dataType)
  def createTableSql(table: String, schema: StructType): String = {
    val cols = schema.fields.map(f => s"${f.name} ${ddlType(f)}").mkString(", ")
    s"CREATE TABLE $table (graft_batch_key VARCHAR(64) NOT NULL, $cols)"
  }
  def deleteBatchSql(table: String): Option[String] =
    Some(s"DELETE FROM $table WHERE graft_batch_key = ?")
  def insertSql(table: String, schema: StructType): String = {
    val placeholders = Seq.fill(schema.length + 1)("?").mkString(", ")
    s"INSERT INTO $table VALUES ($placeholders)"
  }
  def transactional: Boolean = true
  def batchProperties(batchKey: String): Map[String, String] = Map.empty
  // X0Y32 = Derby "object already exists"; 42S01 the generic ANSI state
  def createRaceSqlStates: Set[String] = Set("X0Y32", "42S01")
}

/** JDBC implementation of [[Sink.TypedSinkBackend]] — the
  * `INSERT INTO ... VALUES`-batching destination sink (the classic
  * ClickHouse-JDBC-sink shape). Tested in-process against embedded
  * Derby (ships with Spark), zero egress; any server-mode JDBC URL
  * works the same way from real executors, with engine-specific SQL
  * text supplied by a [[SinkDialect]] (ANSI default;
  * [[ClickHouseSinkDialect]] for a CH destination).
  *
  * Exactly-once composition with an at-least-once task scheduler:
  * every batch carries its deterministic `graft_batch_key`, and
  * `insertBatch` makes a replayed batch a no-op — transactionally
  * (DELETE + inserts in one commit) on ANSI engines, via the server's
  * insert-dedup token on ClickHouse. A retried or replayed task
  * atomically replaces (or is dropped against) its own previous
  * attempt — never appends a duplicate. This is the JDBC equivalent of
  * the LocalBackend's tmp-file + atomic-rename, and of CH's
  * `insert_deduplicate` block hashing.
  *
  * Scale notes: one connection + one prepared statement per
  * (partition, batch); `addBatch`/`executeBatch` amortizes the wire
  * round-trips; nothing touches the driver. Table DDL is derived from
  * the DataFrame schema on first contact and creation races between
  * concurrent partitions are benign (IF NOT EXISTS or a swallowed
  * already-exists state, per dialect).
  */
final class JdbcBackend(url: String, dialect: SinkDialect = AnsiSinkDialect)
    extends Sink.TypedSinkBackend {

  private def withConn[A](props: Map[String, String])(f: Connection => A): A = {
    Jdbc.quietDerby()
    val c =
      if (props.isEmpty) DriverManager.getConnection(url)
      else {
        val p = new Properties()
        props.foreach { case (k, v) => p.setProperty(k, v) }
        DriverManager.getConnection(url, p)
      }
    try f(c) finally c.close()
  }

  private def ensureTable(c: Connection, table: String, schema: StructType): Unit = {
    val st = c.createStatement()
    try st.executeUpdate(dialect.createTableSql(table, schema))
    catch {
      case e: SQLException if dialect.createRaceSqlStates(e.getSQLState) => ()
    } finally st.close()
  }

  def insertBatch(table: String, batchKey: String,
      schema: StructType, rows: Seq[Row]): Unit =
    withConn(dialect.batchProperties(batchKey)) { c =>
      Jdbc.checkIdentifier(table)
      ensureTable(c, table, schema)
      if (dialect.transactional) c.setAutoCommit(false)
      try {
        dialect.deleteBatchSql(table).foreach { sql =>
          val del = c.prepareStatement(sql)
          del.setString(1, batchKey)
          del.executeUpdate()
          del.close()
        }

        val ins = c.prepareStatement(dialect.insertSql(table, schema))
        rows.foreach { r =>
          ins.setString(1, batchKey)
          var i = 0
          while (i < schema.length) {
            val j = i + 2 // 1-based, after the batch key
            if (r.isNullAt(i)) ins.setNull(j, Jdbc.sqlType(schema(i).dataType))
            else schema(i).dataType match {
              case LongType      => ins.setLong(j, r.getLong(i))
              case IntegerType   => ins.setInt(j, r.getInt(i))
              case ShortType     => ins.setShort(j, r.getShort(i))
              case DoubleType    => ins.setDouble(j, r.getDouble(i))
              case FloatType     => ins.setFloat(j, r.getFloat(i))
              case BooleanType   => ins.setBoolean(j, r.getBoolean(i))
              case _: DecimalType => ins.setBigDecimal(j, r.getDecimal(i))
              case DateType      => ins.setDate(j, r.getDate(i))
              case TimestampType => ins.setTimestamp(j, r.getTimestamp(i))
              case StringType    => ins.setString(j, r.getString(i))
              case dt => throw new IllegalArgumentException(
                s"unsupported JDBC sink type $dt for column ${schema(i).name}")
            }
            i += 1
          }
          ins.addBatch()
        }
        ins.executeBatch()
        ins.close()
        if (dialect.transactional) c.commit()
      } catch {
        case e: Throwable =>
          // rollback can itself throw (dead connection) — never let it
          // mask the original batch failure.
          if (dialect.transactional)
            try c.rollback() catch { case _: SQLException => () }
          throw e
      }
    }
}

object Jdbc {

  /** Best-effort delete of every row in `table` (absent table is
    * fine). Callers that reuse a persistent destination across runs
    * need this before a full reload: batch-key idempotency only
    * overwrites the keys the CURRENT run produces, so a previous run
    * with more partitions would leave stale batches behind.
    */
  def truncate(url: String, table: String): Unit = {
    checkIdentifier(table)
    quietDerby()
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.executeUpdate(s"DELETE FROM $table")
      catch {
        // 42X05 = Derby "table does not exist"; 42S02 the ANSI state
        case e: SQLException
            if e.getSQLState == "42X05" || e.getSQLState == "42S02" => ()
      } finally st.close()
    } finally c.close()
  }

  /** Table names are interpolated into DDL/DML text (JDBC can't bind
    * identifiers), so restrict them to plain SQL identifiers up front
    * — one check guards every statement in this module.
    */
  def checkIdentifier(table: String): Unit =
    require(table.matches("[A-Za-z_][A-Za-z0-9_]{0,127}"),
      s"invalid SQL table identifier: '$table'")

  /** Keep embedded Derby's log out of the working directory. */
  private[sources] def quietDerby(): Unit =
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        s"${System.getProperty("java.io.tmpdir")}/derby.log")

  /** Spark -> ANSI DDL type for sink table creation (Derby-compatible;
    * DECIMAL precision capped at Derby's max of 31).
    */
  def ddlType(dt: DataType): String = dt match {
    case LongType       => "BIGINT"
    case IntegerType    => "INTEGER"
    case ShortType      => "SMALLINT"
    case DoubleType     => "DOUBLE"
    case FloatType      => "REAL"
    case BooleanType    => "BOOLEAN"
    case DateType       => "DATE"
    case TimestampType  => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision.min(31)},${d.scale.min(31)})"
    case StringType     => "VARCHAR(4096)"
    case other =>
      throw new IllegalArgumentException(s"unsupported JDBC sink type $other")
  }

  /** java.sql.Types code for null binding. */
  def sqlType(dt: DataType): Int = dt match {
    case LongType       => Types.BIGINT
    case IntegerType    => Types.INTEGER
    case ShortType      => Types.SMALLINT
    case DoubleType     => Types.DOUBLE
    case FloatType      => Types.REAL
    case BooleanType    => Types.BOOLEAN
    case DateType       => Types.DATE
    case TimestampType  => Types.TIMESTAMP
    case _: DecimalType => Types.DECIMAL
    case _              => Types.VARCHAR
  }
}
