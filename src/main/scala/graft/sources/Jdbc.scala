package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.{Connection, DriverManager, SQLException, Types}

/** JDBC implementation of [[Sink.TypedSinkBackend]] — the
  * `INSERT INTO ... VALUES`-batching destination sink (the classic
  * ClickHouse-JDBC-sink shape). Tested in-process against embedded
  * Derby (ships with Spark), zero egress; any server-mode JDBC URL
  * works the same way from real executors.
  *
  * Exactly-once composition with an at-least-once task scheduler:
  * every batch carries its deterministic `graft_batch_key`, and
  * `insertBatch` runs `DELETE WHERE graft_batch_key = ?` plus the
  * typed inserts in ONE transaction, so a retried or replayed task
  * atomically replaces its own previous attempt — never appends a
  * duplicate. This is the JDBC equivalent of the LocalBackend's
  * tmp-file + atomic-rename, and of CH's `insert_deduplicate` block
  * hashing.
  *
  * Scale notes: one connection + one prepared statement per
  * (partition, batch); `addBatch`/`executeBatch` amortizes the wire
  * round-trips; nothing touches the driver. Table DDL is derived from
  * the DataFrame schema on first contact and creation races between
  * concurrent partitions are benign (already-exists is swallowed).
  */
final class JdbcBackend(url: String) extends Sink.TypedSinkBackend {

  private def withConn[A](f: Connection => A): A = {
    Jdbc.quietDerby()
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def ensureTable(c: Connection, table: String, schema: StructType): Unit = {
    val cols = schema.fields
      .map(f => s"${f.name} ${Jdbc.ddlType(f.dataType)}").mkString(", ")
    val st = c.createStatement()
    try st.executeUpdate(
      s"CREATE TABLE $table (graft_batch_key VARCHAR(64) NOT NULL, $cols)")
    catch {
      // X0Y32 = Derby "object already exists"; 42S01 is the generic
      // ANSI state other embedded engines use.
      case e: SQLException
          if e.getSQLState == "X0Y32" || e.getSQLState == "42S01" => ()
    } finally st.close()
  }

  def insertBatch(table: String, batchKey: String,
      schema: StructType, rows: Seq[Row]): Unit = withConn { c =>
    Jdbc.checkIdentifier(table)
    ensureTable(c, table, schema)
    c.setAutoCommit(false)
    try {
      val del = c.prepareStatement(
        s"DELETE FROM $table WHERE graft_batch_key = ?")
      del.setString(1, batchKey)
      del.executeUpdate()
      del.close()

      val placeholders = Seq.fill(schema.length + 1)("?").mkString(", ")
      val ins = c.prepareStatement(
        s"INSERT INTO $table VALUES ($placeholders)")
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
      c.commit()
    } catch {
      case e: Throwable =>
        // rollback can itself throw (dead connection) — never let it
        // mask the original batch failure.
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
