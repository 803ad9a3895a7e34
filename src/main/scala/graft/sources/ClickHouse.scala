package graft.sources

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._
import java.sql.Types
import java.util.Locale

/** ClickHouse SQL dialect for the typed JDBC sink and the Spark JDBC
  * read path — the wire-format half of SURVEY §1.5's "destination is
  * ClickHouse". Everything here is SQL/type-mapping text derived from
  * the public ClickHouse SQL reference; it is exercised in-process
  * (generated DDL/DML and both type-mapping directions are specced),
  * while the live-server integration test stays impossible in this
  * zero-egress sandbox (documented limitation since round 2).
  *
  * Two pieces:
  *   - [[ClickHouseSinkDialect]]: plugs into [[JdbcBackend]] and emits
  *     MergeTree DDL + dedup-token insert settings instead of the ANSI
  *     delete-then-insert transaction.
  *   - [[ClickHouseDialect]]: an `org.apache.spark.sql.jdbc.JdbcDialect`
  *     for `spark.read.jdbc` against a ClickHouse URL, mapping the CH
  *     type system (UInt widths, Nullable/LowCardinality wrappers,
  *     DateTime64, Decimal) into Catalyst types. Register with
  *     [[ClickHouse.registerDialect]].
  */
object ClickHouse {

  /** Idempotent global registration of the read-path dialect. */
  def registerDialect(): Unit = synchronized {
    if (!registered) { JdbcDialects.registerDialect(ClickHouseDialect); registered = true }
  }
  @volatile private var registered = false

  /** Strip ClickHouse type wrappers that do not change the value
    * domain Spark sees: Nullable(T) (nullability is carried by JDBC
    * metadata) and LowCardinality(T) (a dictionary encoding).
    */
  @annotation.tailrec
  def unwrap(typeName: String): String = {
    val t = typeName.trim
    val lower = t.toLowerCase(Locale.ROOT)
    if (lower.startsWith("nullable(") && t.endsWith(")"))
      unwrap(t.substring("nullable(".length, t.length - 1))
    else if (lower.startsWith("lowcardinality(") && t.endsWith(")"))
      unwrap(t.substring("lowcardinality(".length, t.length - 1))
    else t
  }

  /** ClickHouse type name -> Catalyst type. Unsigned widths round up
    * to the next signed Catalyst type that holds the full range
    * (UInt8->Short, ..., UInt64->Decimal(20,0) — the standard lossless
    * embedding). Unknown names return None so Spark falls back to the
    * JDBC type code.
    */
  def catalystType(chType: String): Option[DataType] = {
    val t = unwrap(chType)
    val dec = """(?i)Decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
    val dt64 = """(?i)DateTime64\s*\(.*\)""".r
    val fixed = """(?i)FixedString\s*\(\s*\d+\s*\)""".r
    val arr = """(?i)Array\s*\((.*)\)""".r
    t match {
      // Decimal256 (precision > 38) exceeds Catalyst's DecimalType —
      // fall back to the JDBC type code instead of throwing here.
      case dec(p, s) if p.toInt <= 38 => Some(DecimalType(p.toInt, s.toInt))
      case dec(_, _)   => None
      case dt64()      => Some(TimestampType)
      case fixed()     => Some(StringType)
      case arr(inner)  => catalystType(inner).map(ArrayType(_))
      case _ => t.toLowerCase(Locale.ROOT) match {
        case "int8"               => Some(ByteType)
        case "int16" | "uint8"    => Some(ShortType)
        case "int32" | "uint16"   => Some(IntegerType)
        case "int64" | "uint32"   => Some(LongType)
        case "uint64"             => Some(DecimalType(20, 0))
        // Best-effort, NOT lossless: 128/256-bit ints can exceed 38
        // decimal digits; values past 10^38 fail (or null under
        // non-ANSI) at row conversion. There is no wider Catalyst
        // numeric — callers needing the full range should read these
        // columns as String via a query-side cast.
        case "int128" | "uint128" | "int256" | "uint256" => Some(DecimalType(38, 0))
        case "float32"            => Some(FloatType)
        case "float64"            => Some(DoubleType)
        case "string" | "uuid" | "ipv4" | "ipv6" | "json" => Some(StringType)
        case s if s.startsWith("enum") => Some(StringType)
        case "bool" | "boolean"   => Some(BooleanType)
        case "date" | "date32"    => Some(DateType)
        case "datetime"           => Some(TimestampType)
        case s if s.startsWith("datetime(") => Some(TimestampType)
        case _                    => None
      }
    }
  }

  /** Catalyst type -> ClickHouse column type (without the Nullable
    * wrapper; [[ClickHouseSinkDialect.ddlType]] adds it from the
    * schema's nullability). Timestamps carry Spark's microsecond
    * precision as DateTime64(6).
    */
  def chType(dt: DataType): String = dt match {
    case ByteType           => "Int8"
    case ShortType          => "Int16"
    case IntegerType        => "Int32"
    case LongType           => "Int64"
    case FloatType          => "Float32"
    case DoubleType         => "Float64"
    case BooleanType        => "Bool"
    case StringType         => "String"
    case BinaryType         => "String"
    case DateType           => "Date32"
    case TimestampType      => "DateTime64(6)"
    case d: DecimalType     => s"Decimal(${d.precision}, ${d.scale})"
    case ArrayType(e, _)    => s"Array(${chType(e)})"
    case other =>
      throw new IllegalArgumentException(s"unsupported ClickHouse sink type $other")
  }
}

/** Read-path dialect: `spark.read.jdbc` on a `jdbc:clickhouse:` (or
  * `jdbc:ch:`) URL. Pure type/identifier mapping — no connection is
  * made here, so every method is unit-testable offline.
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean = {
    val u = url.toLowerCase(Locale.ROOT)
    u.startsWith("jdbc:clickhouse:") || u.startsWith("jdbc:ch:")
  }

  /** The ClickHouse JDBC driver reports the native type name (possibly
    * wrapped) in `typeName`; prefer it over the coarse JDBC code.
    */
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    ClickHouse.catalystType(typeName)

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case ByteType       => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType      => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType    => Some(JdbcType("Int32", Types.INTEGER))
    case LongType       => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType      => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType     => Some(JdbcType("Float64", Types.DOUBLE))
    case BooleanType    => Some(JdbcType("Bool", Types.BOOLEAN))
    case StringType     => Some(JdbcType("String", Types.VARCHAR))
    case BinaryType     => Some(JdbcType("String", Types.VARBINARY))
    case DateType       => Some(JdbcType("Date32", Types.DATE))
    case TimestampType  => Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    case d: DecimalType => Some(JdbcType(s"Decimal(${d.precision}, ${d.scale})", Types.DECIMAL))
    case _              => None
  }

  /** Backquote identifiers, escaping embedded backquotes — CH's own
    * quoting rule (doubling the quote char).
    */
  override def quoteIdentifier(colName: String): String =
    "`" + colName.replace("`", "``") + "`"

  /** ClickHouse TRUNCATE only drops the one table. */
  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)
}

/** Sink-side dialect for [[JdbcBackend]] targeting ClickHouse.
  *
  * Differences from the ANSI/Derby path, each the CH-idiomatic
  * equivalent of the same exactly-once contract:
  *   - DDL is `CREATE TABLE IF NOT EXISTS ... ENGINE = MergeTree
  *     ORDER BY graft_batch_key` (create races resolve server-side;
  *     ordering by batch key clusters each batch's rows into adjacent
  *     granules, so a batch-key lookup/delete touches few marks).
  *   - No delete-then-insert transaction: ClickHouse DELETE is an
  *     asynchronous mutation and multi-statement transactions are not
  *     the engine's model. Instead every insert carries
  *     `insert_deduplicate=1` + `insert_deduplication_token=<batchKey>`
  *     so a replayed task's identical batch is dropped server-side —
  *     the native block-dedup contract the delete+insert transaction
  *     emulates on ANSI engines. The DDL enables the non-replicated
  *     dedup window so this holds on plain MergeTree too.
  *
  * Block-granularity caveat: the server dedups per formed BLOCK, and
  * one token must cover exactly one block — an insert the server
  * splits into several blocks (more than `max_insert_block_size` rows,
  * default 1,048,576) would see later blocks dropped as token-dupes.
  * `batchProperties` therefore pins `max_insert_block_size` high; a
  * batch is a Spark-task-held `Seq[Row]`, memory-bounded far below
  * that, so each batch forms a single block.
  */
object ClickHouseSinkDialect extends SinkDialect {

  def quote(ident: String): String = "`" + ident.replace("`", "``") + "`"

  def ddlType(f: StructField): String = {
    val base = ClickHouse.chType(f.dataType)
    // Array columns are never Nullable in CH (elements may be)
    if (f.nullable && !f.dataType.isInstanceOf[ArrayType]) s"Nullable($base)" else base
  }

  def createTableSql(table: String, schema: StructType): String = {
    val cols = schema.fields.map(f => s"${quote(f.name)} ${ddlType(f)}").mkString(", ")
    s"CREATE TABLE IF NOT EXISTS ${quote(table)} " +
      s"(${quote("graft_batch_key")} String, $cols) " +
      "ENGINE = MergeTree ORDER BY " + quote("graft_batch_key") +
      // Plain (non-replicated) MergeTree has the insert-dedup log OFF
      // by default (non_replicated_deduplication_window = 0), which
      // would make the dedup-token replay contract a silent no-op on
      // the very table this DDL creates — so the DDL itself turns the
      // window on. Replicated engines keep their own (always-on)
      // window and ignore this setting.
      " SETTINGS non_replicated_deduplication_window = 10000"
  }

  /** Replay safety comes from the dedup token, not a delete. */
  def deleteBatchSql(table: String): Option[String] = None

  def insertSql(table: String, schema: StructType): String = {
    val placeholders = Seq.fill(schema.length + 1)("?").mkString(", ")
    s"INSERT INTO ${quote(table)} VALUES ($placeholders)"
  }

  def transactional: Boolean = false

  def batchProperties(batchKey: String): Map[String, String] = Map(
    "insert_deduplicate" -> "1",
    "insert_deduplication_token" -> batchKey,
    // one batch must form ONE block for the token contract (see class
    // doc); 100M rows is far beyond any memory-held Seq[Row] batch
    "max_insert_block_size" -> "100000000")

  /** Benign "already exists" is impossible: DDL carries IF NOT EXISTS. */
  def createRaceSqlStates: Set[String] = Set.empty
}
