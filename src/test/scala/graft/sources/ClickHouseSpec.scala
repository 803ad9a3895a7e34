package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** ClickHouse dialect — everything that can be verified without a
  * server: both type-mapping directions, wrapper unwrapping, DDL/DML
  * text, identifier quoting, and the dedup-token replay contract.
  * (The live wire test needs a reachable ClickHouse and stays a
  * documented limitation of the zero-egress sandbox.)
  */
class ClickHouseSpec extends AnyFunSuite {

  test("url routing: clickhouse and ch JDBC prefixes, nothing else") {
    assert(ClickHouseDialect.canHandle("jdbc:clickhouse://host:8123/db"))
    assert(ClickHouseDialect.canHandle("jdbc:ch://host:8443/db?ssl=true"))
    assert(!ClickHouseDialect.canHandle("jdbc:derby:memory:g"))
    assert(!ClickHouseDialect.canHandle("jdbc:postgresql://h/db"))
  }

  test("wrapper unwrapping strips Nullable and LowCardinality, nested") {
    assert(ClickHouse.unwrap("Nullable(Int64)") == "Int64")
    assert(ClickHouse.unwrap("LowCardinality(Nullable(String))") == "String")
    assert(ClickHouse.unwrap("Int32") == "Int32")
  }

  test("CH -> Catalyst: signed/unsigned widths, temporal, decimal, array") {
    def ct(s: String) = ClickHouse.catalystType(s)
    assert(ct("Int8").contains(ByteType))
    assert(ct("UInt8").contains(ShortType))   // unsigned rounds up
    assert(ct("Int16").contains(ShortType))
    assert(ct("UInt16").contains(IntegerType))
    assert(ct("Int32").contains(IntegerType))
    assert(ct("UInt32").contains(LongType))
    assert(ct("Int64").contains(LongType))
    assert(ct("UInt64").contains(DecimalType(20, 0))) // full range kept
    assert(ct("Float32").contains(FloatType))
    assert(ct("Float64").contains(DoubleType))
    assert(ct("Decimal(18, 4)").contains(DecimalType(18, 4)))
    assert(ct("Decimal(76, 10)").isEmpty) // Decimal256 > Catalyst max 38
    assert(ct("Date").contains(DateType))
    assert(ct("Date32").contains(DateType))
    assert(ct("DateTime").contains(TimestampType))
    assert(ct("DateTime64(3)").contains(TimestampType))
    assert(ct("DateTime64(6, 'UTC')").contains(TimestampType))
    assert(ct("String").contains(StringType))
    assert(ct("FixedString(16)").contains(StringType))
    assert(ct("UUID").contains(StringType))
    assert(ct("Enum8('a' = 1)").contains(StringType))
    assert(ct("Bool").contains(BooleanType))
    assert(ct("Array(Nullable(Int64))").contains(ArrayType(LongType)))
    assert(ct("SomeFutureType").isEmpty) // unknown -> JDBC-code fallback
  }

  test("read dialect maps through typeName, ignoring the JDBC code") {
    val got = ClickHouseDialect.getCatalystType(
      java.sql.Types.OTHER, "Nullable(UInt32)", 0, new MetadataBuilder)
    assert(got.contains(LongType))
  }

  test("Catalyst -> CH: round-trippable lexicon, micros timestamps") {
    assert(ClickHouse.chType(LongType) == "Int64")
    assert(ClickHouse.chType(TimestampType) == "DateTime64(6)")
    assert(ClickHouse.chType(DecimalType(12, 4)) == "Decimal(12, 4)")
    assert(ClickHouse.chType(ArrayType(FloatType)) == "Array(Float32)")
    assert(ClickHouse.chType(BinaryType) == "String")
    val jt = ClickHouseDialect.getJDBCType(DoubleType)
    assert(jt.exists(_.databaseTypeDefinition == "Float64"))
  }

  test("identifier quoting backquotes and doubles embedded backquotes") {
    assert(ClickHouseDialect.quoteIdentifier("a`b") == "`a``b`")
    assert(ClickHouseSinkDialect.quote("order") == "`order`")
  }

  test("sink DDL: IF NOT EXISTS MergeTree ordered by the batch key, " +
      "nullability from the schema") {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true),
      StructField("tags", ArrayType(StringType), nullable = true)))
    val ddl = ClickHouseSinkDialect.createTableSql("t1", schema)
    assert(ddl == "CREATE TABLE IF NOT EXISTS `t1` (`graft_batch_key` String, " +
      "`k` Int64, `v` Nullable(Float64), `tags` Array(String)) " +
      "ENGINE = MergeTree ORDER BY `graft_batch_key` " +
      // without this, plain MergeTree ignores the dedup token entirely
      "SETTINGS non_replicated_deduplication_window = 10000")
  }

  test("sink replay contract: no delete, no transaction, dedup token " +
      "carries the batch key") {
    assert(ClickHouseSinkDialect.deleteBatchSql("t").isEmpty)
    assert(!ClickHouseSinkDialect.transactional)
    val props = ClickHouseSinkDialect.batchProperties("part3-epoch7")
    assert(props("insert_deduplicate") == "1")
    assert(props("insert_deduplication_token") == "part3-epoch7")
    // one batch must form one block for the token to cover it
    assert(props("max_insert_block_size").toLong >= 100000000L)
    val schema = StructType(Seq(StructField("k", LongType)))
    assert(ClickHouseSinkDialect.insertSql("t", schema) ==
      "INSERT INTO `t` VALUES (?, ?)")
  }

  test("ANSI dialect text is unchanged by the dialect refactor " +
      "(pins the SQL the Derby specs execute)") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    assert(AnsiSinkDialect.createTableSql("t", schema) ==
      "CREATE TABLE t (graft_batch_key VARCHAR(64) NOT NULL, " +
      "k BIGINT, s VARCHAR(4096))")
    assert(AnsiSinkDialect.deleteBatchSql("t")
      .contains("DELETE FROM t WHERE graft_batch_key = ?"))
    assert(AnsiSinkDialect.insertSql("t", schema) ==
      "INSERT INTO t VALUES (?, ?, ?)")
    assert(AnsiSinkDialect.transactional)
  }

  test("registerDialect routes a clickhouse URL through the dialect") {
    ClickHouse.registerDialect()
    ClickHouse.registerDialect() // idempotent
    val d = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:clickhouse://h/db")
    assert(d eq ClickHouseDialect)
  }
}
