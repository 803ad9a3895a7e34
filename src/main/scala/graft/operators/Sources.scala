package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import graft.sources.{Dq, Sink, TimeTravel}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group D of SURVEY.md §2 — sources and sinks.
  *
  * Round-trip queries write a table out in the format under test and
  * read it back with an explicit schema; the oracle runs on the
  * original parquet, so a pass proves the round-trip is lossless.
  * Temp outputs are keyed by scale-factor dir so concurrent verify
  * runs do not collide. (No spark-avro datasource jar ships in this
  * Spark build; src_avro instead rides graft.sources.Avro, an
  * avro-core DataFileReader/Writer bridge parallelized by file.)
  */
object Sources {

  private def tmp(dir: String, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Plain parquet scan with filter+projection — the explain-plan spec
    // asserts the filter lands in PushedFilters and ReadSchema prunes.
    "src_parquet" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(col("l_quantity") >= 45)
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity >= 45 ORDER BY l_orderkey, l_linenumber""")),

    // ------------------------------------------------------------------
    "src_csv" -> Q(
      (s, dir) => {
        val out = tmp(dir, "csv")
        Tables.nation(s, dir).write.mode("overwrite")
          .option("header", "true").csv(out)
        val schema = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType)))
        s.read.schema(schema).option("header", "true").csv(out)
          .orderBy("n_nationkey")
      },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    // ------------------------------------------------------------------
    "src_json" -> Q(
      (s, dir) => {
        val out = tmp(dir, "json")
        Tables.supplier(s, dir).write.mode("overwrite").json(out)
        val schema = StructType(Seq(
          StructField("s_suppkey", LongType),
          StructField("s_name", StringType),
          StructField("s_nationkey", IntegerType),
          StructField("s_acctbal", DoubleType)))
        s.read.schema(schema).json(out).orderBy("s_suppkey")
      },
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    // ------------------------------------------------------------------
    "src_orc" -> Q(
      (s, dir) => {
        val out = tmp(dir, "orc")
        Tables.orders(s, dir).write.mode("overwrite").orc(out)
        s.read.orc(out).orderBy("o_orderkey")
      },
      Some("SELECT * FROM orders ORDER BY o_orderkey")),

    // ------------------------------------------------------------------
    // Avro round trip WITHOUT the spark-avro datasource (absent from
    // this build): container files written one-per-partition and read
    // back one-task-per-file through the avro-core bridge
    // (sources/Avro.scala). The oracle runs on the original parquet,
    // so a pass proves the typed round trip is lossless.
    "src_avro" -> Q(
      (s, dir) => {
        val out = tmp(dir, "avro")
        graft.sources.Avro.write(Tables.supplier(s, dir).repartition(4), out)
        val schema = StructType(Seq(
          StructField("s_suppkey", LongType),
          StructField("s_name", StringType),
          StructField("s_nationkey", IntegerType),
          StructField("s_acctbal", DoubleType)))
        graft.sources.Avro.read(s, out, schema).orderBy("s_suppkey")
      },
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    // ------------------------------------------------------------------
    // Text source: one line per row, parsed back with split().
    "src_text" -> Q(
      (s, dir) => {
        val out = tmp(dir, "text")
        Tables.region(s, dir)
          .select(concat_ws("|", col("r_regionkey"), col("r_name")))
          .write.mode("overwrite").text(out)
        s.read.text(out)
          .select(
            split(col("value"), "\\|").getItem(0).cast("int").as("r_regionkey"),
            split(col("value"), "\\|").getItem(1).as("r_name"))
          .orderBy("r_regionkey")
      },
      Some("SELECT * FROM region ORDER BY r_regionkey")),

    // ------------------------------------------------------------------
    // Batched idempotent sink: orders -> jsonl batches via the
    // LocalBackend, read back and re-aggregated; the oracle runs on
    // the source table, so a pass proves no row was lost or doubled.
    // Batch size is ADAPTIVE (>=2 batches per partition at tiny SFs,
    // growing with the table so the batch COUNT stays bounded): a
    // fixed 500-row batch means 10x data = 10x more files and the
    // per-file fixed costs go super-linear (measured 18x on the
    // sf0.1->sf1 decade) — real ingest sinks size batches by volume,
    // bounding file count per micro-batch, exactly this shape.
    "sink_batched" -> Q(
      (s, dir) => {
        val root = tmp(dir, "sink")
        val o = Tables.orders(s, dir)
        val batch = math.max(500L, o.count() / 64).toInt
        val cfg = Sink.SinkConfig(root, "orders", batchSize = batch)
        Sink.write(o, cfg, new Sink.LocalBackend(root))
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType)))
        s.read.schema(schema).json(s"$root/orders")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_orderstatus")
      },
      Some(s"""
        SELECT o_orderstatus, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // Declarative schema-mapping ingest: supplier written as an
    // all-string CSV, two corrupt rows injected, then coerced back to
    // the typed target schema via SchemaMap. Strict cast failures land
    // in the bad-row side channel; the oracle runs on the original
    // parquet, so a pass proves (a) typed coercion is lossless and
    // (b) exactly the corrupt rows were quarantined.
    "src_schema_map" -> Q(
      (s, dir) => {
        import graft.sources.SchemaMap
        import graft.sources.SchemaMap.FieldMap
        val out = tmp(dir, "schemamap")
        Tables.supplier(s, dir)
          .selectExpr("CAST(s_suppkey AS STRING) AS k", "s_name AS nm",
            "CAST(s_nationkey AS STRING) AS nk", "CAST(s_acctbal AS STRING) AS bal")
          .write.mode("overwrite").option("header", "true").csv(out)
        val loose = s.read.option("header", "true").csv(out) // all strings
        import s.implicits._
        val corrupt = Seq(
          ("not_a_number", "BAD SUPPLIER", "7", "1.5"),
          ("424242", "WORSE SUPPLIER", "7", "abc"))
          .toDF("k", "nm", "nk", "bal")
        val mapped = SchemaMap(loose.unionByName(corrupt), Seq(
          FieldMap("k", "s_suppkey", LongType),
          FieldMap("nm", "s_name", StringType),
          FieldMap("nk", "s_nationkey", IntegerType),
          FieldMap("bal", "s_acctbal", DoubleType)))
        // Exactly the two injected rows must be quarantined.
        assert(mapped.bad.count() == 2,
          s"schema-map bad-row channel caught ${mapped.bad.count()} rows, expected 2")
        mapped.good.orderBy("s_suppkey")
      },
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    // ------------------------------------------------------------------
    // JDBC destination sink: typed INSERT...VALUES batches into
    // embedded Derby with per-batch-key transactional overwrite
    // (delete+insert in one txn), then read back through Spark's JDBC
    // source and re-aggregated per month. The oracle runs on the
    // source parquet, so a pass proves the typed round-trip is
    // lossless and the idempotent replay added no duplicates.
    "sink_jdbc" -> Q(
      (s, dir) => {
        // pid-scoped db dir: embedded Derby holds an engine-wide lock
        // for the JVM's lifetime, so a solo re-measure JVM (Bench's
        // SPARK_GRAFT_SOLO children) could never boot a path its
        // parent suite JVM had already opened
        val url = s"jdbc:derby:${tmp(dir,
          s"derby_p${ProcessHandle.current().pid()}")}/db;create=true"
        val cfg = Sink.SinkConfig("", "orders_agg", batchSize = 16)
        // Full reload into a persistent destination: clear first —
        // batch-key overwrite alone would leave stale batches if a
        // previous run produced more partitions than this one.
        graft.sources.Jdbc.truncate(url, "orders_agg")
        val agg = Tables.orders(s, dir)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        Sink.writeTyped(agg, cfg, new graft.sources.JdbcBackend(url))
        s.read.format("jdbc")
          .option("url", url).option("dbtable", "orders_agg").load()
          .select(col("o_month").as("o_month"), col("n").as("n"),
            col("total").as("total"))
          .orderBy("o_month")
      },
      Some(s"""
        SELECT strftime(o_orderdate, '%Y-%m') AS o_month, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders GROUP BY 1 ORDER BY o_month""")),

    // ------------------------------------------------------------------
    // CH-style final layout: PARTITION BY month, ORDER BY custkey
    // within partitions; read back per-partition rollup.
    "sink_partitioned" -> Q(
      (s, dir) => {
        val out = tmp(dir, "part")
        Sink.writePartitionedSorted(Tables.orders(s, dir), out,
          "o_month" -> date_format(col("o_orderdate"), "yyyy-MM"),
          Seq("o_custkey"))
        s.read.parquet(out)
          .groupBy("o_month")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_month")
      },
      Some(s"""
        SELECT strftime(o_orderdate, '%Y-%m') AS o_month, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders GROUP BY 1 ORDER BY o_month""")),

    // ------------------------------------------------------------------
    // Upsert as append + merge-on-read (ReplacingMergeTree FINAL over
    // a multi-batch layout): the base load and an update batch land
    // as separate APPENDS (no rewrite of existing files — the only
    // write pattern that scales for continuous ingest), and readers
    // collapse to latest-version rows with one argMax aggregation.
    // The oracle recomputes the expected post-upsert state from the
    // source table, so a pass proves no row was lost, duplicated, or
    // left stale.
    "sink_upsert" -> Q(
      (s, dir) => {
        val out = tmp(dir, "upsert")
        val base = Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .withColumn("version", lit(1L))
        base.write.mode("overwrite").parquet(out)
        base.filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .withColumn("o_orderstatus", lit("X"))
          .withColumn("o_totalprice", col("o_totalprice") * 2)
          .withColumn("version", lit(2L))
          .write.mode("append").parquet(out)
        ClickHouse.replacingMergeTree(s.read.parquet(out),
            Seq("o_orderkey"), col("version"), col("version"))
          .select("o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "version")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 10 = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice,
               CAST(CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END
                 AS BIGINT) AS version
        FROM orders ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // TTL as partition DROP (CH `ALTER TABLE ... DROP PARTITION`):
    // events land day-partitioned, expiry deletes whole partition
    // directories by their VALUE — no data file is opened, so the
    // operation is O(partitions) metadata work at any table size
    // (the scale mechanism ch_ttl's row filter only approximates).
    // Oracle = the same day cutoff on the source table.
    "ch_ttl_drop" -> Q(
      (s, dir) => {
        val out = tmp(dir, "ttldrop")
        Sink.writePartitionedSorted(Tables.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts_us", "value"), out,
          "ev_day" -> from_unixtime(expr("ts_us div 1000000"), "yyyy-MM-dd"),
          Seq("user_id"))
        Sink.dropExpiredPartitions(s, out, "ev_day", _ < "2024-01-15")
        s.read.parquet(out)
          .groupBy(col("ev_day").cast("string").as("ev_day"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .orderBy("ev_day")
      },
      Some(s"""
        SELECT strftime(ts, '%Y-%m-%d') AS ev_day, count(*) AS n,
               ${S.dsum("value")} AS total
        FROM events WHERE strftime(ts, '%Y-%m-%d') >= '2024-01-15'
        GROUP BY 1 ORDER BY ev_day""")),

    // ------------------------------------------------------------------
    // Same layout for the event stream (group B's ch_final_write):
    // month partitions age out whole for TTL, user_id order inside.
    "ch_final_write" -> Q(
      (s, dir) => {
        val out = tmp(dir, "final")
        Sink.writePartitionedSorted(Tables.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts_us", "value"), out,
          "ev_month" -> from_unixtime(expr("ts_us div 1000000"), "yyyy-MM"),
          Seq("user_id"))
        s.read.parquet(out)
          .groupBy("ev_month")
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("uniq_users"))
          .orderBy("ev_month")
      },
      Some("""
        SELECT strftime(ts, '%Y-%m') AS ev_month, count(*) AS n,
               count(DISTINCT user_id) AS uniq_users
        FROM events GROUP BY 1 ORDER BY ev_month""")),

    // ------------------------------------------------------------------
    // JDBC SOURCE with partitioned parallel read — the ingest twin of
    // sink_jdbc. The table is seeded through the typed sink (test
    // scaffolding; any JDBC database works), then read back with
    // partitionColumn/numPartitions so each executor pulls a disjoint
    // key range concurrently — the shape that matters when the
    // upstream store is the bottleneck. The oracle runs on the source
    // parquet, so a pass proves the partitioned read reassembles the
    // table exactly (no range gaps or overlaps).
    "src_jdbc" -> Q(
      (s, dir) => {
        // pid-scoped for solo re-measure JVMs (see sink_jdbc's comment)
        val url = s"jdbc:derby:${tmp(dir,
          s"derbysrc_p${ProcessHandle.current().pid()}")}/db;create=true"
        graft.sources.Jdbc.truncate(url, "supplier_src")
        val sup = Tables.supplier(s, dir)
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        // volume-adaptive batches, same rationale as sink_batched: a
        // fixed 32-row batch means 10x data = 10x more INSERT
        // transactions and the per-txn fixed cost goes super-linear
        // (3k+ txns at sf10); real loaders size batches by volume
        val cfg = Sink.SinkConfig("", "supplier_src",
          batchSize = math.max(32L, sup.count() / 128).toInt)
        Sink.writeTyped(sup, cfg, new graft.sources.JdbcBackend(url))
        s.read.format("jdbc")
          .option("url", url).option("dbtable", "supplier_src")
          .option("partitionColumn", "s_suppkey")
          .option("lowerBound", "0")
          .option("upperBound", "1000000")
          .option("numPartitions", "4")
          .load()
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
            col("s_acctbal"))
          .orderBy("s_suppkey")
      },
      Some("""
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier ORDER BY s_suppkey""")),

    // ------------------------------------------------------------------
    // Parquet AGGREGATE pushdown: count/min/max answered from footer
    // metadata — zero row groups decoded, the 100 TB way to take a
    // table's pulse. Needs the DSv2 parquet reader, so it runs in an
    // isolated newSession (same SparkContext, own conf) without
    // disturbing the rest of the registry; PlanSpec asserts the scan
    // shows PushedAggregation.
    "src_agg_pushdown" -> Q(
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.sources.useV1SourceList", "")
        s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        // timestamp min/max is not pushable (and one unsupported
        // aggregate disables pushdown for the whole scan), so the
        // probe sticks to bigint/double columns
        s2.read.parquet(s"$dir/lineitem.parquet")
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_orderkey")).as("min_key"),
            max(col("l_orderkey")).as("max_key"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"))
      },
      Some("""
        SELECT count(*) AS n_rows, min(l_orderkey) AS min_key,
               max(l_orderkey) AS max_key, min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem""")),

    // ------------------------------------------------------------------
    // Schema evolution across batches: an old batch written without a
    // column and a new batch written with it are read back as ONE
    // dataset via mergeSchema (the parquet footer union), the absent
    // column surfacing as NULL for old rows — the day-two ETL reality
    // after any additive schema change. The oracle reproduces the
    // same union from the source table, so a pass proves the merged
    // read neither drops rows nor misaligns the evolved column.
    "src_schema_evolution" -> Q(
      (s, dir) => {
        val out = tmp(dir, "evolve")
        val o = Tables.orders(s, dir)
        o.filter(year(col("o_orderdate")) < 1995)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$out/b1")
        o.filter(year(col("o_orderdate")) >= 1995)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .write.mode("overwrite").parquet(s"$out/b2")
        s.read.option("mergeSchema", "true").parquet(s"$out/b1", s"$out/b2")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderpriority").asc_nulls_first)
      },
      Some(s"""
        SELECT CASE WHEN year(o_orderdate) >= 1995
                    THEN o_orderpriority END AS o_orderpriority,
               count(*) AS n, ${S.dsum("o_totalprice")} AS total
        FROM orders GROUP BY 1
        ORDER BY o_orderpriority NULLS FIRST""")),

    // ------------------------------------------------------------------
    // CSV with embedded delimiters, quotes, and NULLs — the cases
    // that break naive CSV handling. A derived column embeds ", and
    // a literal quote; NULLs are written with an explicit sentinel
    // (RFC-4180 quote-doubling via escape='"') and the read-back uses
    // the same dialect. The oracle computes the derived columns from
    // the source parquet, so a pass proves the round-trip preserves
    // every byte and NULL exactly.
    "src_csv_quoted" -> Q(
      (s, dir) => {
        val out = tmp(dir, "csvq")
        Tables.part(s, dir)
          .select(col("p_partkey"),
            concat(col("p_brand"), lit(", \""), col("p_type"), lit("\""))
              .as("note"),
            when(pmod(col("p_partkey"), lit(7)) === 0, lit(null))
              .otherwise(col("p_name")).as("box"))
          .write.mode("overwrite")
          .option("header", "true").option("quote", "\"")
          .option("escape", "\"").option("nullValue", "\\N")
          .csv(out)
        s.read
          .schema("p_partkey LONG, note STRING, box STRING")
          .option("header", "true").option("quote", "\"")
          .option("escape", "\"").option("nullValue", "\\N")
          .csv(out)
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               p_brand || ', "' || p_type || '"' AS note,
               CASE WHEN p_partkey % 7 = 0 THEN NULL
                    ELSE p_name END AS box
        FROM part ORDER BY p_partkey""")),

    // ------------------------------------------------------------------
    // Dynamic partition overwrite — the backfill/mutation pattern on
    // an immutable columnar layout: rewrite ONE month's partition
    // (here: 1995-06 with a 10% price correction) while every other
    // partition's files are untouched (copy-on-write at partition
    // granularity, the scalable stand-in for row-level UPDATE).
    // partitionOverwriteMode=dynamic makes the overwrite scoped to
    // partitions present in the written batch instead of the whole
    // table. The oracle applies the same correction to the source
    // table, so a pass proves exactly one partition changed and none
    // were lost.
    "sink_dynamic_overwrite" -> Q(
      (s, dir) => {
        val out = tmp(dir, "dynover")
        val o = Tables.orders(s, dir)
          .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        // r13: parallel range-partitioned seed — the plain partitionBy
        // write ran ONE scan task writing all ~80 month files serially
        // (a single 1.4 s job dominating the query).
        graft.sources.Sink.writePartitionedSorted(Tables.orders(s, dir), out,
          "o_month" -> date_format(col("o_orderdate"), "yyyy-MM"),
          Seq("o_custkey"))
        val patched = o.filter(col("o_month") === "1995-06")
          .withColumn("o_totalprice",
            (d(col("o_totalprice")) * lit(1.1).cast(DecimalType(3, 1)))
              .cast("double"))
        patched.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("o_month").parquet(out)
        s.read.parquet(out)
          .groupBy("o_month")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_month")
      },
      Some(s"""
        SELECT strftime(o_orderdate, '%Y-%m') AS o_month, count(*) AS n,
               CAST(sum(CASE WHEN strftime(o_orderdate, '%Y-%m') = '1995-06'
                 THEN CAST(CAST(${S.d("o_totalprice")} * CAST(1.1 AS DECIMAL(3,1))
                   AS DOUBLE) AS DECIMAL(12,4))
                 ELSE ${S.d("o_totalprice")} END) AS DOUBLE) AS total
        FROM orders GROUP BY 1 ORDER BY o_month""")),

    // ------------------------------------------------------------------
    // Bucketed layout + bucket-PRUNED point lookup: the table is
    // written bucketBy(8, o_custkey); an equality filter on the
    // bucket key scans 1 of 8 buckets (SelectedBucketsCount in the
    // plan, asserted in PlanSpec) — the point-query answer on a fact
    // table, complementing q_bucketed_join's zero-shuffle join on the
    // same layout. Oracle = the same filter on the source parquet, so
    // a pass also proves bucket routing loses no rows.
    "src_bucket_pruning" -> Q(
      (s, dir) => {
        bucketedOrders(s, dir)
          .filter(col("o_custkey") === 42)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_custkey = 42 ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // Snapshot time travel (graft.sources.TimeTravel): v1 commits the
    // pre-1997 orders, v2 APPENDS the rest; the query reads BOTH
    // versions after v2 is published and returns per-version yearly
    // rollups. A pass proves v1 still reads exactly its snapshot
    // (append never rewrote its files) and v2 composes to the full
    // table. TimeTravelSpec additionally proves overwrite isolation
    // and manifest-flip atomicity properties.
    "src_time_travel" -> Q(
      (s, dir) => {
        val root = tmp(dir, "timetravel")
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val o = Tables.orders(s, dir)
        val v1 = TimeTravel.commitAppend(
          o.filter(col("o_orderdate") < "1997-01-01"), root)
        val v2 = TimeTravel.commitAppend(
          o.filter(col("o_orderdate") >= "1997-01-01"), root)
        def roll(v: Int) = TimeTravel.readVersion(s, root, v)
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("version", lit(v))
        roll(v1).unionByName(roll(v2))
          .select("version", "o_year", "n", "total")
          .orderBy("version", "o_year")
      },
      Some(s"""
        SELECT 1 AS version, year(o_orderdate) AS o_year, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders WHERE o_orderdate < DATE '1997-01-01' GROUP BY 2
        UNION ALL
        SELECT 2, year(o_orderdate), count(*), ${S.dsum("o_totalprice")}
        FROM orders GROUP BY 2
        ORDER BY version, o_year""")),

    // ------------------------------------------------------------------
    // Small-file compaction (Sink.compactPartitioned): a fragmented
    // day-partitioned layout (forced 16-way split per append — the
    // shape continuous ingest leaves behind) is rewritten to ONE
    // sorted file per partition in a NEW directory (publish = pointer
    // flip, never in-place). The query returns per-day rollups of the
    // COMPACTED copy; the oracle runs on the source table, so a pass
    // proves compaction is row-exact. TtlDropSpec asserts the layout
    // half: exactly one file per partition afterwards.
    "sink_compact" -> Q(
      (s, dir) => {
        val frag = tmp(dir, "compact_in")
        val out = tmp(dir, "compact_out")
        Tables.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts_us", "value")
          .withColumn("ev_day",
            from_unixtime(expr("ts_us div 1000000"), "yyyy-MM-dd"))
          .repartition(16) // fragment: every task writes every partition
          .write.mode("overwrite").partitionBy("ev_day").parquet(frag)
        Sink.compactPartitioned(s, frag, out, "ev_day",
          Seq("user_id", "ts_us"))
        s.read.parquet(out)
          .groupBy(col("ev_day").cast("string").as("ev_day"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("uniq_users"),
            dsum(col("value")).as("total"))
          .orderBy("ev_day")
      },
      Some(s"""
        SELECT strftime(ts, '%Y-%m-%d') AS ev_day, count(*) AS n,
               count(DISTINCT user_id) AS uniq_users, ${S.dsum("value")} AS total
        FROM events GROUP BY 1 ORDER BY ev_day""")),

    // ------------------------------------------------------------------
    // Declarative data-quality expectations (graft.sources.Dq): five
    // scan rules compile into ONE aggregate pass over orders (one
    // scan however many rules), plus one broadcast anti-join
    // referential check against customer. The value-range rule is
    // deliberately one that FIRES, so a pass proves real counting,
    // not all-zeros.
    "dq_checks" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val scan = Dq.scanChecks(o, Seq(
          Dq.uniqueRule("dup_orderkey", col("o_orderkey")),
          Dq.rowRule("null_orderdate", col("o_orderdate").isNull),
          Dq.rowRule("neg_totalprice", col("o_totalprice") < 0),
          Dq.rowRule("bad_status",
            !col("o_orderstatus").isin("F", "O", "P")),
          Dq.rowRule("price_over_300k", col("o_totalprice") > 300000)))
        scan.unionByName(Dq.refCheck("fk_custkey", o, col("o_custkey"),
            Tables.customer(s, dir), col("c_custkey")))
          .orderBy("rule")
      },
      Some("""
        SELECT 'dup_orderkey' AS rule,
               count(*) - count(DISTINCT o_orderkey) AS violations FROM orders
        UNION ALL SELECT 'null_orderdate',
               count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
        UNION ALL SELECT 'neg_totalprice',
               count(*) FILTER (WHERE o_totalprice < 0) FROM orders
        UNION ALL SELECT 'bad_status',
               count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
               FROM orders
        UNION ALL SELECT 'price_over_300k',
               count(*) FILTER (WHERE o_totalprice > 300000) FROM orders
        UNION ALL SELECT 'fk_custkey',
               (SELECT count(*) FROM orders
                LEFT JOIN customer ON o_custkey = c_custkey
                WHERE c_custkey IS NULL)
        ORDER BY rule""")),

    // ------------------------------------------------------------------
    // Column profiling (ANALYZE-style statistics collection, the
    // input to CBO and pruning): min/max/exact-NDV/null-count for
    // five orders columns in ONE scan — 20 aggregates in a single
    // hash aggregation, then a stack() unpivot to long format.
    // min/max surface as strings through type-stable casts (decimal
    // for the money column so both engines render identically).
    "dq_profile" -> Q(
      (s, dir) => {
        val cols = Seq(
          "o_orderkey" -> col("o_orderkey"),
          "o_custkey" -> col("o_custkey"),
          "o_orderstatus" -> col("o_orderstatus"),
          "o_totalprice" -> col("o_totalprice").cast(DecimalType(12, 2)),
          "o_orderdate" -> col("o_orderdate").cast("date"))
        // r13: min/max over a STRING column carry a variable-width
        // aggregation buffer, which disqualifies HashAggregateExec for
        // the WHOLE 20-function aggregate — the multi-distinct Expand
        // then runs Sort + interpreted SortAggregate over 6x the scan
        // rows (measured 3.3 s vs 1.5 s at sf0.1). Hoisting the two
        // string min/max into their own single-column aggregate (one
        // extra narrow scan, broadcast back as one row) restores the
        // fixed-width HashAggregate for everything else; output values
        // are identical (SinkSpec pins the no-SortAggregate plan).
        val aggs = cols.flatMap { case (n, c) =>
          (if (n == "o_orderstatus") Seq.empty[Column] else Seq(
            min(c).cast("string").as(s"${n}_min"),
            max(c).cast("string").as(s"${n}_max"))) ++ Seq(
          countDistinct(c).as(s"${n}_ndv"),
          count_if(c.isNull).as(s"${n}_nulls")) }
        val statusMinMax = Tables.orders(s, dir).agg(
          min(col("o_orderstatus")).cast("string").as("o_orderstatus_min"),
          max(col("o_orderstatus")).cast("string").as("o_orderstatus_max"))
        val stacked = cols.map { case (n, _) =>
          s"'$n', ${n}_min, ${n}_max, ${n}_ndv, ${n}_nulls" }.mkString(", ")
        Tables.orders(s, dir)
          .agg(aggs.head, aggs.tail: _*)
          .crossJoin(broadcast(statusMinMax))
          .select(expr(s"stack(${cols.size}, $stacked) " +
            "AS (column_name, min_v, max_v, ndv, nulls)"))
          .orderBy("column_name")
      },
      Some("""
        SELECT 'o_orderkey' AS column_name,
               CAST(min(o_orderkey) AS VARCHAR) AS min_v,
               CAST(max(o_orderkey) AS VARCHAR) AS max_v,
               count(DISTINCT o_orderkey) AS ndv,
               count(*) FILTER (WHERE o_orderkey IS NULL) AS nulls
        FROM orders
        UNION ALL SELECT 'o_custkey', CAST(min(o_custkey) AS VARCHAR),
               CAST(max(o_custkey) AS VARCHAR), count(DISTINCT o_custkey),
               count(*) FILTER (WHERE o_custkey IS NULL) FROM orders
        UNION ALL SELECT 'o_orderstatus', min(o_orderstatus),
               max(o_orderstatus), count(DISTINCT o_orderstatus),
               count(*) FILTER (WHERE o_orderstatus IS NULL) FROM orders
        UNION ALL SELECT 'o_totalprice',
               CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR),
               CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR),
               count(DISTINCT o_totalprice),
               count(*) FILTER (WHERE o_totalprice IS NULL) FROM orders
        UNION ALL SELECT 'o_orderdate',
               CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR),
               CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR),
               count(DISTINCT o_orderdate),
               count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
        ORDER BY column_name""")),

    // ------------------------------------------------------------------
    // The 100 TB-shaped twin of dq_profile: HLL approximate NDV
    // (approx_count_distinct, rsd=1%) in the SAME single-scan
    // 20-aggregate shape — but with NO Expand (the exact twin plans
    // an Expand that multiplies scan rows 4x) and bounded sketch
    // state per column instead of unbounded exact-distinct state.
    // This is what ANALYZE actually runs at scale. Estimator VALUES
    // are engine-specific, so the VERIFY shape (the fn the oracle
    // gate runs) — the ch_quantiles_approx device — carries a
    // per-column CERTIFICATE instead: ndv_ok = |HLL - exact| <= 5% *
    // exact (rsd 1% leaves wide margin), with the exact counts from
    // per-column single-distinct aggregations (each rewrites to a
    // two-phase agg; only MULTI-column exact NDV in one agg forces
    // the Expand this twin exists to avoid, so even the certified
    // plan stays Expand-free — SinkSpec asserts it). The DuckDB
    // oracle recomputes the exact profile and asserts TRUE: a broken
    // estimator fails the hard driver gate. The BENCHED shape
    // (benchFn) is the pure one-pass HLL profile — the certificate's
    // five exact-NDV scans are verify machinery, not operator cost,
    // so the benchmark measures the single bounded-state scan a
    // 100 TB ANALYZE would actually run.
    "dq_profile_approx" -> {
      val profCols = Seq(
        "o_orderkey" -> col("o_orderkey"),
        "o_custkey" -> col("o_custkey"),
        "o_orderstatus" -> col("o_orderstatus"),
        "o_totalprice" -> col("o_totalprice").cast(DecimalType(12, 2)),
        "o_orderdate" -> col("o_orderdate").cast("date"))
      // r13: the NDV sketch is now hll_sketch_agg (DataSketches HLL,
      // lgK=14 -> ~0.8% rsd, comfortably inside the 5% certificate)
      // instead of approx_count_distinct(rsd=0.01). The built-in HLL++
      // declares its 2^14-register state as ~1640 LONG aggregation
      // attributes PER COLUMN: five of them made an 8210-attribute
      // buffer, a 529 KB physical plan, and either an interpreted
      // SortAggregate (with string min/max present) or a pathological
      // wide-row HashAggregate (measured 4.4 s) — planning cost alone
      // was seconds. The sketch aggregate carries ONE opaque binary
      // buffer per column and, being a TypedImperativeAggregate,
      // plans the whole profile as ObjectHashAggregate — where string
      // min/max buffers are also fine, so the profile stays ONE scan.
      // Sketch inputs must be integral/string: decimal/date columns
      // enter through injective images (exact cents; days-since-epoch),
      // which preserve the NDV being estimated.
      def approxRow(s: SparkSession, dir: String): DataFrame = {
        def sketchIn(n: String, c: Column): Column = n match {
          case "o_totalprice" => graft.Dec.cents(col("o_totalprice"))
          case "o_orderdate" => unix_date(c)
          case _ => c
        }
        val aggs = profCols.flatMap { case (n, c) => Seq(
          min(c).cast("string").as(s"${n}_min"),
          max(c).cast("string").as(s"${n}_max"),
          hll_sketch_estimate(hll_sketch_agg(sketchIn(n, c), lit(14)))
            .as(s"${n}_ndv"),
          count_if(c.isNull).as(s"${n}_nulls")) }
        Tables.orders(s, dir).agg(aggs.head, aggs.tail: _*)
      }
      val pureProfile: (SparkSession, String) => DataFrame = (s, dir) => {
        val stacked = profCols.map { case (n, _) =>
          s"'$n', ${n}_min, ${n}_max, ${n}_ndv, ${n}_nulls" }.mkString(", ")
        approxRow(s, dir)
          .select(expr(s"stack(${profCols.size}, $stacked) " +
            "AS (column_name, min_v, max_v, ndv, nulls)"))
          .orderBy("column_name")
      }
      val certified: (SparkSession, String) => DataFrame = (s, dir) => {
        val withExact = profCols.foldLeft(approxRow(s, dir)) {
          case (df, (n, c)) =>
            df.crossJoin(broadcast(Tables.orders(s, dir)
              .agg(countDistinct(c).as(s"${n}_xndv"))))
        }
        val stacked = profCols.map { case (n, _) =>
          s"'$n', ${n}_min, ${n}_max, " +
            s"abs(${n}_ndv - ${n}_xndv) <= 0.05d * ${n}_xndv, ${n}_nulls"
        }.mkString(", ")
        withExact
          .select(expr(s"stack(${profCols.size}, $stacked) " +
            "AS (column_name, min_v, max_v, ndv_ok, nulls)"))
          .orderBy("column_name")
      }
      Q(certified,
      Some("""
        SELECT 'o_orderkey' AS column_name,
               CAST(min(o_orderkey) AS VARCHAR) AS min_v,
               CAST(max(o_orderkey) AS VARCHAR) AS max_v,
               TRUE AS ndv_ok,
               count(*) FILTER (WHERE o_orderkey IS NULL) AS nulls
        FROM orders
        UNION ALL SELECT 'o_custkey', CAST(min(o_custkey) AS VARCHAR),
               CAST(max(o_custkey) AS VARCHAR), TRUE,
               count(*) FILTER (WHERE o_custkey IS NULL) FROM orders
        UNION ALL SELECT 'o_orderstatus', min(o_orderstatus),
               max(o_orderstatus), TRUE,
               count(*) FILTER (WHERE o_orderstatus IS NULL) FROM orders
        UNION ALL SELECT 'o_totalprice',
               CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR),
               CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR),
               TRUE,
               count(*) FILTER (WHERE o_totalprice IS NULL) FROM orders
        UNION ALL SELECT 'o_orderdate',
               CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR),
               CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR),
               TRUE,
               count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
        ORDER BY column_name"""),
        benchFn = Some(pureProfile))
    },

    // ------------------------------------------------------------------
    // Write-audit-publish: the incremental batch is STAGED (invisible
    // to readers), audited by the dq engine, and only a clean audit
    // publishes it — one rename + one manifest write, no data copy.
    // The query returns the published table's yearly rollup; the
    // oracle is the full source table, so a pass proves the staged
    // batch became exactly visible. TimeTravelSpec proves the abort
    // half: a failing audit leaves every published version untouched.
    "sink_wap" -> Q(
      (s, dir) => {
        val root = tmp(dir, "wap")
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val o = Tables.orders(s, dir)
        TimeTravel.commitAppend(
          o.filter(col("o_orderdate") < "1997-01-01"), root): Unit
        TimeTravel.stage(
          o.filter(col("o_orderdate") >= "1997-01-01"), root, "inc")
        val audit = Dq.scanChecks(TimeTravel.readStaged(s, root, "inc"), Seq(
          Dq.uniqueRule("dup_orderkey", col("o_orderkey")),
          Dq.rowRule("null_orderdate", col("o_orderdate").isNull),
          Dq.rowRule("neg_totalprice", col("o_totalprice") < 0)))
        if (Dq.passes(audit)) TimeTravel.publishStaged(s, root, "inc"): Unit
        else TimeTravel.abortStaged(s, root, "inc")
        TimeTravel.readLatest(s, root)
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_year")
      },
      Some(s"""
        SELECT year(o_orderdate) AS o_year, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders GROUP BY 1 ORDER BY o_year"""))
  )

  /** The bucketed-orders catalog table, (re)written once per (JVM,
    * sf dir): bucket pruning and bucketed joins need a catalog table
    * (bucketing metadata lives in the catalog, not the files).
    */
  private val bucketed = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def bucketedOrders(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val table = "graft_bucketed_orders_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    // The auto-bucketed-scan heuristic turns OFF bucketed reads for
    // scan-only queries — which also forfeits bucket PRUNING, the
    // very thing a point lookup wants. Disable the heuristic;
    // bucketed joins are unaffected.
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    bucketed.computeIfAbsent(table, _ => {
      Tables.orders(s, dir).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", tmp(dir, "bucketed_orders"))
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .saveAsTable(table)
      table
    })
    s.table(table)
  }
}
