package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import org.apache.spark.sql.functions._

/** Group C of SURVEY.md §2 — the scalar function surface (ClickHouse's
  * date/string/JSON/conditional/array/hash functions on Spark's
  * codegen'd built-ins — no UDFs anywhere, so every expression stays
  * inside whole-stage codegen).
  */
object Functions {

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // toStartOfMonth/Day/Hour + extract + date arithmetic.
    "f_datetime" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .select(col("o_orderkey"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            date_trunc("day", col("o_orderdate")).as("day_start"),
            date_trunc("hour", col("o_orderdate")).as("hour_start"),
            year(col("o_orderdate")).as("o_year"),
            month(col("o_orderdate")).as("o_month"),
            dayofmonth(col("o_orderdate")).as("o_day"),
            date_add(col("o_orderdate"), 30).as("plus_30d"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
              .as("days_since_95"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               date_trunc('month', o_orderdate) AS month_start,
               date_trunc('day', o_orderdate) AS day_start,
               date_trunc('hour', o_orderdate) AS hour_start,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_month,
               CAST(day(o_orderdate) AS INTEGER) AS o_day,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
               CAST(datediff('day', DATE '1995-01-01',
                 CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95
        FROM orders ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // Second datetime batch: week/quarter grains, month arithmetic,
    // ISO fields, epoch round-trip (CH's toStartOfWeek/toQuarter/
    // addMonths/toDayOfWeek/toUnixTimestamp family).
    "f_datetime2" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .select(col("o_orderkey"),
            date_trunc("week", col("o_orderdate")).cast("date").as("week_start"),
            quarter(col("o_orderdate")).as("qtr"),
            dayofweek(col("o_orderdate")).as("dow"),
            dayofyear(col("o_orderdate")).as("doy"),
            add_months(col("o_orderdate"), 2).as("plus_2mo"),
            last_day(col("o_orderdate")).as("month_end"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        FROM orders ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // Conditional aggregates (CH's sumIf/countIf/avgIf/uniqIf): in
    // Spark these are agg(expr FILTER (WHERE ...)) / when()-guarded
    // aggregates — still ONE pass, one hash aggregation, partial
    // aggregation intact (vs the naive two-query/self-join shape).
    "f_agg_if" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
            dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
              .otherwise(lit(null))).as("sum_finished"),
            count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
            countDistinct(when(col("o_orderstatus") === "O", col("o_custkey")))
              .as("uniq_open_custs"))
          .orderBy("o_orderpriority")
      },
      Some(s"""
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               CAST(sum(${S.d("o_totalprice")})
                 FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_finished,
               count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
                 AS uniq_open_custs
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    "f_string" -> Q(
      (s, dir) => {
        Tables.part(s, dir)
          .select(col("p_partkey"),
            lower(col("p_name")).as("lower_name"),
            upper(col("p_brand")).as("upper_brand"),
            trim(col("p_name")).as("trimmed"),
            substring(col("p_name"), 1, 5).as("prefix5"),
            regexp_replace(col("p_name"), " ", "_").as("snake_name"),
            concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
            col("p_name").like("%green%").cast("int").as("is_green"),
            regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
            length(col("p_name")).as("name_len"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               lower(p_name) AS lower_name,
               upper(p_brand) AS upper_brand,
               trim(p_name) AS trimmed,
               substr(p_name, 1, 5) AS prefix5,
               regexp_replace(p_name, ' ', '_', 'g') AS snake_name,
               p_brand || '#' || p_type AS brand_type,
               CAST(p_name LIKE '%green%' AS INTEGER) AS is_green,
               regexp_extract(p_name, '^(\w+)', 1) AS first_word,
               CAST(length(p_name) AS INTEGER) AS name_len
        FROM part ORDER BY p_partkey""")),

    // ------------------------------------------------------------------
    // JSON field extraction from events.props ({"k": <int>}).
    "f_json" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k_value"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id,
               CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) AS k_value
        FROM events ORDER BY event_id""")),

    // ------------------------------------------------------------------
    // if / multiIf / coalesce / nullif.
    "f_conditional" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            when(col("l_discount") > 0.05, "discounted").otherwise("full")
              .as("price_kind"),
            when(col("l_quantity") < 10, "small")
              .when(col("l_quantity") < 30, "mid")
              .otherwise("big").as("qty_band"),
            coalesce(nullif(col("l_returnflag"), lit("N")), lit("kept"))
              .as("flag_or_kept"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_discount > 0.05 THEN 'discounted' ELSE 'full' END
                 AS price_kind,
               CASE WHEN l_quantity < 10 THEN 'small'
                    WHEN l_quantity < 30 THEN 'mid'
                    ELSE 'big' END AS qty_band,
               coalesce(nullif(l_returnflag, 'N'), 'kept') AS flag_or_kept
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ------------------------------------------------------------------
    // split / array ops / explode-equivalent counting on documents.
    "f_array" -> Q(
      (s, dir) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(toks).as("n_tokens"),
            size(array_distinct(toks)).as("n_uniq_tokens"),
            element_at(toks, 1).as("first_token"),
            array_contains(toks, "spark").cast("int").as("has_spark"),
            concat_ws(" ", slice(toks, 1, 3)).as("first3"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
                 AS n_uniq_tokens,
               string_split(text, ' ')[1] AS first_token,
               CAST(list_contains(string_split(text, ' '), 'spark') AS INTEGER)
                 AS has_spark,
               array_to_string(string_split(text, ' ')[1:3], ' ') AS first3
        FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // arrayMap/arrayFilter/arrayReduce (CH's array lambdas) as Spark
    // higher-order functions — transform/filter/aggregate evaluate
    // per row with no shuffle; the DuckDB oracle mirrors them with
    // list_transform/list_filter/list_sum.
    "f_array_hof" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(filter(split(col("text"), " "), t => length(t) > 5))
              .as("n_long"),
            aggregate(split(col("text"), " "), lit(0),
              (a, t) => a + length(t)).as("total_chars"),
            size(array_distinct(transform(split(col("text"), " "),
              t => lower(t)))).as("n_uniq_lower"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '),
                 x -> strlen(x) > 5)) AS INTEGER) AS n_long,
               CAST(list_sum(list_transform(string_split(text, ' '),
                 x -> strlen(x))) AS INTEGER) AS total_chars,
               CAST(len(list_distinct(list_transform(string_split(text, ' '),
                 x -> lower(x)))) AS INTEGER) AS n_uniq_lower
        FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // base64 / hex encode + decode round-trip.
    "f_encoding" -> Q(
      (s, dir) => {
        Tables.nation(s, dir)
          .select(col("n_nationkey"),
            base64(col("n_name").cast("binary")).as("b64"),
            hex(col("n_name").cast("binary")).as("hx"),
            unbase64(base64(col("n_name").cast("binary"))).cast("string")
              .as("roundtrip"))
          .orderBy("n_nationkey")
      },
      Some("""
        SELECT n_nationkey, base64(encode(n_name)) AS b64,
               hex(encode(n_name)) AS hx, n_name AS roundtrip
        FROM nation ORDER BY n_nationkey""")),

    // ------------------------------------------------------------------
    // Content hashes (md5 / sha256 oracled; xxhash64 is Spark-internal
    // and exercised by the dedup operators + specs).
    "f_hash" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            md5(col("text").cast("binary")).as("md5_hash"),
            sha2(col("text").cast("binary"), 256).as("sha256_hash"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, md5(text) AS md5_hash, sha256(text) AS sha256_hash
        FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // URL functions (CH's domain/path/extractURLParameter family) via
    // Spark's parse_url. The URL is constructed deterministically
    // from part rows, and the ORACLE produces the components from the
    // same raw fields — so a pass proves parse_url actually inverts
    // the construction, not that two parsers share bugs.
    "f_url" -> Q(
      (s, dir) => {
        val url = concat(lit("https://shop-"),
          pmod(col("p_partkey"), lit(97)).cast("string"),
          lit(".example.com/parts/"),
          regexp_replace(col("p_brand"), "#", "-"),
          lit("/item?id="), col("p_partkey"),
          lit("&size="), col("p_size"))
        Tables.part(s, dir)
          .select(col("p_partkey"), url.as("url"))
          .select(col("p_partkey"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY"), lit("size")).as("qsize"),
            parse_url(col("url"), lit("PROTOCOL")).as("proto"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               'shop-' || CAST(p_partkey % 97 AS VARCHAR) || '.example.com'
                 AS host,
               '/parts/' || replace(p_brand, '#', '-') || '/item' AS path,
               CAST(p_size AS VARCHAR) AS qsize,
               'https' AS proto
        FROM part ORDER BY p_partkey""")),

    // ------------------------------------------------------------------
    // IPv4 numeric <-> dotted-quad (CH's IPv4NumToString /
    // IPv4StringToNum): pure integer shift/mask arithmetic both ways,
    // fully codegen'd; the round-trip re-parses the dotted string so
    // a pass proves the two directions are actual inverses.
    "f_ip" -> Q(
      (s, dir) => {
        val ip = pmod(col("c_custkey") * lit(2654435761L), lit(4294967296L))
        def octet(n: Int) =
          pmod(shiftrightunsigned(col("ip_num"), n), lit(256L)).cast("string")
        Tables.customer(s, dir)
          .select(col("c_custkey"), ip.as("ip_num"))
          .withColumn("ip_str", concat_ws(".",
            octet(24), octet(16), octet(8), octet(0)))
          .withColumn("ip_back",
            element_at(split(col("ip_str"), "\\."), 1).cast("long") * 16777216L +
              element_at(split(col("ip_str"), "\\."), 2).cast("long") * 65536L +
              element_at(split(col("ip_str"), "\\."), 3).cast("long") * 256L +
              element_at(split(col("ip_str"), "\\."), 4).cast("long"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey,
               (c_custkey * 2654435761) % 4294967296 AS ip_num,
               CAST(((c_custkey * 2654435761) % 4294967296) // 16777216 % 256 AS VARCHAR) || '.' ||
               CAST(((c_custkey * 2654435761) % 4294967296) // 65536 % 256 AS VARCHAR) || '.' ||
               CAST(((c_custkey * 2654435761) % 4294967296) // 256 % 256 AS VARCHAR) || '.' ||
               CAST(((c_custkey * 2654435761) % 4294967296) % 256 AS VARCHAR) AS ip_str,
               (c_custkey * 2654435761) % 4294967296 AS ip_back
        FROM customer ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // editDistance / fuzzy lookup (CH's editDistance + the classic
    // "match a dirty string against a clean dimension" ETL step):
    // deterministic typo probes (3rd char deleted) are matched back
    // to the nation dimension by minimum Levenshtein distance. The
    // dimension broadcasts — at any scale the probe side streams map-
    // only against a copy of the (always small) clean list; ties
    // break lexicographically so the argmin is deterministic.
    "f_editdist" -> Q(
      (s, dir) => {
        val probes = Tables.nation(s, dir)
          .select(concat(substring(col("n_name"), 1, 2),
            substring(col("n_name"), 4, 30)).as("probe"))
        val nations = Tables.nation(s, dir).select(col("n_name"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("probe").orderBy(col("dist"), col("n_name"))
        probes.crossJoin(broadcast(nations))
          .withColumn("dist", levenshtein(col("probe"), col("n_name")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("probe"), col("n_name").as("matched"), col("dist"))
          .orderBy("probe")
      },
      Some("""
        WITH probes AS (
          SELECT substr(n_name, 1, 2) || substr(n_name, 4) AS probe
          FROM nation),
        d AS (SELECT probe, n_name,
                CAST(levenshtein(probe, n_name) AS INTEGER) AS dist
              FROM probes CROSS JOIN nation),
        r AS (SELECT *, row_number()
                OVER (PARTITION BY probe ORDER BY dist, n_name) AS rn
              FROM d)
        SELECT probe, n_name AS matched, dist
        FROM r WHERE rn = 1 ORDER BY probe""")),

    // ------------------------------------------------------------------
    // Nested JSON round-trip: to_json of a nested struct + array,
    // re-parsed with from_json against an explicit schema, plus a
    // path extraction from the serialized form. The oracle selects
    // the raw fields directly, so a pass proves parse(serialize(x))
    // is the identity on nested shapes — the JSONEachRow ingest/egest
    // semantics — not that two JSON parsers share bugs.
    "f_json2" -> Q(
      (s, dir) => {
        val doc = to_json(struct(
          col("o_orderkey").as("k"),
          struct(d(col("o_totalprice")).cast("double").as("p"),
            col("o_orderstatus").as("st")).as("meta"),
          array(col("o_orderpriority"), col("o_orderstatus")).as("tags")))
        Tables.orders(s, dir)
          .withColumn("j", doc)
          .withColumn("parsed", from_json(col("j"),
            "k BIGINT, meta STRUCT<p: DOUBLE, st: STRING>, tags ARRAY<STRING>",
            Map.empty[String, String]))
          .select(col("o_orderkey"),
            col("parsed.k").as("k"),
            col("parsed.meta.p").as("price"),
            col("parsed.meta.st").as("status"),
            element_at(col("parsed.tags"), 1).as("tag_priority"),
            element_at(col("parsed.tags"), 2).as("tag_status"),
            get_json_object(col("j"), "$.meta.st").as("path_status"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(12,4)) AS DOUBLE) AS price,
               o_orderstatus AS status,
               o_orderpriority AS tag_priority,
               o_orderstatus AS tag_status,
               o_orderstatus AS path_status
        FROM orders ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // Geo functions (CH's greatCircleDistance / pointInPolygon-style
    // containment): deterministic synthetic coordinates derived from
    // keys, a pure-comparison bounding-box flag (exact by
    // construction), and the haversine great-circle distance — the
    // one transcendental-heavy formula in the surface, so the output
    // is rounded to whole meters; both engines evaluate the identical
    // IEEE expression tree and their libm sin/cos/asin agree to well
    // under the rounding grain at earth magnitudes (validated by the
    // cell-exact oracle gate).
    "f_geo" -> Q(
      (s, dir) => {
        val lat1 = pmod(col("c_custkey") * 7919L, lit(18000L)).cast("double") / 100.0 - 90.0
        val lon1 = pmod(col("c_custkey") * 104729L, lit(36000L)).cast("double") / 100.0 - 180.0
        val lat2 = pmod(col("c_nationkey") * 6101L, lit(18000L)).cast("double") / 100.0 - 90.0
        val lon2 = pmod(col("c_nationkey") * 9973L, lit(36000L)).cast("double") / 100.0 - 180.0
        val rlat1 = radians(col("lat1"))
        val rlat2 = radians(col("lat2"))
        val dlat = radians(col("lat2") - col("lat1")) / 2.0
        val dlon = radians(col("lon2") - col("lon1")) / 2.0
        val a = sin(dlat) * sin(dlat) +
          cos(rlat1) * cos(rlat2) * sin(dlon) * sin(dlon)
        Tables.customer(s, dir)
          .select(col("c_custkey"),
            lat1.as("lat1"), lon1.as("lon1"), lat2.as("lat2"), lon2.as("lon2"))
          .withColumn("in_box",
            (col("lat1") >= -60.0 && col("lat1") <= 60.0 &&
              col("lon1") >= -90.0 && col("lon1") <= 90.0).cast("int"))
          .withColumn("dist_m",
            round(lit(2.0) * 6371000.0 * asin(sqrt(a)), 0))
          .select(col("c_custkey"), col("lat1"), col("lon1"),
            col("in_box"), col("dist_m"))
          .orderBy("c_custkey")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 7919) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat1,
                 CAST((c_custkey * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon1,
                 CAST((c_nationkey * 6101) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat2,
                 CAST((c_nationkey * 9973) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon2
          FROM customer)
        SELECT c_custkey, lat1, lon1,
               CAST(lat1 >= -60.0 AND lat1 <= 60.0
                    AND lon1 >= -90.0 AND lon1 <= 90.0 AS INTEGER) AS in_box,
               round(2.0 * 6371000.0 * asin(sqrt(
                 sin(radians(lat2 - lat1) / 2.0) * sin(radians(lat2 - lat1) / 2.0)
                 + cos(radians(lat1)) * cos(radians(lat2))
                   * sin(radians(lon2 - lon1) / 2.0)
                   * sin(radians(lon2 - lon1) / 2.0))), 0) AS dist_m
        FROM pts ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // Second string batch: pad/translate/reverse/position/repeat/
    // split_part (CH's leftPad/rightPad/translate/reverse/position/
    // repeat/splitByChar-indexing family).
    "f_string2" -> Q(
      (s, dir) => {
        Tables.part(s, dir)
          .select(col("p_partkey"),
            lpad(col("p_brand"), 12, "*").as("padded"),
            rpad(col("p_type"), 30, ".").as("rpadded"),
            reverse(col("p_name")).as("rev_name"),
            translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
            element_at(split(col("p_type"), " "), 1).as("type_head"),
            instr(col("p_name"), "a").as("a_pos"),
            expr("repeat('-', p_size % 5)").as("dashes"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               lpad(p_brand, 12, '*') AS padded,
               rpad(p_type, 30, '.') AS rpadded,
               reverse(p_name) AS rev_name,
               translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
               split_part(p_type, ' ', 1) AS type_head,
               CAST(strpos(p_name, 'a') AS INTEGER) AS a_pos,
               repeat('-', p_size % 5) AS dashes
        FROM part ORDER BY p_partkey""")),

    // ------------------------------------------------------------------
    // Rounding family (CH round/roundBankers/floor/ceil + negative
    // scale). Everything rounds the exact DECIMAL view of the 2dp
    // values, never the raw double — both engines are HALF_UP on
    // decimals (and HALF_EVEN for the bankers variant), where
    // double-path rounding would diverge on binary-unrepresentable
    // .X5 ties.
    "f_rounding" -> Q(
      (s, dir) => {
        val p = d(col("l_extendedprice"))
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(p, 0).cast("double").as("r_int"),
            round(p, 1).cast("double").as("r_1dp"),
            round(p, -2).cast("double").as("r_hundreds"),
            bround(p, 1).cast("double").as("r_bankers"),
            floor(col("l_extendedprice")).as("flr"),
            ceil(col("l_extendedprice")).as("cl"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      // DuckDB's round_even macro routes through doubles (a .X5 cent
      // value is not a binary tie), so the oracle derives HALF_EVEN
      // from exact integer cents instead: drop the last cent digit,
      // bump by parity on the tie.
      Some(s"""
        SELECT l_orderkey, l_linenumber,
               CAST(round(dv, 0) AS DOUBLE) AS r_int,
               CAST(round(dv, 1) AS DOUBLE) AS r_1dp,
               CAST(round(dv, -2) AS DOUBLE) AS r_hundreds,
               CAST(c - dg + CASE WHEN dg < 5 THEN 0 WHEN dg > 5 THEN 10
                 ELSE (CASE WHEN ((c - dg) // 10) % 2 = 0 THEN 0 ELSE 10 END)
                 END AS DOUBLE) / 100 AS r_bankers,
               CAST(floor(l_extendedprice) AS BIGINT) AS flr,
               CAST(ceil(l_extendedprice) AS BIGINT) AS cl
        FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
                     ${S.d("l_extendedprice")} AS dv,
                     CAST(${S.d("l_extendedprice")} * 100 AS BIGINT) AS c,
                     CAST(${S.d("l_extendedprice")} * 100 AS BIGINT) % 10 AS dg
              FROM lineitem) t
        ORDER BY l_orderkey, l_linenumber""")),

    // ------------------------------------------------------------------
    // formatDateTime / parseDateTime (CH's format-string family):
    // render with an explicit pattern, parse the rendered string back
    // and prove the round trip by re-emitting the epoch. Day/month
    // names are the JVM's en-US abbreviations, matching strftime's
    // locale-independent English %a/%b.
    "f_datetime_format" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .select(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("iso"),
            date_format(col("o_orderdate"), "EEE").as("dow_name"),
            date_format(col("o_orderdate"), "MMM").as("mon_name"),
            date_format(col("o_orderdate"), "yyyy/MM").as("ym"),
            unix_timestamp(
              to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
                "yyyy-MM-dd HH:mm:ss")).as("epoch_roundtrip"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso,
               strftime(o_orderdate, '%a') AS dow_name,
               strftime(o_orderdate, '%b') AS mon_name,
               strftime(o_orderdate, '%Y/%m') AS ym,
               CAST(epoch(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                 '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS epoch_roundtrip
        FROM orders ORDER BY o_orderkey""")),
  )
}
