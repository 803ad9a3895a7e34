package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group B of SURVEY.md §2 — ClickHouse MergeTree-engine semantics
  * re-expressed as Spark aggregations.
  *
  * Each engine is a single hash aggregation on the table's ORDER BY
  * key: one shuffle, map-side partial aggregation, no windows over
  * the whole table. That is the shape that survives 100 TB — a
  * window (row_number per key) formulation would sort every
  * partition; `max_by`/`sum` aggregate states are O(1) per key and
  * combine associatively across executors.
  */
object ClickHouse {

  /** ReplacingMergeTree: keep the latest row per key, ordered by a
    * version column (ties broken by the tiebreak column so the result
    * is deterministic, which ClickHouse itself does not guarantee).
    */
  def replacingMergeTree(
      df: DataFrame, keys: Seq[String], version: Column, tiebreak: Column): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(version, tiebreak)).as("__latest"))
      .select(col("__latest.*"))
  }

  /** SummingMergeTree: additive rollup of the given columns per key. */
  def summingMergeTree(
      df: DataFrame, keys: Seq[String], sums: Map[String, Column]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sums.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }: _*)

  /** CollapsingMergeTree: rows carry sign +1/-1; per key the signed
    * contributions cancel and only keys with a net effect survive.
    */
  def collapsingMergeTree(
      df: DataFrame, keys: Seq[String], sign: Column, measure: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("net_sign"),
        sum(sign * measure).cast("double").as("net_measure"),
        count(lit(1)).as("n_rows"))
      .filter(col("net_sign") =!= 0 || col("net_measure") =!= 0.0)

  /** DuckDB replay of ch_agg_state's xxhash64+HLL pipeline.
    *
    * Spark's `xxhash64(bigint)` is XXH64's hashLong with seed 42
    * (spark/unsafe XXH64.java — public xxHash spec). DuckDB has no
    * xxhash64 and its integers trap on overflow, so every wrapping
    * 64-bit multiply is built from 32-bit limbs over HUGEINT
    * (lo*lo + ((lo*hi + hi*lo) mod 2^32)<<32, all < 2^96) taken
    * mod 2^64; rotations split at the rotate point the same way.
    * Register index/rank then follow Hll.add (p=12: idx = low 12
    * bits, rank = ntz of the remaining bits + 1, where
    * ntz(w) + 1 = bit_count(xor(w, w-1)) for w != 0), the merged
    * register is the per-(group, idx) max, and Hll.estimate's
    * harmonic sum is a plain SUM of 1/2^reg over a full 0..4095
    * spine — order-free because each term is an exact power of two
    * and the total stays inside double's 53-bit significand, so the
    * arbitrary-order SQL sum equals Spark's sequential fold
    * bit-for-bit. alpha/raw
    * mirror the Scala expression structure token for token; the
    * closing round-to-long absorbs sub-ulp libm differences in the
    * linear-counting ln().
    */
  private val hllOracleSql: String = {
    val P1 = java.lang.Long.parseUnsignedLong("9E3779B185EBCA87", 16)
    val P2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
    val P3 = java.lang.Long.parseUnsignedLong("165667B19E3779F9", 16)
    val P4 = java.lang.Long.parseUnsignedLong("85EBCA77C2B2AE63", 16)
    val P5 = java.lang.Long.parseUnsignedLong("27D4EB2F165667C5", 16)
    val M64 = "18446744073709551616" // 2^64
    def u(x: Long) = java.lang.Long.toUnsignedString(x)
    def mul64(a: String, b: Long): String = {
      val bh = u(b >>> 32); val bl = u(b & 0xffffffffL)
      s"""CAST(CAST(((CAST($a % 4294967296 AS HUGEINT) * $bl)
         + ((((CAST($a % 4294967296 AS HUGEINT) * $bh)
         + (CAST($a // 4294967296 AS HUGEINT) * $bl)) % 4294967296)
         * 4294967296)) % $M64 AS HUGEINT) AS UBIGINT)"""
    }
    def rotl(x: String, r: Int): String = {
      val lo = java.lang.Long.toUnsignedString(1L << (64 - r))
      s"""CAST(CAST((CAST($x % $lo AS HUGEINT) * ${1L << r})
         + ($x // $lo) AS HUGEINT) % $M64 AS UBIGINT)"""
    }
    val acc0 = u(42L + P5 + 8L)
    s"""
    WITH e AS (SELECT event_type,
                 CAST(((CAST(user_id AS HUGEINT) % $M64) + $M64) % $M64
                      AS UBIGINT) AS v
               FROM events),
    s1 AS (SELECT event_type, ${mul64("v", P2)} AS k1a FROM e),
    s2 AS (SELECT event_type, ${rotl("k1a", 31)} AS k1b FROM s1),
    s3 AS (SELECT event_type, ${mul64("k1b", P1)} AS k1c FROM s2),
    s4 AS (SELECT event_type, xor(CAST($acc0 AS UBIGINT), k1c) AS h1 FROM s3),
    s5 AS (SELECT event_type, ${rotl("h1", 27)} AS h1r FROM s4),
    s6 AS (SELECT event_type, ${mul64("h1r", P1)} AS h2a FROM s5),
    s7 AS (SELECT event_type,
             CAST((CAST(h2a AS HUGEINT) + ${u(P4)}) % $M64 AS UBIGINT) AS h2
           FROM s6),
    s8 AS (SELECT event_type, xor(h2, h2 // 8589934592) AS f1 FROM s7),
    s9 AS (SELECT event_type, ${mul64("f1", P2)} AS f2 FROM s8),
    sa AS (SELECT event_type, xor(f2, f2 // 536870912) AS f3 FROM s9),
    sb AS (SELECT event_type, ${mul64("f3", P3)} AS f4 FROM sa),
    hh AS (SELECT event_type,
             -- NULL user_id: Spark's xxhash64(NULL) leaves the seed
             -- untouched, so the row hashes to literally 42
             coalesce(xor(f4, f4 // 4294967296), CAST(42 AS UBIGINT)) AS h
           FROM sb),
    rk AS (SELECT event_type, CAST(h % 4096 AS INTEGER) AS idx,
             CASE WHEN h // 4096 = 0 THEN 53
                  ELSE CAST(bit_count(xor(h // 4096, h // 4096 - 1)) AS INTEGER)
             END AS rank
           FROM hh),
    reg0 AS (SELECT event_type, idx, CAST(max(rank) AS INTEGER) AS reg
             FROM rk GROUP BY event_type, idx),
    spine AS (SELECT et.event_type, g.i AS idx
              FROM (SELECT DISTINCT event_type FROM e) et, range(4096) g(i)),
    regs AS (SELECT s.event_type, s.idx, coalesce(r.reg, 0) AS reg
             -- null-safe key match: a NULL event_type group must find
             -- its registers (plain = would zero them out silently)
             FROM spine s LEFT JOIN reg0 r
               ON r.event_type IS NOT DISTINCT FROM s.event_type
              AND r.idx = s.idx),
    agg AS (SELECT event_type,
              -- plain sum, NOT an ordered fold: every term is an exact
              -- power of two and the 4096-term total spans < 53
              -- significand bits (a register would need rank > ~41 to
              -- break exactness, probability < 2^-40 per hash), so any
              -- summation order yields the bit-identical double. This
              -- deliberately avoids list_reduce over an aggregate-built
              -- grouped list — DuckDB 1.0.0 mis-slices those child
              -- vectors and can permute results ACROSS groups (see the
              -- ch_sequencecount recursive-CTE note).
              sum(1.0 / (2.0 ^ reg)) AS inv_sum,
              CAST(count(*) FILTER (WHERE reg = 0) AS INTEGER) AS zeros
            FROM regs GROUP BY event_type),
    est AS (SELECT event_type,
              CASE WHEN (((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0)
                         * 4096.0) / inv_sum <= 10240.0 AND zeros > 0
                   THEN 4096.0 * ln(4096.0 / zeros)
                   ELSE (((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0)
                         * 4096.0) / inv_sum
              END AS e
            FROM agg)
    SELECT event_type, CAST(round(e) AS BIGINT) AS uniq_users_est
    FROM est ORDER BY event_type"""
  }

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Latest order per customer by (o_orderdate, o_orderkey).
    "ch_replacing_mt" -> Q(
      (s, dir) => {
        replacingMergeTree(Tables.orders(s, dir), Seq("o_custkey"),
          col("o_orderdate"), col("o_orderkey"))
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus",
            "o_totalprice")
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus, o_totalprice
        FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1
        ORDER BY o_custkey""")),

    // ------------------------------------------------------------------
    // Additive rollup per order: the SummingMergeTree a CH pipeline
    // would keep for per-order totals.
    "ch_summing_mt" -> Q(
      (s, dir) => {
        summingMergeTree(Tables.lineitem(s, dir), Seq("l_orderkey"), Map(
          "sum_qty" -> dsum(col("l_quantity")),
          "sum_price" -> dsum(col("l_extendedprice"))))
          .orderBy("l_orderkey")
      },
      Some(s"""
        SELECT l_orderkey, count(*) AS n_rows,
               ${S.dsum("l_extendedprice")} AS sum_price,
               ${S.dsum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ------------------------------------------------------------------
    // Sign collapse: returned lines (returnflag 'R') cancel kept lines
    // per (part, supplier); only keys with a net effect survive.
    "ch_collapsing_mt" -> Q(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .withColumn("sign", when(col("l_returnflag") === "R", -1).otherwise(1))
        collapsingMergeTree(l, Seq("l_partkey", "l_suppkey"),
          col("sign"), d(col("l_quantity")))
          .orderBy("l_partkey", "l_suppkey")
      },
      Some(s"""
        SELECT l_partkey, l_suppkey,
               CAST(sum(sign) AS BIGINT) AS net_sign,
               CAST(sum(sign * ${S.d("l_quantity")}) AS DOUBLE) AS net_measure,
               count(*) AS n_rows
        FROM (SELECT *, CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END AS sign
              FROM lineitem)
        GROUP BY l_partkey, l_suppkey
        HAVING sum(sign) <> 0 OR sum(sign * ${S.d("l_quantity")}) <> 0
        ORDER BY l_partkey, l_suppkey""")),

    // ------------------------------------------------------------------
    // VersionedCollapsingMergeTree: out-of-order-safe collapse — a
    // (key, version) pair with both a +1 and a -1 row cancels exactly,
    // regardless of arrival order; the surviving state per key is the
    // highest un-cancelled version. Two hash aggregations, both with
    // map-side partials: cancel within (key, version), then argMax
    // per key. Versions are synthesized deterministically from
    // lineitem (linenumber = version, 'R' = delete row).
    "ch_versioned_collapsing" -> Q(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("k"),
            // pair up consecutive lines into one version so (+1, -1)
            // cancellations actually occur in the synthesized stream
            expr("(l_linenumber + 1) div 2").as("version"),
            when(col("l_returnflag") === "R", -1).otherwise(1).as("sign"),
            d(col("l_quantity")).as("qty"))
        val alive = l.groupBy("k", "version")
          .agg(sum(col("sign")).as("net"), max(col("qty")).as("qty"))
          .filter(col("net") =!= 0)
        alive.groupBy("k")
          .agg(max_by(struct(col("version"), col("qty")), col("version"))
            .as("latest"))
          .select(col("k").as("l_orderkey"),
            col("latest.version").as("version"),
            col("latest.qty").cast("double").as("qty"))
          .orderBy("l_orderkey")
      },
      Some(s"""
        SELECT k AS l_orderkey, version, CAST(qty AS DOUBLE) AS qty
        FROM (SELECT k, version, qty,
                     row_number() OVER (PARTITION BY k
                       ORDER BY version DESC) AS rn
              FROM (SELECT l_orderkey AS k,
                           (l_linenumber + 1) // 2 AS version,
                           sum(CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END)
                             AS net,
                           max(${S.d("l_quantity")}) AS qty
                    FROM lineitem
                    GROUP BY 1, 2 HAVING net <> 0))
        WHERE rn = 1 ORDER BY l_orderkey""")),

    // ------------------------------------------------------------------
    // AggregatingMergeTree: the pre-aggregated materialized view a CH
    // deployment would maintain — month x status partial aggregates.
    "ch_agg_mt" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
            col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_price"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            countDistinct(col("o_custkey")).as("n_customers"))
          .orderBy("month", "o_orderstatus")
      },
      Some(s"""
        SELECT date_trunc('month', o_orderdate) AS month, o_orderstatus,
               count(*) AS n_orders,
               ${S.dsum("o_totalprice")} AS sum_price,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price,
               count(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY 1, 2 ORDER BY month, o_orderstatus""")),

    // ------------------------------------------------------------------
    // TTL expiry: rows older than the cutoff are dropped. On a real
    // deployment this pairs with partition pruning — partition by month
    // and whole partitions age out without a scan.
    "ch_ttl" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .filter(col("ts") >= lit("2024-01-15").cast("timestamp"))
          .select("event_id", "user_id", "event_type", "ts_us", "value")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
        FROM events WHERE ts >= TIMESTAMP '2024-01-15'
        ORDER BY event_id""")),

    // ------------------------------------------------------------------
    // argMax / argMin as single-pass aggregates (max_by/min_by).
    "ch_argmax" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey")))
              .as("richest_customer"),
            max(col("c_acctbal")).as("max_acctbal"),
            min_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey")))
              .as("poorest_customer"),
            min(col("c_acctbal")).as("min_acctbal"))
          .orderBy("n_name")
      },
      Some("""
        WITH ranked AS (
          SELECT n_name, c_name, c_acctbal,
                 row_number() OVER (PARTITION BY n_name
                   ORDER BY c_acctbal DESC, c_custkey DESC) AS rn_max,
                 row_number() OVER (PARTITION BY n_name
                   ORDER BY c_acctbal ASC, c_custkey ASC) AS rn_min
          FROM customer JOIN nation ON c_nationkey = n_nationkey)
        SELECT n_name,
               max(CASE WHEN rn_max = 1 THEN c_name END) AS richest_customer,
               max(c_acctbal) AS max_acctbal,
               max(CASE WHEN rn_min = 1 THEN c_name END) AS poorest_customer,
               min(c_acctbal) AS min_acctbal
        FROM ranked GROUP BY n_name ORDER BY n_name""")),

    // ------------------------------------------------------------------
    // Deterministic per-group mode (CH `topK(1)` / ANSI mode with a
    // pinned tie-break): two-stage exact — count per (group, value)
    // with map-side combine, then one max_by keyed on (count, value)
    // so ties break toward the lexicographically LARGEST value in
    // both engines. Never materializes per-group value lists, so
    // per-group state is O(distinct values) at stage 1 and O(1) at
    // stage 2 — the 100 TB shape (a collect_list + driver count
    // would not be).
    "ch_mode" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("o_orderstatus")
          .agg(
            max_by(col("o_orderpriority"),
              struct(col("cnt"), col("o_orderpriority"))).as("mode_priority"),
            max(col("cnt")).as("mode_n"))
          .orderBy("o_orderstatus")
      },
      Some("""
        WITH counted AS (
          SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
          FROM orders GROUP BY 1, 2),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY o_orderstatus
            ORDER BY cnt DESC, o_orderpriority DESC) AS rn
          FROM counted)
        SELECT o_orderstatus, o_orderpriority AS mode_priority,
               cnt AS mode_n
        FROM ranked WHERE rn = 1 ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // topK: most frequent part brands. Exact count-based top-k is the
    // scalable path for bounded-cardinality columns (partial agg then
    // a k-row global sort); the oracle checks it exactly at test SF.
    "ch_topk" -> Q(
      (s, dir) => {
        Tables.part(s, dir)
          .groupBy("p_brand").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("p_brand").asc)
          .limit(5)
      },
      Some("""
        SELECT p_brand, count(*) AS cnt FROM part
        GROUP BY p_brand ORDER BY cnt DESC, p_brand ASC LIMIT 5""")),

    // ------------------------------------------------------------------
    // topK as CH actually computes it for UNBOUNDED key spaces: the
    // space-saving heavy-hitter sketch. Partition-local sketches merge
    // up a tree, so no stage ever holds the full key space — the exact
    // ch_topk's partial-agg state is the whole key domain, this one's
    // is `capacity` entries, period. At test SF the cardinality is
    // under capacity, so the sketch degenerates to exact counts and
    // the same oracle as ch_topk applies; SpaceSavingSpec pins the
    // overflow behavior (overestimates + guaranteed heavy hitters).
    "ch_topk_sketch" -> Q(
      (s, dir) => {
        val top = Tables.part(s, dir).select(col("p_brand")).rdd
          .map(_.getString(0))
          .treeAggregate(new graft.functions.SpaceSaving(256))(
            (sk, v) => sk.add(v), (a, b) => a.merge(b))
          .topK(5)
        import s.implicits._
        top.map { case (brand, cnt, _) => (brand, cnt) }
          .toDF("p_brand", "cnt").select(col("p_brand"), col("cnt"))
          .orderBy(col("cnt").desc, col("p_brand").asc)
      },
      Some("""
        SELECT p_brand, count(*) AS cnt FROM part
        GROUP BY p_brand ORDER BY cnt DESC, p_brand ASC LIMIT 5""")),

    // ------------------------------------------------------------------
    // simpleLinearRegression(x, y): slope/intercept from the four
    // moment sums — one hash aggregation with map-side partials, O(1)
    // state per group (CH's own implementation shape). The moments
    // are EXACT decimal sums surfaced as doubles (Dec.psum), and the
    // final slope/intercept arithmetic is the identical IEEE
    // expression tree in both engines, so the doubles are
    // bit-identical. x/y ranges keep every sum's unscaled value under
    // 2^53 (see Dec.DOut) so the decimal->double casts are exact.
    "ch_linreg" -> Q(
      (s, dir) => {
        val xc = cents(col("l_quantity"))          // scale-2 long of x
        val yc = cents(col("l_discount")) * 100    // scale-2 long of y = 100*discount
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).cast("double").as("n"),
            psumLong(2, xc).as("sx"), psumLong(2, yc).as("sy"),
            psumLong(4, xc * yc).as("sxy"), psumLong(4, xc * xc).as("sxx"))
          .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
            ((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
              col("n")).as("intercept"))
          .orderBy("l_returnflag")
      },
      Some {
        val x = S.d("l_quantity"); val y = s"${S.d("l_discount")} * 100"
        s"""
        SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                 AS intercept
        FROM (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
                     ${S.psum(x)} AS sx, ${S.psum(y)} AS sy,
                     ${S.psum(s"$x * ($y)")} AS sxy,
                     ${S.psum(s"$x * $x")} AS sxx
              FROM lineitem GROUP BY l_returnflag)
        ORDER BY l_returnflag"""
      }),

    // ------------------------------------------------------------------
    // External dictionary lookup (CH dictGet/dictGetOrDefault over a
    // flat/hashed dictionary): in Spark the dictionary IS a broadcast
    // hash table — each executor holds the dim rows once and probes
    // map-side, zero shuffle of the fact table, exactly CH's
    // dictionary mechanics. Chained two deep (nation -> region) with
    // OrDefault semantics via coalesce.
    "ch_dictget" -> Q(
      (s, dir) => {
        val nation = Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val region = Tables.region(s, dir)
          .select(col("r_regionkey"), col("r_name"))
        Tables.supplier(s, dir)
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"), "left")
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"), "left")
          .select(col("s_suppkey"),
            coalesce(col("n_name"), lit("<none>")).as("nation_name"),
            coalesce(col("r_name"), lit("<none>")).as("region_name"))
          .orderBy("s_suppkey")
      },
      Some("""
        SELECT s_suppkey, coalesce(n_name, '<none>') AS nation_name,
               coalesce(r_name, '<none>') AS region_name
        FROM supplier
        LEFT JOIN nation ON s_nationkey = n_nationkey
        LEFT JOIN region ON n_regionkey = r_regionkey
        ORDER BY s_suppkey""")),

    // ------------------------------------------------------------------
    // topKWeighted: heavy hitters by SUMMED WEIGHT, not row count —
    // the same space-saving sketch (add() takes a weight increment),
    // same treeAggregate shape: per-partition sketches merged up a
    // tree, driver sees capacity-sized state only. Weights are exact
    // cents so the test-SF degenerate-to-exact case shares an
    // integer-arithmetic oracle.
    "ch_topk_weighted" -> Q(
      (s, dir) => {
        val top = Tables.orders(s, dir)
          .select(col("o_orderpriority"),
            (d(col("o_totalprice")) * 100).cast("long").as("w")).rdd
          .map(r => (r.getString(0), r.getLong(1)))
          .treeAggregate(new graft.functions.SpaceSaving(256))(
            (sk, v) => sk.add(v._1, v._2), (a, b) => a.merge(b))
          .topK(3)
        import s.implicits._
        top.map { case (p, cents, _) => (p, cents) }
          .toDF("o_orderpriority", "cents")
          .orderBy(col("cents").desc, col("o_orderpriority").asc)
      },
      Some(s"""
        SELECT o_orderpriority,
               CAST(sum(${S.d("o_totalprice")} * 100) AS BIGINT) AS cents
        FROM orders GROUP BY o_orderpriority
        ORDER BY cents DESC, o_orderpriority ASC LIMIT 3""")),

    // ------------------------------------------------------------------
    // quantileExact-style DISCONTINUOUS percentile (a member of the
    // data, no interpolation — CH quantileExact / ANSI
    // percentile_disc). Engine-portable by pinning the rank formula
    // itself — the value at row_number ceil(p*n) under a total order
    // — instead of trusting two engines' builtin index conventions to
    // agree. One window pass + one aggregate; picks are conditional
    // maxes, so per-group state is O(1).
    // Exact discrete per-group quantiles WITHOUT the per-group row
    // sort: the value at rank ceil(n*p) under (price, key) order is
    // the price whose cumulative-count interval contains the rank —
    // the key tiebreak only disambiguates WHICH row carries it, never
    // the VALUE — so selection runs over the distributed cumulative
    // distribution (graft.plans.RankSelect: range-partitioned prefix
    // sum, never a 5-task window; the r13 sf100 rung measured the
    // window form's parallelism ceiling). Oracle unchanged: DuckDB
    // replays the row_number formulation, same values by the rank-
    // interval identity.
    "ch_quantile_disc" -> Q(
      (s, dir) => {
        val cd = graft.plans.RankSelect.groupedCumDist(
          Tables.orders(s, dir)
            .select(col("o_orderpriority"), col("o_totalprice")),
          "o_orderpriority", "o_totalprice")
        def pick(p: Double) = {
          val r = ceil(col("n") * p)
          max(when(col("prev") < r && r <= col("cum"),
            d(col("o_totalprice")))).cast("double")
        }
        cd.groupBy("o_orderpriority")
          .agg(pick(0.25).as("p25"), pick(0.5).as("p50"),
            pick(0.9).as("p90"), max(col("n")).as("n"))
          .orderBy("o_orderpriority")
      },
      Some(s"""
        WITH r AS (
          SELECT o_orderpriority, o_totalprice, o_orderkey,
                 row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS rn,
                 count(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders)
        SELECT o_orderpriority,
               CAST(max(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT)
                 THEN ${S.d("o_totalprice")} END) AS DOUBLE) AS p25,
               CAST(max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
                 THEN ${S.d("o_totalprice")} END) AS DOUBLE) AS p50,
               CAST(max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
                 THEN ${S.d("o_totalprice")} END) AS DOUBLE) AS p90,
               max(n) AS n
        FROM r GROUP BY 1 ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    // quantile/quantiles: exact interpolated percentiles per group —
    // computed by rank selection over the shared cumulative cent
    // histogram (Stats.priceCentHist), NOT percentile(): the
    // percentile aggregate buffers every group value in one task,
    // which a 20B-row group cannot; the histogram's state is bounded
    // by the price DOMAIN at any corpus size. Each fraction f = k/20
    // interpolates as pure INTEGER arithmetic in 1/20-cent units —
    // units = 20*lo + (hi-lo)*((n-1)*k mod 20) at ranks
    // floor/ceil((n-1)*k/20) — with ONE closing division, so both
    // engines divide identical BIGINTs (the ch_mad device).
    "ch_quantiles" -> Q(
      (s, dir) => {
        val hist = Stats.priceCentHist(s, dir)
        val n = hist.groupBy("l_returnflag").agg(sum(col("cnt")).as("n"))
        val ks = Seq(5 -> "25", 10 -> "50", 15 -> "75", 18 -> "90")
        val picks = ks.flatMap { case (k, tag) => Seq(
          min(when(col("cum") > expr(s"((n - 1) * $k) div 20"), col("c")))
            .as(s"lo$tag"),
          min(when(col("cum") > expr(s"((n - 1) * $k + 19) div 20"), col("c")))
            .as(s"hi$tag"))
        }
        def q(k: Int, tag: String) =
          ((lit(20) * col(s"lo$tag")
            + (col(s"hi$tag") - col(s"lo$tag")) * expr(s"((n - 1) * $k) % 20"))
            .cast("double") / 2000.0).as(s"p$tag")
        hist.join(broadcast(n), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(first(col("n")).as("n"), picks: _*)
          .select(col("l_returnflag") +: ks.map { case (k, t) => q(k, t) }: _*)
          .orderBy("l_returnflag")
      },
      Some("""
        WITH hist AS (
          SELECT l_returnflag,
                 CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * 100 AS BIGINT)
                   AS c,
                 count(*) AS cnt
          FROM lineitem GROUP BY 1, 2),
        cumh AS (
          SELECT l_returnflag, c, cnt,
                 sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY c) AS cum
          FROM hist),
        nn AS (SELECT l_returnflag, sum(cnt) AS n FROM hist GROUP BY 1),
        pk AS (
          SELECT h.l_returnflag, max(nn.n) AS n,
                 min(CASE WHEN h.cum > ((nn.n - 1) * 5) // 20 THEN h.c END) AS lo25,
                 min(CASE WHEN h.cum > ((nn.n - 1) * 5 + 19) // 20 THEN h.c END) AS hi25,
                 min(CASE WHEN h.cum > ((nn.n - 1) * 10) // 20 THEN h.c END) AS lo50,
                 min(CASE WHEN h.cum > ((nn.n - 1) * 10 + 19) // 20 THEN h.c END) AS hi50,
                 min(CASE WHEN h.cum > ((nn.n - 1) * 15) // 20 THEN h.c END) AS lo75,
                 min(CASE WHEN h.cum > ((nn.n - 1) * 15 + 19) // 20 THEN h.c END) AS hi75,
                 min(CASE WHEN h.cum > ((nn.n - 1) * 18) // 20 THEN h.c END) AS lo90,
                 min(CASE WHEN h.cum > ((nn.n - 1) * 18 + 19) // 20 THEN h.c END) AS hi90
          FROM cumh h JOIN nn USING (l_returnflag)
          GROUP BY h.l_returnflag)
        SELECT l_returnflag,
               CAST(20 * lo25 + (hi25 - lo25) * (((n - 1) * 5) % 20) AS DOUBLE)
                 / 2000.0 AS p25,
               CAST(20 * lo50 + (hi50 - lo50) * (((n - 1) * 10) % 20) AS DOUBLE)
                 / 2000.0 AS p50,
               CAST(20 * lo75 + (hi75 - lo75) * (((n - 1) * 15) % 20) AS DOUBLE)
                 / 2000.0 AS p75,
               CAST(20 * lo90 + (hi90 - lo90) * (((n - 1) * 18) % 20) AS DOUBLE)
                 / 2000.0 AS p90
        FROM pk ORDER BY l_returnflag""")),

    // ------------------------------------------------------------------
    // sequenceMatch('(?1).*(?2).*(?3)'): does a strictly time-ordered
    // view -> click -> purchase subsequence exist per user? Greedy
    // stepping is both correct (earliest-first never hurts existence)
    // and the scale shape: three keyed aggregations + joins, no
    // per-user event buffering, no window sort over whole histories.
    "ch_sequencematch" -> Q(
      (s, dir) => {
        val e = Tables.events(s, dir).select("user_id", "event_type", "ts_us")
        def step(evType: String, prev: DataFrame, prevCol: String, out: String) =
          e.filter(col("event_type") === evType)
            .join(prev, Seq("user_id"))
            .filter(col("ts_us") > col(prevCol))
            .groupBy("user_id").agg(min("ts_us").as(out))
        val t1 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_us").as("t1"))
        val t2 = step("click", t1, "t1", "t2")
        val t3 = step("purchase", t2, "t2", "t3")
        e.select("user_id").distinct()
          .join(t3, Seq("user_id"), "left")
          .select(col("user_id"),
            col("t3").isNotNull.cast("int").as("matched"))
          .orderBy("user_id")
      },
      Some("""
        SELECT u.user_id, CAST(EXISTS (
          SELECT 1 FROM events e1, events e2, events e3
          WHERE e1.user_id = u.user_id AND e2.user_id = u.user_id
            AND e3.user_id = u.user_id
            AND e1.event_type = 'view' AND e2.event_type = 'click'
            AND e3.event_type = 'purchase'
            AND e2.ts > e1.ts AND e3.ts > e2.ts) AS INTEGER) AS matched
        FROM (SELECT DISTINCT user_id FROM events) u
        ORDER BY u.user_id""")),

    // ------------------------------------------------------------------
    // AggregateFunction-STATE column (CH `uniqState`/`uniqMerge`): the
    // incremental-materialized-view pattern. Each ingest batch (here:
    // events split by event_id parity) aggregates its own HLL register
    // state per group; saved states then MERGE — elementwise register
    // max, associative/commutative/idempotent — into exactly the state
    // one pass over the union produces (HllSpec asserts bit equality).
    // approx_count_distinct cannot do this: its state dies with the
    // job. CELL-EXACTLY oracled (round 6): the merge law (elementwise
    // register max — associative/commutative/idempotent, HllSpec
    // asserts bit equality) means the batch split cannot change the
    // merged state, so the oracle replays the ONE-PASS registers:
    // Spark's xxhash64 (XXH64 hashLong, seed 42) is reproduced in
    // DuckDB via 32-bit-limb multiplication mod 2^64 over HUGEINT
    // (see hllOracleSql), registers are a per-(group, idx) max, the
    // harmonic sum folds 1/2^reg in register order (each term an
    // exact power of two), and the final round-to-long absorbs any
    // sub-ulp ln() libm difference in the linear-counting branch.
    // HllSpec additionally pins the merge law and a 5% accuracy
    // bound vs exact.
    "ch_agg_state" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = Tables.events(s, dir)
          .select(col("event_type"), xxhash64(col("user_id")).as("h"),
            pmod(col("event_id"), lit(2)).as("batch"))
        val batchStates = e.groupBy("event_type", "batch")
          .agg(graft.functions.Hll.state(col("h")).as("state"))
        batchStates.groupBy("event_type")
          .agg(graft.functions.Hll.mergeStates(col("state")).as("merged"))
          .select(col("event_type"),
            expr("graft_hll_estimate(merged)").as("uniq_users_est"))
          .orderBy("event_type")
      },
      Some(hllOracleSql)),

    // ------------------------------------------------------------------
    // deltaSum: total of the POSITIVE increments of a per-user value
    // ordered by event time (counter-reset-tolerant rate totals). The
    // lag runs inside the per-user window sort; deltas are exact
    // decimals so the final sum is order-independent and cross-engine
    // exact.
    "ch_deltasum" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us").asc, col("event_id").asc)
        Tables.events(s, dir)
          .withColumn("prev", lag(d(col("value")), 1).over(w))
          .withColumn("delta",
            when(col("prev").isNotNull && d(col("value")) > col("prev"),
              d(col("value")) - col("prev")).otherwise(lit(0).cast(graft.Dec.D)))
          .groupBy("user_id")
          .agg(sum(col("delta")).cast("double").as("delta_sum"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH d AS (
          SELECT user_id,
                 ${S.d("value")} AS v,
                 lag(${S.d("value")}, 1) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev
          FROM events)
        SELECT user_id,
               CAST(sum(CASE WHEN prev IS NOT NULL AND v > prev
                             THEN v - prev
                             ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
                 AS delta_sum,
               count(*) AS n_events
        FROM d GROUP BY user_id ORDER BY user_id""")),

    // ------------------------------------------------------------------
    // groupBitAnd / groupBitOr / groupBitXor: single-pass bitwise
    // aggregates (O(1) state per group).
    "ch_groupbit" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy("o_orderstatus")
          .agg(bit_and(col("o_orderkey")).as("band"),
            bit_or(col("o_orderkey")).as("bor"),
            bit_xor(col("o_orderkey")).as("bxor"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus, bit_and(o_orderkey) AS band,
               bit_or(o_orderkey) AS bor, bit_xor(o_orderkey) AS bxor,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // histogram as fixed-width buckets: one hash aggregation on the
    // bucket id (CH's adaptive histogram() serves the same purpose;
    // fixed buckets are deterministic and cross-engine exact).
    "ch_histogram" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(floor(col("l_extendedprice") / 10000).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("l_extendedprice")).as("lo"),
            max(col("l_extendedprice")).as("hi"))
          .orderBy("bucket")
      },
      Some("""
        SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
               count(*) AS n, min(l_extendedprice) AS lo,
               max(l_extendedprice) AS hi
        FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    // ------------------------------------------------------------------
    // uniqExact — the exact distinct count (oracled here). The HLL
    // approximation (CH `uniq`) is ch_uniq_hll below, checked rows-only
    // plus an error-bound ScalaTest spec.
    "ch_uniq" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("uniq_users"),
            count(lit(1)).as("n_events"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS uniq_users,
               count(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // uniq (HLL): approx_count_distinct next to the exact value. The
    // estimate itself is estimator-specific (cannot be cross-engine
    // pinned), but its ERROR BOUND — the operator's actual contract —
    // is: the output carries the exact NDV plus a boolean that the
    // HLL estimate landed within 2.5x the requested rsd, and the
    // oracle asserts that boolean is TRUE. A drifting estimator now
    // fails the hard driver gate, not just the ScalaTest spec.
    "ch_uniq_hll" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
            countDistinct(col("user_id")).as("uniq_users_exact"))
          .select(col("event_type"), col("uniq_users_exact"),
            (abs(col("approx") - col("uniq_users_exact")) <=
              col("uniq_users_exact") * lit(0.05)).as("hll_within_5pct"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users_exact,
               TRUE AS hll_within_5pct
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // groupArray / groupUniqArray, sorted and string-joined so the
    // result is deterministic and engine-portable.
    "ch_grouparray" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy("o_custkey")
          .agg(
            concat_ws(",", sort_array(collect_list(col("o_orderstatus"))))
              .as("statuses_all"),
            concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
              .as("statuses_uniq"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey,
               array_to_string(list_sort(list(o_orderstatus)), ',') AS statuses_all,
               array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
                 AS statuses_uniq,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // ------------------------------------------------------------------
    // arrayJoin (CH's row-expanding array flattener; ClickHouse docs
    // "functions/array-join"): posexplode keeps the element index the
    // way CH pairs arrayJoin with arrayEnumerate. Pure narrow
    // generate — no shuffle; the explode multiplies rows inside one
    // whole-stage-codegen pipeline.
    "ch_arrayjoin" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .select(col("doc_id"), col("pos"), col("col").as("word"))
          .orderBy("doc_id", "pos")
      },
      Some("""
        SELECT doc_id, CAST(unnest(range(len(toks))) AS INTEGER) AS pos,
               unnest(toks) AS word
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
        ORDER BY doc_id, pos""")),

    // ------------------------------------------------------------------
    // LIMIT n BY key (CH's per-group head): row_number over a
    // deterministic order, filtered — the window sorts only within
    // each nation's partition, and rn <= 3 prunes before any
    // downstream work.
    // Top-3 per nation as a bounded-heap SELECTION aggregate
    // (graft.functions.TopK, the r13 sf100 device): the 25-key
    // partitionBy window sorted each nation's rows in ONE task — a
    // #groups-core ceiling on any cluster; the selection consumes
    // rows in the scan stage (map-side O(k) partials), and the
    // 25x3-row result broadcast-joins back for the payload.
    "ch_limit_by" -> Q(
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
        val top = cust.groupBy("c_nationkey")
          .agg(graft.functions.TopK(3, col("c_acctbal"), col("c_custkey"))
            .as("ids"))
          .select(col("c_nationkey"),
            posexplode(col("ids")).as(Seq("pos", "c_custkey")))
          .select(col("c_nationkey"), col("c_custkey"),
            (col("pos") + 1).cast("integer").as("rn"))
        cust.select(col("c_custkey"), col("c_acctbal"))
          .join(broadcast(top), Seq("c_custkey"))
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
            col("rn"))
          .orderBy("c_nationkey", "rn")
      },
      Some("""
        SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS INTEGER) AS rn
        FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                     row_number() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey) AS rn
              FROM customer)
        WHERE rn <= 3 ORDER BY c_nationkey, rn""")),

    // ------------------------------------------------------------------
    // sumMap / minMap / maxMap (CH's keyed-map aggregates): the scale
    // shape in Spark is aggregate-then-assemble — one hash agg on
    // (group, key) with map-side partials, then a second tiny agg
    // that assembles the per-key results into a sorted map
    // serialization. Values are exact cents (decimal sum * 100 as
    // BIGINT) so the string form is engine-portable. A row-wise
    // map-merge formulation would carry O(keys) state per row and
    // defeat partial aggregation.
    "ch_summap" -> Q(
      (s, dir) => {
        val per = Tables.orders(s, dir)
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg((sum(d(col("o_totalprice"))) * 100).cast("long").as("cents_sum"),
            (min(d(col("o_totalprice"))) * 100).cast("long").as("cents_min"),
            (max(d(col("o_totalprice"))) * 100).cast("long").as("cents_max"))
        def m(v: String) = concat_ws(",",
          sort_array(collect_list(
            concat(col("o_orderpriority"), lit(":"), col(v)))))
        per.groupBy("o_orderstatus")
          .agg(m("cents_sum").as("sum_map"),
            m("cents_min").as("min_map"),
            m("cents_max").as("max_map"),
            count(lit(1)).as("n_keys"))
          .orderBy("o_orderstatus")
      },
      Some(s"""
        SELECT o_orderstatus,
               array_to_string(list_sort(list(o_orderpriority || ':' ||
                 CAST(cents_sum AS VARCHAR))), ',') AS sum_map,
               array_to_string(list_sort(list(o_orderpriority || ':' ||
                 CAST(cents_min AS VARCHAR))), ',') AS min_map,
               array_to_string(list_sort(list(o_orderpriority || ':' ||
                 CAST(cents_max AS VARCHAR))), ',') AS max_map,
               count(*) AS n_keys
        FROM (SELECT o_orderstatus, o_orderpriority,
                     CAST(sum(${S.d("o_totalprice")}) * 100 AS BIGINT) AS cents_sum,
                     CAST(min(${S.d("o_totalprice")}) * 100 AS BIGINT) AS cents_min,
                     CAST(max(${S.d("o_totalprice")}) * 100 AS BIGINT) AS cents_max
              FROM orders GROUP BY o_orderstatus, o_orderpriority)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // quantileExactWeighted: exact weighted quantiles the way
    // ClickHouse computes them — collapse to a (group, value) ->
    // total-weight map FIRST (a map-side-combinable aggregate whose
    // shuffle keys on (g, v), so it runs at full parallelism no
    // matter how few groups there are), then cumulative-sum over the
    // DISTINCT-value rows and pick the smallest value whose
    // cumulative weight reaches the target. State and window size are
    // ∝ distinct values per group, not rows — the sf10 ladder caught
    // the previous formulation windowing 60M rows over
    // partitionBy(l_returnflag) = 3 sort tasks (38.6 s; at 100 TB,
    // three tasks sorting 33 TB each). All comparisons are integer
    // (denom*cw >= num*tot), so both engines agree bit-exactly;
    // collapsing ties before the window makes the pick
    // tie-order-independent by construction.
    "ch_quantile_weighted" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val c = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("g"), d(col("l_quantity")).as("v"),
            col("l_linenumber").cast("long").as("wt"))
          .groupBy("g", "v").agg(sum(col("wt")).as("wt"))
          .withColumn("cw", sum(col("wt")).over(
            Window.partitionBy("g").orderBy("v")))
          .withColumn("tot", sum(col("wt")).over(Window.partitionBy("g")))
        def q(num: Int, denom: Int) =
          min(when(col("cw") * denom >= col("tot") * num, col("v")))
            .cast("double")
        c.groupBy("g")
          .agg(q(1, 4).as("q25"), q(1, 2).as("q50"), q(9, 10).as("q90"),
            max(col("tot")).as("total_weight"))
          .orderBy("g")
      },
      Some(s"""
        SELECT g,
               CAST(min(CASE WHEN cw * 4 >= tot * 1 THEN v END) AS DOUBLE) AS q25,
               CAST(min(CASE WHEN cw * 2 >= tot * 1 THEN v END) AS DOUBLE) AS q50,
               CAST(min(CASE WHEN cw * 10 >= tot * 9 THEN v END) AS DOUBLE) AS q90,
               CAST(max(tot) AS BIGINT) AS total_weight
        FROM (SELECT g, v,
                     sum(wt) OVER (PARTITION BY g ORDER BY v) AS cw,
                     sum(wt) OVER (PARTITION BY g) AS tot
              FROM (SELECT l_returnflag AS g, ${S.d("l_quantity")} AS v,
                           CAST(l_linenumber AS BIGINT) AS wt
                    FROM lineitem))
        GROUP BY g ORDER BY g""")),

    // ------------------------------------------------------------------
    // groupBitmap / bitmapAndCardinality: audience-overlap analysis.
    // The scale shape is NOT a bitmap object per segment (that is a
    // single-node trick) — it is one distinct pass keyed by
    // (user, segment), then per-user segment sets exploded into
    // ordered pairs map-side, then a tiny per-pair count. The only
    // real shuffle is keyed by user_id; per-segment cardinalities are
    // a handful of rows broadcast back onto the pair table.
    "ch_bitmap" -> Q(
      (s, dir) => {
        val ue = Tables.events(s, dir)
          .filter(col("value") > 15)
          .select(col("user_id"), col("event_type")).distinct()
        val perSeg = ue.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
        val pairs = ue.groupBy("user_id")
          .agg(sort_array(collect_set(col("event_type"))).as("segs"))
          .select(explode(expr(
            """flatten(transform(segs, (a, i) ->
               transform(slice(segs, i + 2, size(segs)), b -> struct(a, b))))"""))
            .as("p"))
          .groupBy(col("p.a").as("seg_a"), col("p.b").as("seg_b"))
          .agg(count(lit(1)).as("users_both"))
        pairs
          .join(broadcast(perSeg.withColumnRenamed("event_type", "seg_a")
            .withColumnRenamed("n", "users_a")), Seq("seg_a"))
          .join(broadcast(perSeg.withColumnRenamed("event_type", "seg_b")
            .withColumnRenamed("n", "users_b")), Seq("seg_b"))
          .select(col("seg_a"), col("seg_b"), col("users_a"), col("users_b"),
            col("users_both"))
          .orderBy("seg_a", "seg_b")
      },
      Some("""
        WITH ue AS (SELECT DISTINCT user_id, event_type FROM events
                    WHERE value > 15),
             seg AS (SELECT event_type, count(*) AS n FROM ue GROUP BY 1)
        SELECT a.event_type AS seg_a, b.event_type AS seg_b,
               sa.n AS users_a, sb.n AS users_b, count(*) AS users_both
        FROM ue a JOIN ue b ON a.user_id = b.user_id
                           AND a.event_type < b.event_type
        JOIN seg sa ON sa.event_type = a.event_type
        JOIN seg sb ON sb.event_type = b.event_type
        GROUP BY 1, 2, 3, 4 ORDER BY seg_a, seg_b""")),

    // ------------------------------------------------------------------
    // ANY LEFT JOIN strictness: at most one right-side row per left
    // row, which ClickHouse leaves nondeterministic — pinned here to
    // "first line by (l_linenumber, l_partkey, l_quantity)" so it is
    // reproducible (l_linenumber alone ties in this data; any tie
    // surviving the full triple has an identical payload). The right
    // side collapses to one row per key BEFORE the join (one hash agg
    // with partial aggregation), so join input size is bounded by key
    // cardinality, never by right-table row count.
    "ch_any_join" -> Q(
      (s, dir) => {
        val firstLine = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(min_by(
            struct(col("l_partkey"), d(col("l_quantity")).as("l_quantity")),
            struct(col("l_linenumber"), col("l_partkey"), d(col("l_quantity"))))
            .as("fl"))
          .select(col("l_orderkey"), col("fl.l_partkey").as("first_partkey"),
            col("fl.l_quantity").cast("double").as("first_qty"))
        Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F")
          .join(firstLine, col("o_orderkey") === firstLine("l_orderkey"), "left")
          .select(col("o_orderkey"), d(col("o_totalprice")).cast("double").as("o_totalprice"),
            col("first_partkey"), col("first_qty"))
          .orderBy("o_orderkey")
      },
      Some(s"""
        SELECT o_orderkey, CAST(${S.d("o_totalprice")} AS DOUBLE) AS o_totalprice,
               first_partkey, first_qty
        FROM (SELECT * FROM orders WHERE o_orderstatus = 'F') o
        LEFT JOIN (SELECT l_orderkey, l_partkey AS first_partkey,
                          CAST(${S.d("l_quantity")} AS DOUBLE) AS first_qty
                   FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
                           ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
                         FROM lineitem)
                   WHERE rn = 1) l ON o.o_orderkey = l.l_orderkey
        ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // exponentialMovingAverage: per-user EWMA of `value` in event-time
    // order, decay 1/2 per step over the last 8 events. Formulated as
    // 8 window lags with power-of-two decimal weights — pure window +
    // expression work (one shuffle on user_id), and EXACT across
    // engines because every 2^-j weight and every 2dp value is a
    // finite decimal: numerator/denominator are exact decimal sums,
    // the EWMA is one IEEE division of identical operands. A longer
    // horizon at scale keeps the same shape (running pair of
    // prefix-scaled sums); 8 taps ~ 99.6% of the mass at decay 1/2.
    // ------------------------------------------------------------------
    "ch_ewma" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val taps = 0 until 8
        val weights = taps.map(j => java.math.BigDecimal.ONE
          .divide(new java.math.BigDecimal(1L << j)))
        val terms = taps.map(j =>
          lag(d(col("value")), j).over(w) * lit(weights(j)))
        val wsum = taps.map(j =>
          when(lag(col("value"), j).over(w).isNotNull, lit(weights(j))))
        val num = terms.map(t => coalesce(t, lit(java.math.BigDecimal.ZERO)))
          .reduce(_ + _)
        val den = wsum.map(t => coalesce(t, lit(java.math.BigDecimal.ZERO)))
          .reduce(_ + _)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_us"),
            (num.cast("double") / den.cast("double")).as("ewma"))
          .orderBy("user_id", "ts_us", "event_id")
      },
      Some {
        val terms = (0 until 8).map { j =>
          val wj = java.math.BigDecimal.ONE
            .divide(new java.math.BigDecimal(1L << j)).toPlainString
          (s"coalesce(lag(${S.d("value")}, $j) OVER w * $wj, 0)",
            s"CASE WHEN lag(value, $j) OVER w IS NOT NULL THEN $wj ELSE 0 END")
        }
        s"""
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               CAST(${terms.map(_._1).mkString(" + ")} AS DOUBLE)
                 / CAST(${terms.map(_._2).mkString(" + ")} AS DOUBLE) AS ewma
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts_us, event_id"""
      }),

    // ------------------------------------------------------------------
    // Largest-Triangle-Three-Buckets downsampling (ClickHouse's
    // largestTriangleThreeBuckets aggregate; Steinarsson 2013): each
    // event_type's series reduced to 20 visually-representative
    // points. CELL-EXACT oracle despite being a sequential geometric
    // selection: integer coordinates (group-relative micros, exact
    // cents) and the 2*area*c statistic keep every comparison in
    // exact integer arithmetic (BigInt / HUGEINT), replayed by 18
    // unrolled selection CTEs (the emb_pca device). See graft
    // .operators.Lttb for the streaming-fold scale shape.
    // ------------------------------------------------------------------
    "ch_lttb" -> Q(
      (s, dir) => Lttb.downsample(Tables.events(s, dir)),
      Some(Lttb.oracleSql())),

    // ------------------------------------------------------------------
    // groupArraySample: a deterministic fixed-size per-group sample —
    // the reproducible twin of CH's reservoir version. Sample
    // membership is "first N in keyed-hash order" (md5 of the
    // group:key pair — stable across engines, runs, and cluster
    // layouts, unlike rand()), so the result is oracle-exact. One
    // window + one filter; the collected array is bounded at N per
    // group regardless of group size.
    // Membership ("first 5 in keyed-hash order") is a bounded
    // SELECTION — graft.functions.TopK.minKByKey keeps the 5
    // smallest (hk, user_id) pairs in O(k) mergeable state, so the
    // per-event-type sort the partitionBy window needed (one task
    // per type over ~users x types rows) never happens; the full
    // 32-hex key decides ties exactly as the window's order did.
    "ch_grouparray_sample" -> Q(
      (s, dir) => {
        val users = Tables.events(s, dir)
          .select(col("event_type"), col("user_id")).distinct()
          .withColumn("hk",
            md5(concat(col("event_type"), lit(":"), col("user_id"))))
        users.groupBy("event_type")
          .agg(graft.functions.TopK.minKByKey(5, col("hk"), col("user_id"))
            .as("ids"))
          .select(col("event_type"),
            array_join(transform(col("ids"), x => x.cast("string")), ",")
              .as("sampled_users"))
          .orderBy("event_type")
      },
      Some("""
        WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        h AS (SELECT event_type, user_id,
                     md5(event_type || ':' || user_id) AS hk FROM u),
        r AS (SELECT event_type, user_id,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY hk, user_id) AS rn FROM h)
        SELECT event_type,
               string_agg(user_id, ',' ORDER BY rn) AS sampled_users
        FROM r WHERE rn <= 5 GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // sequenceCount('(?1)(?2)(?3)'): how many NON-OVERLAPPING
    // view -> click -> purchase chains each user completed, by the
    // greedy left-to-right scan CH uses (an event matching the
    // current stage advances it; stage 3 closes a chain and resets).
    // The scan state is encoded in one int (count << 2 | level) and
    // run by the same fold in both engines — Spark's aggregate() HOF
    // over the time-sorted per-user events, DuckDB's list_reduce in
    // the oracle. Like CH, the per-user event list is buffered for
    // the scan (CH caps it with max_events; a user's funnel events
    // are bounded in practice).
    "ch_sequencecount" -> Q(
      (s, dir) => {
        val stage = when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .when(col("event_type") === "purchase", 2)
        Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), stage.as("stage"))
          .filter(col("stage").isNotNull)
          .groupBy("user_id")
          .agg(shiftright(
            aggregate(
              array_sort(collect_list(struct(col("ts_us"), col("stage")))),
              lit(0),
              (acc, x) => when(x("stage") === acc.bitwiseAND(lit(3)),
                when(acc.bitwiseAND(lit(3)) === 2,
                  shiftleft(shiftright(acc, 2) + 1, 2))
                  .otherwise(acc + 1))
                .otherwise(acc)),
            2).as("n_chains"))
          .orderBy("user_id")
      },
      // The oracle fold runs as a RECURSIVE CTE (state per (user,
      // pos), one step per event rank) rather than list_reduce over
      // the grouped lists: DuckDB 1.0.0's list_reduce mis-slices the
      // child vectors of aggregate-built lists and permutes results
      // ACROSS rows at some batch shapes (observed at sf0.001: users
      // 7 and 14 received each other's chain counts; the same lists
      // as literals fold correctly). The recursion is row-at-a-time
      // by construction, same integer state machine.
      Some("""
        WITH RECURSIVE seq AS (
          SELECT user_id, stage,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts_us, stage) AS pos
          FROM (SELECT user_id, epoch_us(ts) AS ts_us,
                       CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
                            WHEN 'purchase' THEN 2 END AS stage
                FROM events) t
          WHERE stage IS NOT NULL),
        r(user_id, pos, acc) AS (
          SELECT DISTINCT user_id, 0, 0 FROM seq
          UNION ALL
          SELECT r.user_id, r.pos + 1,
                 CASE WHEN s.stage = r.acc % 4 THEN
                   CASE WHEN r.acc % 4 = 2 THEN (r.acc // 4 + 1) * 4
                        ELSE r.acc + 1 END
                 ELSE r.acc END
          FROM r JOIN seq s ON s.user_id = r.user_id AND s.pos = r.pos + 1)
        SELECT user_id, CAST(arg_max(acc, pos) // 4 AS INTEGER) AS n_chains
        FROM r GROUP BY user_id ORDER BY user_id"""))
  )
}
