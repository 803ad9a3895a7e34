package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Additional query-surface coverage: math/bitwise scalars, IN
  * subqueries, the rank window family, deterministic sampling, and a
  * range (interval) join.
  */
object Extra {

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Math scalars restricted to operations that are correctly-rounded
    // IEEE in both engines (sqrt yes; exp/log/pow differ by libm).
    "f_math" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice"), 1).as("rounded1"),
            floor(col("l_extendedprice")).cast("long").as("floored"),
            ceil(col("l_extendedprice")).cast("long").as("ceiled"),
            abs(col("l_extendedprice") - 1000.0).as("abs_delta"),
            signum(col("l_discount") - 0.05).cast("int").as("disc_sign"),
            sqrt(col("l_quantity")).as("sqrt_qty"),
            greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
            least(col("l_quantity"), col("l_tax") * 100).as("ls"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 1) AS rounded1,
               CAST(floor(l_extendedprice) AS BIGINT) AS floored,
               CAST(ceil(l_extendedprice) AS BIGINT) AS ceiled,
               abs(l_extendedprice - 1000.0) AS abs_delta,
               CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
               sqrt(l_quantity) AS sqrt_qty,
               greatest(l_quantity, l_discount * 100) AS gr,
               least(l_quantity, l_tax * 100) AS ls
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ------------------------------------------------------------------
    // Bitwise ops (exact integer semantics in both engines).
    "f_bitwise" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .select(col("o_orderkey"),
            (col("o_orderkey").bitwiseAND(255L)).as("band"),
            (col("o_orderkey").bitwiseOR(16L)).as("bor"),
            (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("bxor"),
            shiftright(col("o_orderkey"), 4).as("shr"),
            shiftleft(col("o_orderkey").bitwiseAND(15L), 2).as("shl"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               o_orderkey & 255 AS band,
               o_orderkey | 16 AS bor,
               xor(o_orderkey, o_custkey) AS bxor,
               o_orderkey >> 4 AS shr,
               (o_orderkey & 15) << 2 AS shl
        FROM orders ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // IN-subquery (uncorrelated): customers in nations that have
    // suppliers with high balances.
    "q_in_subquery" -> Q(
      (s, dir) => {
        val rich = Tables.supplier(s, dir)
          .filter(col("s_acctbal") > 5000)
          .select(col("s_nationkey")).distinct()
        Tables.customer(s, dir)
          .join(broadcast(rich), col("c_nationkey") === col("s_nationkey"), "left_semi")
          .select("c_custkey", "c_name", "c_nationkey")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_nationkey FROM customer
        WHERE c_nationkey IN (SELECT s_nationkey FROM supplier
                              WHERE s_acctbal > 5000)
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // The rank window family (rank / dense_rank / ntile / percent_rank
    // / cume_dist; the fractional ones are exact IEEE divisions of the
    // same integers in both engines).
    // Computed WITHOUT the 25-key partitionBy window (the r13 sf100
    // ceiling class — see q_window_ntile): over the TIE-FREE order
    // (retailprice, partkey) rank == dense_rank == in-group row
    // number, and the whole family is arithmetic on (rank, n) from
    // RankSelect.groupedRank. Same integers, same IEEE divisions;
    // oracle unchanged.
    "q_window_ranks" -> Q(
      (s, dir) => {
        val r = graft.plans.RankSelect.groupedRank(
          Tables.part(s, dir)
            .select(col("p_partkey"), col("p_brand"), col("p_retailprice")),
          "p_brand", Seq("p_retailprice", "p_partkey"))
        r.select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
            col("cum").cast("integer").as("rnk"),
            col("cum").cast("integer").as("drnk"),
            graft.plans.RankSelect.ntileExpr("cum", "n", 4).as("quartile"),
            when(col("n") > 1, (col("cum") - 1).cast("double") /
              (col("n") - 1).cast("double")).otherwise(lit(0.0)).as("prnk"),
            (col("cum").cast("double") / col("n").cast("double")).as("cdist"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey, p_brand, p_retailprice,
               CAST(rank() OVER w AS INTEGER) AS rnk,
               CAST(dense_rank() OVER w AS INTEGER) AS drnk,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               percent_rank() OVER w AS prnk,
               cume_dist() OVER w AS cdist
        FROM part
        WINDOW w AS (PARTITION BY p_brand
                     ORDER BY p_retailprice ASC, p_partkey ASC)
        ORDER BY p_partkey""")),

    // ------------------------------------------------------------------
    // Deterministic sampling (CH SAMPLE-clause shape): a stable
    // key-hash band, not rand() — reproducible across runs/engines
    // and cluster layouts.
    "q_sample" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_orderstatus")
      },
      Some(s"""
        SELECT o_orderstatus, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders WHERE o_orderkey % 10 = 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // arrayJoin / explode as a row-generating operator: corpus word
    // frequencies, top 20.
    "q_word_freq" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy("word")
          .agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("word").asc)
          .limit(20)
      },
      Some("""
        SELECT word, count(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word ORDER BY freq DESC, word ASC LIMIT 20""")),

    // ------------------------------------------------------------------
    // CH any()/anyLast() made deterministic: first/last order row per
    // customer by (date, key) — min_by/max_by aggregates, one pass.
    "ch_any" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy("o_custkey")
          .agg(
            min_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey")))
              .as("first_orderkey"),
            max_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey")))
              .as("last_orderkey"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey,
               first(o_orderkey ORDER BY o_orderdate, o_orderkey) AS first_orderkey,
               last(o_orderkey ORDER BY o_orderdate, o_orderkey) AS last_orderkey,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // ------------------------------------------------------------------
    // Correlated scalar subquery: orders above their own customer's
    // average, decorrelated into an aggregate + equi-join (which is
    // exactly what Catalyst does to the subquery form).
    "q_correlated_subquery" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val avgs = o.groupBy(col("o_custkey").as("ck"))
          .agg(davg(col("o_totalprice")).as("cust_avg"))
        o.join(avgs, col("o_custkey") === col("ck"))
          .filter(col("o_totalprice") > col("cust_avg"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some(s"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (SELECT ${S.davg("o_totalprice")}
                              FROM orders i WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // Range (interval) join: lineitem rows banded by a quantity-range
    // dimension. The interval table is tiny -> broadcast nested-loop
    // is the right plan; for a LARGE interval set the technique is
    // bin-explode + equi-join on bin + residual filter.
    "q_range_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val bands = Seq(
          ("tiny", 0.0, 10.0), ("small", 10.0, 20.0), ("mid", 20.0, 35.0),
          ("large", 35.0, 45.0), ("huge", 45.0, 1e9))
          .toDF("band", "lo", "hi")
        Tables.lineitem(s, dir)
          .join(broadcast(bands),
            col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .orderBy("band")
      },
      Some(s"""
        WITH bands(band, lo, hi) AS (VALUES
          ('tiny', 0.0, 10.0), ('small', 10.0, 20.0), ('mid', 20.0, 35.0),
          ('large', 35.0, 45.0), ('huge', 45.0, 1e9))
        SELECT band, count(*) AS n, ${S.dsum("l_quantity")} AS qty
        FROM lineitem JOIN bands
          ON l_quantity >= lo AND l_quantity < hi
        GROUP BY band ORDER BY band""")),

    // ------------------------------------------------------------------
    // INTERSECT: customers with a finished order AND a high-value
    // order. Spark plans set-intersection as a left-semi join over
    // distinct keys — one shuffle per side, no row explosion.
    "q_intersect" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .intersect(
            o.filter(col("o_totalprice") > 150000).select("o_custkey"))
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        ORDER BY o_custkey""")),

    // ------------------------------------------------------------------
    // EXCEPT: customers with a finished order and NO high-value order
    // (left-anti join over distinct keys).
    "q_except" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .except(
            o.filter(col("o_totalprice") > 300000).select("o_custkey"))
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        ORDER BY o_custkey""")),

    // ------------------------------------------------------------------
    // Salted join as a registry citizen: the static skew answer when
    // AQE cannot re-plan (streaming, or a key so hot one reducer
    // still drowns). Row-level results are identical to the plain
    // join — proven here by sharing the plain join's oracle.
    "q_salted_join" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_custkey").as("custkey"), col("o_totalprice"),
            col("o_orderkey"))
        val c = Tables.customer(s, dir)
          .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
        Skew.saltedJoin(o, c, "custkey", salts = 8, saltBy = col("o_orderkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("c_mktsegment")
      },
      Some(s"""
        SELECT c_mktsegment, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ------------------------------------------------------------------
    // Distribution window functions: ntile / percent_rank / cume_dist.
    // The order key (c_acctbal, c_custkey) is a total order, so every
    // rank — and therefore every quotient — is deterministic; the
    // quotients are single IEEE divisions of identical integer
    // operands in both engines.
    // Computed WITHOUT the 25-key partitionBy window (one task per
    // nation — the r13 sf100 ceiling class): the order (acctbal,
    // custkey) is tie-free, so ntile / percent_rank / cume_dist are
    // pure arithmetic on (in-group rank, group size) from
    // RankSelect.groupedRank's distributed prefix sum. The closing
    // divisions divide the same integers the window functions would,
    // so values are IEEE-identical and the oracle is unchanged.
    "q_window_ntile" -> Q(
      (s, dir) => {
        val r = graft.plans.RankSelect.groupedRank(
          Tables.customer(s, dir)
            .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")),
          "c_nationkey", Seq("c_acctbal", "c_custkey"))
        r.select(col("c_custkey"), col("c_nationkey"),
            graft.plans.RankSelect.ntileExpr("cum", "n", 4).as("quartile"),
            when(col("n") > 1, (col("cum") - 1).cast("double") /
              (col("n") - 1).cast("double")).otherwise(lit(0.0))
              .as("pct_rank"),
            (col("cum").cast("double") / col("n").cast("double")).as("cume"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_nationkey,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // FULL OUTER join of two pre-aggregated sides (rich-customer vs
    // poor-supplier nation profiles): aggregating BEFORE the join
    // shrinks both inputs to |nations| rows, so the outer join is
    // trivially cheap at any SF — the order that survives 100 TB.
    // Sides are filtered asymmetrically so both null-extension
    // directions actually occur.
    "q_full_outer" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
          .groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("rich_customers"))
        val su = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
          .groupBy(col("s_nationkey").as("nk2"))
          .agg(count(lit(1)).as("debt_suppliers"))
        c.join(su, col("nk") === col("nk2"), "full")
          .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
            col("rich_customers"), col("debt_suppliers"))
          .orderBy("nationkey")
      },
      Some("""
        SELECT coalesce(c.nk, s.nk2) AS nationkey,
               c.rich_customers, s.debt_suppliers
        FROM (SELECT c_nationkey AS nk, count(*) AS rich_customers
              FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
        FULL JOIN (SELECT s_nationkey AS nk2, count(*) AS debt_suppliers
              FROM supplier WHERE s_acctbal < 0 GROUP BY 1) s
          ON c.nk = s.nk2
        ORDER BY nationkey""")),

    // ------------------------------------------------------------------
    // Explicit CROSS JOIN (dim x dim scoring grid — the one shape
    // where a cartesian product is the intended plan; both sides are
    // broadcast-sized by construction).
    "q_cross_join" -> Q(
      (s, dir) => {
        Tables.nation(s, dir).select("n_nationkey", "n_regionkey")
          .crossJoin(Tables.region(s, dir).select("r_regionkey"))
          .select(col("n_nationkey"), col("r_regionkey"),
            (col("n_regionkey") === col("r_regionkey")).as("is_home"))
          .orderBy("n_nationkey", "r_regionkey")
      },
      Some("""
        SELECT n_nationkey, r_regionkey,
               n_regionkey = r_regionkey AS is_home
        FROM nation CROSS JOIN region
        ORDER BY n_nationkey, r_regionkey""")),

    // ------------------------------------------------------------------
    // Pure range self-join WITHOUT an equi key ("error events within
    // 10 min of each other"), executed as a BINNED equi join: bucket
    // time into window-sized bins, explode the left side to its three
    // candidate bins, equi-join on the bin, then apply the exact
    // range predicate. Spark's native plan for a pure range predicate
    // is a nested-loop/cartesian — quadratic at scale — while the
    // binned shape shuffles on the bin key like any other equi join
    // (3x row replication, linear; PlanSpec asserts no
    // BroadcastNestedLoopJoin survives). |t_a - t_b| <= W with bin
    // size W means bins differ by at most 1, so {b-1, b, b+1} on one
    // side is complete, and single-valued bins on the right make each
    // pair match exactly once.
    "q_interval_join_binned" -> Q(
      (s, dir) => {
        val W = 600000000L // 10 min in micros = the bin width
        val err = Tables.events(s, dir)
          .filter(col("event_type") === "error")
          .select(col("event_id"), col("ts_us"))
        val left = err.select(col("event_id").as("id_a"), col("ts_us").as("ta"))
          .withColumn("bin", explode(array(
            expr(s"ta div ${W}L - 1"), expr(s"ta div ${W}L"),
            expr(s"ta div ${W}L + 1"))))
        val right = err.select(col("event_id").as("id_b"), col("ts_us").as("tb"))
          .withColumn("bin", expr(s"tb div ${W}L"))
        left.join(right, Seq("bin"))
          .filter(col("id_a") < col("id_b") &&
            abs(col("ta") - col("tb")) <= W)
          .select(col("id_a"), col("id_b"), col("ta"), col("tb"))
          .orderBy("id_a", "id_b")
      },
      Some("""
        WITH e AS (SELECT event_id, epoch_us(ts) AS t
                   FROM events WHERE event_type = 'error')
        SELECT a.event_id AS id_a, b.event_id AS id_b,
               a.t AS ta, b.t AS tb
        FROM e a JOIN e b
          ON a.event_id < b.event_id AND abs(a.t - b.t) <= 600000000
        ORDER BY id_a, id_b""")),

    // ------------------------------------------------------------------
    // GROUPING() markers on a rollup: the flags that distinguish a
    // data NULL from a subtotal NULL — what makes rollup output
    // machine-consumable (CH exposes the same via grouping()).
    "q_grouping_id" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
            grouping(col("o_orderpriority")).cast("int").as("g_prio"),
            count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first,
            col("g_status"), col("g_prio"))
      },
      Some(s"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
               count(*) AS n, ${S.dsum("o_totalprice")} AS total
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST,
                 g_status, g_prio""")),

    // ------------------------------------------------------------------
    // Bloom-prefiltered semi join: the build side's keys aggregate
    // into a 64 KiB Bloom filter (map-side partials OR'd together —
    // graft.functions.Bloom), which prefilters the fact side BEFORE
    // its shuffle, so the exchange carries only rows that can match;
    // the exact semi join afterwards removes the (~0.1%) false
    // positives, keeping the composed result exact. This is the
    // runtime-filter idea engines apply internally, expressed as an
    // explicit operator: at 100 TB the filter is metadata (64 KiB to
    // the driver, like the IVF centroids), while the shuffle saving
    // is proportional to the fact table. The probe is a native
    // codegen expression (BloomContains via addReferenceObj).
    "q_bloom_semi_join" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val hot = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 450000).select(col("o_orderkey"))
        val bits = hot.agg(graft.functions.Bloom.build(col("o_orderkey")).as("f"))
          .head().getAs[Array[Byte]](0)
        Tables.lineitem(s, dir)
          .filter(call_function("graft_bloom_contains",
            xxhash64(col("l_orderkey")), lit(bits)))
          .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_lines"),
            psumRev(col("l_extendedprice"), col("l_discount"))
              .as("revenue"))
          .orderBy("l_orderkey")
      },
      Some(s"""
        SELECT l_orderkey, count(*) AS n_lines,
               ${S.revenue("l_extendedprice", "l_discount")} AS revenue
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_totalprice > 450000)
        GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ------------------------------------------------------------------
    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // match the dimension's NULL row instead of silently dropping —
    // the dimension-decode pattern where "unknown" is itself a coded
    // value. The dim broadcasts; null-safe equality is still a hash
    // join key in Spark (NULL hashes like any value under <=>), so
    // the plan stays a BroadcastHashJoin, not a nested loop.
    "q_null_safe_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val dim = Seq(("F", "finished"), ("O", "open"), ("P", "pending"),
          (null.asInstanceOf[String], "unknown")).toDF("dk", "label")
        Tables.orders(s, dir)
          .withColumn("k",
            when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null))
              .otherwise(col("o_orderstatus")))
          .join(broadcast(dim), col("k") <=> col("dk"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("label")
      },
      Some(s"""
        WITH dim(k, label) AS (VALUES
          ('F', 'finished'), ('O', 'open'), ('P', 'pending'),
          (NULL, 'unknown')),
        o AS (SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                          ELSE o_orderstatus END AS k, o_totalprice
              FROM orders)
        SELECT label, count(*) AS n, ${S.dsum("o_totalprice")} AS total
        FROM o JOIN dim ON o.k IS NOT DISTINCT FROM dim.k
        GROUP BY label ORDER BY label""")),

    // ------------------------------------------------------------------
    // Several DISTINCT aggregates over DIFFERENT columns in one query
    // — the classic plan trap. Spark handles it with one Expand (rows
    // replicated per distinct group, null-padded) feeding a single
    // two-level aggregation; the naive alternative is one self-join
    // per distinct column. Worth pinning because at 100 TB the Expand
    // costs 3x the scan rows in ONE pass, while the join version
    // costs 3 scans plus 3 shuffles plus a join.
    "q_multi_distinct" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy("o_orderstatus")
          .agg(
            countDistinct(col("o_custkey")).as("uniq_custs"),
            countDistinct(col("o_orderpriority")).as("uniq_prios"),
            countDistinct(date_format(col("o_orderdate"), "yyyy-MM"))
              .as("uniq_months"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS uniq_custs,
               count(DISTINCT o_orderpriority) AS uniq_prios,
               count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS uniq_months,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // Fuzzy self-join at edit distance <= 1 via FastSS deletion-
    // neighborhood blocking: each name emits itself plus every
    // 1-char-deleted variant as join keys; any two strings within one
    // edit (insert / delete / substitute) share at least one key, so
    // candidate generation is a keyed equi-join — length+1 keys per
    // row — never the n² cross join a naive fuzzy match plans.
    // Exact verification (levenshtein <= 1) runs on candidates only.
    // The oracle IS the n² cross join (fine at test SF), so a pass
    // proves the blocking loses no pair and admits no false one.
    // Scaling note (generated-corpus decades): on a DENSE sequential
    // keyspace (Supplier#000...N) every 10x step frees one more digit
    // position, so true edit-1 pairs grow N*log10(N) — the measured
    // sf1->sf10 runtime ratio (12.5x) equals the pair-count ratio
    // (45/36 * 10) exactly: the operator is output-linear, which is
    // the best any exact fuzzy join can be.
    "q_fuzzy_join" -> Q(
      (s, dir) => {
        val keys = Tables.supplier(s, dir).select(col("s_name"),
          explode(concat(array(col("s_name")),
            expr("""transform(sequence(1, length(s_name)),
                    i -> concat(substring(s_name, 1, i-1),
                                substring(s_name, i+1, length(s_name))))""")))
            .as("k"))
        keys.as("a").join(keys.as("b"),
            col("a.k") === col("b.k") && col("a.s_name") < col("b.s_name"))
          .select(col("a.s_name").as("name_a"), col("b.s_name").as("name_b"))
          .distinct()
          .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
          .filter(col("dist") <= 1)
          .orderBy("name_a", "name_b")
      },
      Some("""
        SELECT a.s_name AS name_a, b.s_name AS name_b,
               CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS dist
        FROM supplier a, supplier b
        WHERE a.s_name < b.s_name AND levenshtein(a.s_name, b.s_name) <= 1
        ORDER BY name_a, name_b""")),

    // ------------------------------------------------------------------
    // Multiset set operations (INTERSECT ALL / EXCEPT ALL): duplicate
    // CARDINALITY matters — a quantity appearing 3x on one side and
    // 2x on the other intersects twice, subtracts once. Spark plans
    // these as a replicated-count aggregate + generate, not a join
    // per duplicate; the summary keeps the output bounded while the
    // set ops themselves run over the full multisets.
    "q_setops_all" -> Q(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val r = l.filter(col("l_returnflag") === "R")
          .select(col("l_partkey"), col("l_quantity").cast("int").as("q"))
        val a = l.filter(col("l_returnflag") === "A")
          .select(col("l_partkey"), col("l_quantity").cast("int").as("q"))
        val both = r.intersectAll(a).withColumn("op", lit("intersect_all"))
          .unionByName(r.exceptAll(a).withColumn("op", lit("except_all")))
        both.groupBy("op")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("l_partkey")).as("n_parts"),
            sum(col("q")).cast("long").as("total_qty"))
          .orderBy("op")
      },
      Some("""
        WITH r AS (SELECT l_partkey, CAST(l_quantity AS INTEGER) AS q
                   FROM lineitem WHERE l_returnflag = 'R'),
        a AS (SELECT l_partkey, CAST(l_quantity AS INTEGER) AS q
              FROM lineitem WHERE l_returnflag = 'A'),
        i AS (SELECT 'intersect_all' AS op, * FROM
                (SELECT * FROM r INTERSECT ALL SELECT * FROM a)),
        e AS (SELECT 'except_all' AS op, * FROM
                (SELECT * FROM r EXCEPT ALL SELECT * FROM a))
        SELECT op, count(*) AS n_rows,
               count(DISTINCT l_partkey) AS n_parts,
               CAST(sum(q) AS BIGINT) AS total_qty
        FROM (SELECT * FROM i UNION ALL SELECT * FROM e)
        GROUP BY op ORDER BY op""")),

    // ------------------------------------------------------------------
    // Null-key skew routing for LEFT joins: an inner join lets Spark
    // inject isnotnull on the keys, but a left join must keep
    // null-key rows — so at scale every null key hashes to ONE
    // reducer that receives them all and matches none. The fix is
    // structural: route null-key rows AROUND the shuffle (they cannot
    // match by definition) and union them back with null right-side
    // columns. Same rows as the plain left join — the oracle IS the
    // plain left join.
    "q_null_skew_join" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .withColumn("k", when(col("o_custkey") % 13 =!= 0, col("o_custkey")))
        val c = Tables.customer(s, dir).select(
          col("c_custkey"), col("c_mktsegment"))
        val matched = o.filter(col("k").isNotNull)
          .join(c, col("k") === col("c_custkey"), "left")
        val routed = o.filter(col("k").isNull)
          .withColumn("c_custkey", lit(null).cast("long"))
          .withColumn("c_mktsegment", lit(null).cast("string"))
        matched.unionByName(routed)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("c_mktsegment")
      },
      Some(s"""
        SELECT c_mktsegment, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM (SELECT CASE WHEN o_custkey % 13 <> 0 THEN o_custkey END AS k,
                     o_totalprice
              FROM orders) o
        LEFT JOIN customer ON o.k = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ------------------------------------------------------------------
    // DISTINCT count over a sliding row frame (how many distinct
    // event types in each user's last 5 events) — Spark windows do
    // not accept DISTINCT aggregates, so the portable shape is
    // array_distinct over a collect_list bounded to the frame: state
    // is O(frame) per row by construction, the window shuffle keys on
    // user_id only. The oracle uses DuckDB's native windowed
    // count(DISTINCT).
    "q_window_distinct" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(-4, 0)
        Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("event_id"),
            size(array_distinct(collect_list(col("event_type")).over(w)))
              .as("uniq_types_5"))
          .orderBy("user_id", "ts_us", "event_id")
      },
      Some("""
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               CAST(count(DISTINCT event_type) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS INTEGER)
                 AS uniq_types_5
        FROM events ORDER BY user_id, ts_us, event_id""")),

    // ------------------------------------------------------------------
    // Generator expressions (CH numbers()/range() + arrayJoin, SQL
    // UNNEST(generate_series)): each June-1995 order expands to its
    // 7-day "active week" via sequence() + explode — pure per-row
    // codegen'd generation, no shuffle until the closing rollup — and
    // the per-day concurrency profile is aggregated. The generated
    // rows never exist as a table: at 100 TB the expansion streams
    // through the aggregate's map-side combine.
    "q_generate" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .filter(col("o_orderdate").between("1995-06-01", "1995-06-30"))
          .select(explode(sequence(col("o_orderdate").cast("date"),
            date_add(col("o_orderdate").cast("date"), 6))).as("active_day"))
          .groupBy(col("active_day").cast("string").as("active_day"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy("active_day")
      },
      Some("""
        SELECT CAST(CAST(d.d AS DATE) AS VARCHAR) AS active_day,
               count(*) AS n_active
        FROM orders,
             LATERAL UNNEST(generate_series(o_orderdate,
               o_orderdate + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS d(d)
        WHERE o_orderdate BETWEEN DATE '1995-06-01' AND DATE '1995-06-30'
        GROUP BY 1 ORDER BY active_day""")),

    // ------------------------------------------------------------------
    // Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    // user via the classic day_number - row_number grouping key (two
    // window passes, one aggregate — no self-join, no iteration).
    // Output is each user's islands with start/end/length; the same
    // constant-shift trick both engines compute identically.
    "q_gaps_islands" -> Q(
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("day_n")
        Tables.events(s, dir)
          .select(col("user_id"),
            to_date(col("ts")).as("day"),
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
              .as("day_n"))
          .distinct()
          .withColumn("grp", col("day_n") - row_number().over(byUser))
          .groupBy("user_id", "grp")
          .agg(min(col("day")).cast("string").as("island_start"),
            max(col("day")).cast("string").as("island_end"),
            count(lit(1)).as("days"))
          .drop("grp")
          .orderBy("user_id", "island_start")
      },
      Some("""
        WITH d AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
                 datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_n
          FROM events),
        g AS (
          SELECT user_id, day,
                 day_n - row_number() OVER (PARTITION BY user_id
                   ORDER BY day_n) AS grp
          FROM d)
        SELECT user_id, CAST(min(day) AS VARCHAR) AS island_start,
               CAST(max(day) AS VARCHAR) AS island_end, count(*) AS days
        FROM g GROUP BY user_id, grp
        ORDER BY user_id, island_start"""))
  )
}
