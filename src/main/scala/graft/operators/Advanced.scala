package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Advanced analytics surface: rank statistics (AUC), hypothesis
  * tests from exact moments, interval-union measures, and the
  * dynamic-partition-pruning scan path.
  *
  * Exactness follows the Stats.scala playbook: every aggregate the
  * final formula consumes is an exact integer/decimal sum, and the
  * closing floating-point expression is written with the identical
  * IEEE operation tree in Spark and the DuckDB oracle.
  */
object Advanced {

  /** Exact decimal product sum, integer-rounded then cast to double
    * (unscaled < 2^53 keeps both engines' casts exact). */
  private def isum(c: Column): Column =
    sum(c).cast(DecimalType(38, 0)).cast("double")

  /** DuckDB mirror — explicit round() first because DuckDB's decimal
    * rescale truncates where Spark rounds HALF_UP. */
  private def isumSql(e: String): String =
    s"CAST(CAST(round(sum($e), 0) AS DECIMAL(38,0)) AS DOUBLE)"

  private def tmp(dir: String, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  /** One-time month-partitioned lineitem layout for the DPP scan (a
    * fact written PARTITION BY month, the ClickHouse layout
    * ch_final_write demonstrates). Written once per corpus per JVM —
    * the _SUCCESS marker makes re-entry a no-op, so bench iterations
    * measure the pruned JOIN, not the rewrite.
    */
  private def dppLayout(s: SparkSession, dir: String): String = {
    val path = tmp(dir, "dpp")
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.isFile) {
      graft.sources.Sink.writePartitionedSorted(
        Tables.lineitem(s, dir), path,
        "ship_month" -> date_format(col("l_shipdate"), "yyyy-MM"),
        Seq("l_orderkey"))
    }
    path
  }

  /** One-time z-order clustered lineitem layout (Morton interleave of
    * partkey/suppkey, range-partitioned into 8 files, small row
    * groups) — shared by sink_zorder and the manifest-pruned read.
    */
  private def zorderLayout(s: SparkSession, dir: String): String = {
    val out = tmp(dir, "zorder")
    if (!new java.io.File(s"$out/_SUCCESS").isFile) {
      Tables.lineitem(s, dir)
        .withColumn("z", graft.sources.Zorder
          .interleave(col("l_partkey"), col("l_suppkey")))
        .repartitionByRange(8, col("z"))
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(out)
    }
    out
  }

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // ROC AUC as a rank statistic (the Mann-Whitney U formulation):
    // does order value separate finished ('F') orders from the rest,
    // per priority class? Two window passes compute 2x the average
    // rank of every row (2*rank + ties - 1 stays integer), one hash
    // aggregation collects the three exact integers the closing
    // formula needs: AUC = (2S - P(P+1)) / (2 P N). Everything before
    // the single IEEE division is exact integer arithmetic, so both
    // engines emit bit-identical doubles. Scales as one sort per
    // group (the honest cost of ranking) + one agg; no per-group
    // buffering.
    "ch_auc" -> Q(
      (s, dir) => {
        val byScore = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice")
        val ties = Window.partitionBy("o_orderpriority", "o_totalprice")
        Tables.orders(s, dir)
          .withColumn("two_r",
            lit(2L) * rank().over(byScore) + count(lit(1)).over(ties) - 1L)
          .withColumn("pos",
            (col("o_orderstatus") === "F").cast("long"))
          .groupBy("o_orderpriority")
          .agg(sum(when(col("pos") === 1L, col("two_r"))).as("s2"),
            sum(col("pos")).as("p"),
            (count(lit(1)) - sum(col("pos"))).as("n"))
          .select(col("o_orderpriority"), col("p"), col("n"),
            ((col("s2") - col("p") * (col("p") + 1L)).cast("double") /
              (lit(2L) * col("p") * col("n")).cast("double")).as("auc"))
          .orderBy("o_orderpriority")
      },
      Some("""
        WITH r AS (
          SELECT o_orderpriority,
                 2 * rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice)
                   + count(*) OVER (PARTITION BY o_orderpriority, o_totalprice)
                   - 1 AS two_r,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
          FROM orders),
        m AS (SELECT o_orderpriority,
                     sum(CASE WHEN pos = 1 THEN two_r END) AS s2,
                     sum(pos) AS p, count(*) - sum(pos) AS n
              FROM r GROUP BY o_orderpriority)
        SELECT o_orderpriority, CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n,
               CAST(s2 - p * (p + 1) AS DOUBLE)
                 / CAST(2 * p * n AS DOUBLE) AS auc
        FROM m ORDER BY o_orderpriority"""),
    ),

    // ------------------------------------------------------------------
    // Welch's two-sample t-test from exact conditional moments (CH
    // welchTTest): per return flag, does extended price differ
    // between high-discount (> 0.05) and low-discount lines? One hash
    // aggregation computes all six moments map-side-combinably; the
    // t statistic and Welch-Satterthwaite df are a closing expression
    // on exact operands with the identical IEEE tree in both engines.
    "ch_ttest" -> Q(
      (s, dir) => {
        // r13: squared-price sums on exact long cents via the hi/lo
        // split (Dec.isumLong) — bit-identical, no per-row BigDecimal.
        val pc = cents(col("l_extendedprice"))
        val hi = col("l_discount") > 0.05
        val m = Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(sum(when(hi, 1L).otherwise(0L)).as("n1"),
            dsum(when(hi, col("l_extendedprice"))).as("s1"),
            isumLong(4, when(hi, pc * pc)).as("ss1"),
            sum(when(hi, 0L).otherwise(1L)).as("n2"),
            dsum(when(!hi, col("l_extendedprice"))).as("s2"),
            isumLong(4, when(!hi, pc * pc)).as("ss2"))
        val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
        val v1 = (col("ss1") - col("s1") * col("s1") / n1) / (n1 - 1.0)
        val v2 = (col("ss2") - col("s2") * col("s2") / n2) / (n2 - 1.0)
        val a = v1 / n1; val b = v2 / n2
        m.select(col("l_returnflag"), col("n1"), col("n2"),
            ((col("s1") / n1 - col("s2") / n2) / sqrt(a + b)).as("t_stat"),
            ((a + b) * (a + b) /
              (a * a / (n1 - 1.0) + b * b / (n2 - 1.0))).as("welch_df"))
          .orderBy("l_returnflag")
      },
      Some(s"""
        WITH m AS (
          SELECT l_returnflag,
                 sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS n1,
                 CAST(sum(CASE WHEN l_discount > 0.05
                          THEN ${S.d("l_extendedprice")} END) AS DOUBLE) AS s1,
                 ${isumSql(s"CASE WHEN l_discount > 0.05 THEN ${S.d("l_extendedprice")} * CAST(l_extendedprice AS DECIMAL(19,4)) END")} AS ss1,
                 sum(CASE WHEN l_discount > 0.05 THEN 0 ELSE 1 END) AS n2,
                 CAST(sum(CASE WHEN NOT l_discount > 0.05
                          THEN ${S.d("l_extendedprice")} END) AS DOUBLE) AS s2,
                 ${isumSql(s"CASE WHEN NOT l_discount > 0.05 THEN ${S.d("l_extendedprice")} * CAST(l_extendedprice AS DECIMAL(19,4)) END")} AS ss2
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               (s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE))
                 / sqrt((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
                        + (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE))
                 AS t_stat,
               ((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
                + (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE))
               * ((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
                  + (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE))
               / ((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
                  * ((ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE))
                  / (CAST(n1 AS DOUBLE) - 1.0)
                  + (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE)
                  * ((ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) / CAST(n2 AS DOUBLE))
                  / (CAST(n2 AS DOUBLE) - 1.0)) AS welch_df
        FROM m ORDER BY l_returnflag"""),
    ),

    // ------------------------------------------------------------------
    // intervalLengthSum: each event opens a 30-minute activity
    // interval; per user, the UNION length of those intervals (overlap
    // counted once) and the number of disjoint activity islands. The
    // classic sweep: a running max-end window marks island starts, a
    // running sum numbers the islands, one agg measures each island,
    // one more totals per user — all integer microsecond arithmetic,
    // all linear in events per user, no interval buffering.
    "ch_interval_length_sum" -> Q(
      (s, dir) => {
        val iv = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us").as("st"),
            (col("ts_us") + 1800000000L).as("en"))
        val w = Window.partitionBy("user_id").orderBy("st")
        val prevMax = max(col("en"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1))
        iv.withColumn("new_island",
            when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
          .withColumn("island",
            sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "island")
          .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
          .groupBy("user_id")
          .agg(sum(col("ien") - col("ist")).as("busy_us"),
            count(lit(1)).as("n_islands"))
          .orderBy("user_id")
      },
      Some("""
        WITH iv AS (SELECT user_id, epoch_us(ts) AS st,
                           epoch_us(ts) + 1800000000 AS en FROM events),
        m AS (SELECT user_id, st, en,
                CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY st
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     IS NULL
                     OR st > max(en) OVER (PARTITION BY user_id ORDER BY st
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     THEN 1 ELSE 0 END AS new_island
              FROM iv),
        isl AS (SELECT user_id, st, en,
                  sum(new_island) OVER (PARTITION BY user_id ORDER BY st
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
                FROM m),
        g AS (SELECT user_id, island, min(st) AS ist, max(en) AS ien
              FROM isl GROUP BY user_id, island)
        SELECT user_id, CAST(sum(ien - ist) AS BIGINT) AS busy_us,
               count(*) AS n_islands
        FROM g GROUP BY user_id ORDER BY user_id"""),
    ),

    // ------------------------------------------------------------------
    // Dynamic partition pruning: revenue per ship month read from the
    // month-partitioned fact layout, restricted to months in which an
    // urgent 1995 order was placed — a filter the engine only learns
    // AT RUNTIME from the dimension side. Catalyst turns the join key
    // into a dynamic partition filter on the fact scan (the broadcast
    // is reused as the pruning subquery), so only the qualifying
    // month directories are read — at 100 TB the difference between
    // scanning a year and scanning the months that matter.
    // AdvancedSpec asserts `dynamicpruning` appears in the fact
    // scan's partition filters.
    "q_dpp" -> Q(
      (s, dir) => {
        val fact = s.read.parquet(dppLayout(s, dir))
        val months = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            year(col("o_orderdate")) === 1995)
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
          .distinct()
        fact.join(broadcast(months), "ship_month")
          .groupBy("ship_month")
          .agg(psumRev(col("l_extendedprice"), col("l_discount"))
            .as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy("ship_month")
      },
      Some(s"""
        WITH months AS (
          SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
          FROM orders
          WHERE o_orderpriority = '1-URGENT'
            AND date_part('year', o_orderdate) = 1995)
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               ${S.revenue("l_extendedprice", "l_discount")} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN months ON strftime(l_shipdate, '%Y-%m') = months.ship_month
        GROUP BY 1 ORDER BY ship_month"""),
    ),

    // ------------------------------------------------------------------
    // Correlated LATERAL subquery: top-2 customers by balance per
    // nation, written as the LATERAL join users write it — Catalyst
    // decorrelates the per-row ORDER BY ... LIMIT into a ranked
    // window over ONE scan of customer, not a nested loop.
    "q_lateral_join" -> Q(
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("lat_nation")
        Tables.customer(s, dir).createOrReplaceTempView("lat_customer")
        s.sql("""
          SELECT n.n_name, t.c_custkey, t.c_acctbal
          FROM lat_nation n,
          LATERAL (SELECT c_custkey, c_acctbal FROM lat_customer c
                   WHERE c.c_nationkey = n.n_nationkey
                   ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
          ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""")
      },
      Some("""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey"""),
    ),

    // ------------------------------------------------------------------
    // BPE merge statistics (the first iteration of byte-pair-encoding
    // tokenizer training): corpus-wide counts of adjacent character
    // pairs within words, top-20 by frequency. Word explode + an
    // index-sequence explode keep everything in generated code; the
    // only shuffle is the pair-count aggregation (map-side combined).
    // The rank filter (not LIMIT) makes boundary ties deterministic.
    "txt_bpe_pairs" -> Q(
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(explode(split(lower(col("text")), "\\s+")).as("w"))
          .filter(length(col("w")) >= 2)
        val pairs = words.select(explode(
          transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
        val wnd = Window.orderBy(col("n").desc, col("pair"))
        pairs.groupBy("pair").agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(wnd).cast("int"))
          .filter(col("rk") <= 20)
          .orderBy("rk")
      },
      Some("""
        WITH words AS (
          SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          FROM documents),
        pairs AS (
          SELECT unnest(list_transform(range(1, length(w)),
                                       i -> substring(w, i, 2))) AS pair
          FROM words WHERE length(w) >= 2),
        c AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair)
        SELECT pair, n,
               CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER) AS rk
        FROM c QUALIFY rk <= 20 ORDER BY rk"""),
    ),

    // ------------------------------------------------------------------
    // Triangle counting on the co-supplier graph (suppliers that
    // co-occur in >= 8 distinct orders): the standard oriented
    // edge-join — edges directed low-id -> high-id so each triangle
    // is generated exactly once, wedge join + closing-edge join, all
    // equi-joins. Per-order pair generation is bounded by lines per
    // order (~7 -> <= 21 pairs), so edge building is linear in
    // lineitem; the >= 8 co-occurrence threshold keeps the graph
    // sparse as the corpus grows. (At 100 TB one orients by DEGREE
    // instead of id — same count, provably O(m^1.5) wedges; id
    // orientation keeps the oracle mirror trivial here.)
    "graph_triangles" -> Q(
      (s, dir) => {
        // r13: Spark INLINES multiply-referenced CTEs — the former
        // single statement replanned the `so` self-join + `e` edge
        // aggregation under every reference (24 parquet scans / 88
        // aggregates in one physical plan, zero ReusedExchange).
        // Materializing the distinct pair set and the thresholded edge
        // list eagerly (localCheckpoint, computed inside the timed fn)
        // makes every downstream reference a cached-table read: the
        // wedge join + closing-edge join now read `e` three times from
        // one materialization instead of rebuilding it from lineitem.
        Tables.lineitem(s, dir).createOrReplaceTempView("tri_li")
        // r14 (advice): swap through CkptSlot so a resident session
        // frees the PREVIOUS invocation's checkpoint blocks instead
        // of accumulating them for the life of the JVM.
        graft.CkptSlot.swap("tri_so",
          s.sql("""SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                 FROM tri_li""")
            .localCheckpoint(eager = true)).createOrReplaceTempView("tri_so")
        graft.CkptSlot.swap("tri_e",
          s.sql("""
          SELECT a.sk AS u, b.sk AS v
          FROM tri_so a JOIN tri_so b ON a.ok = b.ok AND a.sk < b.sk
          GROUP BY a.sk, b.sk HAVING count(*) >= 8""")
            .localCheckpoint(eager = true)).createOrReplaceTempView("tri_e")
        s.sql("""
          WITH vtx AS (SELECT count(DISTINCT x) AS n_vertices
                  FROM (SELECT u AS x FROM tri_e UNION ALL SELECT v AS x FROM tri_e)),
          m AS (SELECT count(*) AS n_edges FROM tri_e),
          t AS (SELECT count(*) AS n_triangles
                FROM tri_e e1 JOIN tri_e e2 ON e1.v = e2.u
                          JOIN tri_e e3 ON e1.u = e3.u AND e2.v = e3.v)
          SELECT n_vertices, n_edges, n_triangles FROM vtx, m, t""")
      },
      Some("""
        WITH so AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                    FROM lineitem),
        e AS (SELECT a.sk AS u, b.sk AS v
              FROM so a JOIN so b ON a.ok = b.ok AND a.sk < b.sk
              GROUP BY a.sk, b.sk HAVING count(*) >= 8),
        vtx AS (SELECT count(DISTINCT x) AS n_vertices
                FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)),
        m AS (SELECT count(*) AS n_edges FROM e),
        t AS (SELECT count(*) AS n_triangles
              FROM e e1 JOIN e e2 ON e1.v = e2.u
                        JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v)
        SELECT n_vertices, n_edges, n_triangles FROM vtx, m, t"""),
    ),

    // ------------------------------------------------------------------
    // Theta-sketch set operations on KMV states (CH uniqTheta):
    // audience overlap between the purchase and click segments from
    // two bounded mergeable sketches — the states are built
    // distributed (fixed 32 KB aggregation state per segment), handed
    // to the driver exactly as a sketch service would ship them, and
    // combined by the theta rule. k=4096 keeps the estimates EXACT
    // through sf0.1's user count, which is what lets DuckDB verify
    // them cell-exact; beyond k the same code degrades to ~1.6%
    // error (IncrementalSpec pins the estimator; KmvSetOpsSpec the
    // theta rule at overflow).
    "ch_kmv_setops" -> Q(
      (s, dir) => {
        import graft.functions.Kmv
        val k = 4096
        val ev = Tables.events(s, dir)
        def sketch(t: String): Array[Byte] = ev
          .filter(col("event_type") === t)
          .agg(Kmv.state(k, xxhash64(col("user_id"))).as("st"))
          .collect().head.getAs[Array[Byte]](0)
        val p = sketch("purchase"); val c = sketch("click")
        val (u, i) = Kmv.setOps(p, c, k)
        import s.implicits._
        Seq((Kmv.estimate(p, k), Kmv.estimate(c, k), u, i,
            i.toDouble / u.toDouble))
          .toDF("purchase_users", "click_users", "union_users",
            "both_users", "jaccard")
      },
      Some("""
        WITH p AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        SELECT (SELECT count(*) FROM p) AS purchase_users,
               (SELECT count(*) FROM c) AS click_users,
               (SELECT count(*) FROM (SELECT * FROM p UNION SELECT * FROM c))
                 AS union_users,
               (SELECT count(*) FROM (SELECT * FROM p INTERSECT SELECT * FROM c))
                 AS both_users,
               CAST((SELECT count(*) FROM (SELECT * FROM p INTERSECT SELECT * FROM c)) AS DOUBLE)
                 / CAST((SELECT count(*) FROM (SELECT * FROM p UNION SELECT * FROM c)) AS DOUBLE)
                 AS jaccard"""),
    ),

    // ------------------------------------------------------------------
    // Z-order clustered write + box-predicate read-back: lineitem
    // laid out by the Morton interleave of (l_partkey, l_suppkey), so
    // row-group min/max stats prune BOX predicates on both columns
    // (Sink.writePartitionedSorted's 1-d sort can only skip on its
    // leading key). The oracle verifies the round-trip box query;
    // AdvancedSpec proves the layout reads fewer rows than a 1-d
    // sorted layout for the same box.
    "sink_zorder" -> Q(
      (s, dir) => {
        s.read.parquet(zorderLayout(s, dir))
          .filter(col("l_partkey").between(10, 50) &&
            col("l_suppkey").between(2, 5))
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_quantity").cast(DecimalType(10, 0))).cast("long")
              .as("sum_qty"))
          .orderBy("l_suppkey")
      },
      Some("""
        SELECT l_suppkey, count(*) AS n_lines,
               CAST(sum(CAST(l_quantity AS DECIMAL(10,0))) AS BIGINT) AS sum_qty
        FROM lineitem
        WHERE l_partkey BETWEEN 10 AND 50 AND l_suppkey BETWEEN 2 AND 5
        GROUP BY l_suppkey ORDER BY l_suppkey"""),
    ),

    // ------------------------------------------------------------------
    // Bounded-memory quantiles by deterministic bottom-k-by-hash
    // sampling (CH's reservoir `quantile()`, made deterministic and
    // mergeable — see functions/SampleQuantile.scala). Per supplier
    // the sample is the whole group at verification scale, so the
    // quantiles are exactly percentile_cont's and DuckDB checks them
    // cell-exact; past k rows the state stays 16 KB and degrades to a
    // uniform-sample estimate (error pinned in AdvancedSpec).
    "ch_quantile_sample" -> Q(
      (s, dir) => {
        // the sampling unit must be the ROW: (orderkey, linenumber) is
        // NOT unique in this synthetic data, so hash every column
        val rowHash = xxhash64(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_shipdate"))
        Tables.lineitem(s, dir)
          .groupBy("l_suppkey")
          .agg(graft.functions.SampleQuantile(4096, Seq(0.5, 0.9),
            rowHash, col("l_extendedprice")).as("qv"))
          .select(col("l_suppkey"),
            round(element_at(col("qv"), 1), 6).as("median_price"),
            round(element_at(col("qv"), 2), 6).as("p90_price"))
          .orderBy("l_suppkey")
      },
      Some("""
        SELECT l_suppkey,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
        FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey"""),
    ),

    // ------------------------------------------------------------------
    // quantileTDigest: MERGEABLE bounded-error quantiles over an
    // UNBOUNDED value domain (functions/TDigestSketch.scala) — the
    // sketch class the exact family here cannot serve: ch_quantiles/
    // ch_mad assume a bounded integer cent domain, ch_quantile_sample
    // is exact only below k rows; an AggregatingMergeTree-style MV
    // folding arbitrary doubles forever needs O(compression) mergeable
    // state. The probed value is the classic disc/tax price expression
    // — a dense product domain no cent histogram can index. Estimator
    // values are merge-order-dependent, so the oracle is the
    // ch_quantiles_approx RANK-CERTIFICATE device: the output re-ranks
    // each estimate against the data and emits per-quantile booleans
    // that the empirical rank landed within the k0 bound
    // (3/compression, +slack); DuckDB asserts the booleans. The merge
    // LAW (shard-merge == whole-data digest, both within bound) is
    // IncrementalSpec's case. benchFn measures the sketch-only
    // production plan (one partial-agg shuffle of 200-centroid
    // states), not the certificate's verification join.
    "ch_quantile_tdigest" -> Q(
      (s, dir) => {
        val qs = Seq(0.1, 0.5, 0.9, 0.99)
        val li = Tables.lineitem(s, dir)
          .withColumn("x", (col("l_extendedprice") * (lit(1.0) + col("l_tax"))
            * (lit(1.0) - col("l_discount"))).cast("double"))
        val est = li.groupBy("l_returnflag")
          .agg(graft.functions.TDigestSketch(200, qs, col("x")).as("est"))
        def ok(i: Int, q: Double) = {
          val e = col("est").getItem(i)
          val n = count(lit(1))
          ((count_if(col("x") < e) <= (lit(q) + lit(0.02)) * n) &&
            (count_if(col("x") <= e) >= (lit(q) - lit(0.02)) * n))
            .as(s"q${(q * 100).toInt}_rank_ok")
        }
        li.join(broadcast(est), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            ok(0, 0.1), ok(1, 0.5), ok(2, 0.9), ok(3, 0.99))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
               TRUE AS q10_rank_ok, TRUE AS q50_rank_ok,
               TRUE AS q90_rank_ok, TRUE AS q99_rank_ok
        FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""),
      benchFn = Some((s, dir) => {
        val qs = Seq(0.1, 0.5, 0.9, 0.99)
        Tables.lineitem(s, dir)
          .withColumn("x", (col("l_extendedprice") * (lit(1.0) + col("l_tax"))
            * (lit(1.0) - col("l_discount"))).cast("double"))
          .groupBy("l_returnflag")
          .agg(graft.functions.TDigestSketch(200, qs, col("x")).as("est"))
          .select(col("l_returnflag"),
            posexplode(col("est")).as(Seq("qi", "estimate")))
      })),

    // ------------------------------------------------------------------
    // quantileTDigest with the k1 (tail-sharpening) scale function —
    // CH's actual quantileTDigest scale. Same mergeable O(compression)
    // state and plan shape as the k0 entry above; the difference is the
    // GUARANTEE: cluster rank width tracks (2π/δ)√(q(1−q)) instead of
    // the uniform 1/δ, so p99/p999 clusters are ~10x/~30x narrower at
    // δ=200 — the p999-dashboard contract a uniform sketch cannot give.
    // The oracle is the same rank-certificate device at the TAIL
    // quantiles the k1 scale exists for: per-quantile tolerance
    // max(8π√(q(1−q))·n/δ, 4 rows) — the documented bound
    // (functions/TDigestSketch.compressK1), 2x merge factor included.
    "ch_quantile_tdigest_k1" -> Q(
      (s, dir) => {
        val qs = Seq(0.5, 0.99, 0.999)
        val li = Tables.lineitem(s, dir)
          .withColumn("x", (col("l_extendedprice") * (lit(1.0) + col("l_tax"))
            * (lit(1.0) - col("l_discount"))).cast("double"))
        val est = li.groupBy("l_returnflag")
          .agg(graft.functions.TDigestSketch(200, qs, col("x"), k1 = true)
            .as("est"))
        def ok(i: Int, q: Double, label: String) = {
          val e = col("est").getItem(i)
          val n = count(lit(1))
          val tolRows = greatest(
            lit(8 * math.Pi * math.sqrt(q * (1 - q)) / 200.0) * n, lit(4.0))
          ((count_if(col("x") < e) <= lit(q) * n + tolRows) &&
            (count_if(col("x") <= e) >= lit(q) * n - tolRows)).as(label)
        }
        li.join(broadcast(est), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            ok(0, 0.5, "q50_rank_ok"), ok(1, 0.99, "q99_rank_ok"),
            ok(2, 0.999, "q999_rank_ok"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
               TRUE AS q50_rank_ok, TRUE AS q99_rank_ok,
               TRUE AS q999_rank_ok
        FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""),
      benchFn = Some((s, dir) => {
        val qs = Seq(0.5, 0.99, 0.999)
        Tables.lineitem(s, dir)
          .withColumn("x", (col("l_extendedprice") * (lit(1.0) + col("l_tax"))
            * (lit(1.0) - col("l_discount"))).cast("double"))
          .groupBy("l_returnflag")
          .agg(graft.functions.TDigestSketch(200, qs, col("x"), k1 = true)
            .as("est"))
          .select(col("l_returnflag"),
            posexplode(col("est")).as(Seq("qi", "estimate")))
      })),

    // ------------------------------------------------------------------
    // sequenceNextNode: what does each user do right after their
    // FIRST signup, and how long after? One lead() window over the
    // full stream (computed before the signup filter, so the
    // successor can be any event type), then a rank-1 filter — no
    // per-user buffering.
    "ch_next_event" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        Tables.events(s, dir)
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("next_us", lead(col("ts_us"), 1).over(w))
          .filter(col("event_type") === "signup")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("next_type"),
            (col("next_us") - col("ts_us")).as("gap_us"))
          .orderBy("user_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, event_id, epoch_us(ts) AS t,
                 lead(event_type) OVER w AS next_type,
                 lead(epoch_us(ts)) OVER w AS next_us
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        f AS (SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY t, event_id) AS rn
              FROM e WHERE event_type = 'signup')
        SELECT user_id, next_type, next_us - t AS gap_us
        FROM f WHERE rn = 1 ORDER BY user_id"""),
    ),

    // ------------------------------------------------------------------
    // Equi-depth histogram via ntile: per priority class, quartile
    // buckets of order value with count/lo/hi — the adaptive twin of
    // ch_histogram's fixed-width buckets. Ties broken by orderkey so
    // the bucket boundaries are deterministic in both engines.
    // Computed WITHOUT the per-group ntile sort: each tile is a fixed
    // RANK INTERVAL [s, e] (ntile's uneven split is pure arithmetic
    // on n), its count is the interval width, and lo/hi are the
    // values AT ranks s and e — rank selection over the distributed
    // cumulative distribution (graft.plans.RankSelect; the window
    // form ran on 5 tasks and the r13 sf100 rung measured the
    // ceiling). The orderkey tiebreak never changes a selected VALUE,
    // only which row carries a boundary rank. Oracle unchanged:
    // DuckDB replays the ntile formulation, same (n, lo, hi) by the
    // interval identity.
    "ch_equidepth" -> Q(
      (s, dir) => {
        val cd = graft.plans.RankSelect.groupedCumDist(
          Tables.orders(s, dir)
            .select(col("o_orderpriority"), col("o_totalprice")),
          "o_orderpriority", "o_totalprice")
        // 4 tile bounds per group from the #groups-row n frame:
        // s=(t-1)*q+min(t-1,rem)+1, size=q+[t<=rem], e=s+size-1
        val bounds = cd.select(col("o_orderpriority"), col("n")).distinct()
          .select(col("o_orderpriority").as("bp"), explode(expr("""
            filter(transform(sequence(1, 4), t -> named_struct(
              'tile', CAST(t AS INT),
              's', (t - 1) * (n div 4) + least(t - 1, n % 4) + 1,
              'e', (t - 1) * (n div 4) + least(t - 1, n % 4)
                   + (n div 4) + IF(t <= n % 4, 1, 0),
              'sz', (n div 4) + IF(t <= n % 4, 1, 0))),
              b -> b.sz >= 1)""")).as("b"))
          .select(col("bp"), col("b.tile").as("tile"),
            col("b.s").as("s"), col("b.e").as("e"), col("b.sz").as("sz"))
        val hitS = col("s") > col("prev") && col("s") <= col("cum")
        val hitE = col("e") > col("prev") && col("e") <= col("cum")
        cd.join(broadcast(bounds),
            col("o_orderpriority") === col("bp") && (hitS || hitE))
          .groupBy("o_orderpriority", "tile")
          .agg(max(col("sz")).as("n"),
            max(when(hitS, col("o_totalprice"))).as("lo"),
            max(when(hitE, col("o_totalprice"))).as("hi"))
          .orderBy("o_orderpriority", "tile")
      },
      Some("""
        WITH t AS (SELECT o_orderpriority, o_totalprice,
                     CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS tile
                   FROM orders)
        SELECT o_orderpriority, tile, count(*) AS n,
               min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM t GROUP BY 1, 2 ORDER BY o_orderpriority, tile"""),
    ),

    // ------------------------------------------------------------------
    // Shuffle-hash join by hint: the fact-fact join where BOTH sides
    // outgrow broadcast and sort-merge's two full sorts are the
    // avoidable cost — SHUFFLE_HASH builds a hash map per partition
    // instead (right choice when one side's partitions fit in memory
    // and output needn't be key-sorted). Plan-asserted in
    // AdvancedSpec; same semantics as the unhinted join.
    "q_shuffle_hash_join" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir).hint("SHUFFLE_HASH"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(psumRev(col("l_extendedprice"), col("l_discount"))
            .as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy("o_orderstatus")
      },
      Some(s"""
        SELECT o_orderstatus,
               ${S.revenue("l_extendedprice", "l_discount")} AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    ),

    // ------------------------------------------------------------------
    // Exchange reuse: the monthly-revenue aggregate feeds both the
    // result rows and the max-revenue scalar — Spark computes the
    // shuffle ONCE and wires the second consumer to a ReusedExchange/
    // ReusedQueryStage (asserted in AdvancedSpec). The revenue is an
    // exact decimal, so the double equality against the max selects
    // identical rows in both engines.
    "q_reused_exchange" -> Q(
      (s, dir) => {
        val m = Tables.lineitem(s, dir)
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
          .agg(psumRev(col("l_extendedprice"), col("l_discount"))
            .as("revenue"))
        m.join(broadcast(m.agg(max(col("revenue")).as("max_rev"))),
            col("revenue") === col("max_rev"))
          .select("ship_month", "revenue")
          .orderBy("ship_month")
      },
      Some(s"""
        WITH m AS (
          SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                 ${S.revenue("l_extendedprice", "l_discount")} AS revenue
          FROM lineitem GROUP BY 1)
        SELECT ship_month, revenue FROM m
        WHERE revenue = (SELECT max(revenue) FROM m)
        ORDER BY ship_month"""),
    ),

    // ------------------------------------------------------------------
    // MERGE INTO semantics (matched-update / matched-delete /
    // not-matched-insert in one pass): the 1995 spend batch updates
    // customer balances, a delete predicate retires matched rows, and
    // synthetic new accounts insert — all from ONE left join + one
    // union, written and read back (copy-on-write snapshot, the
    // Delta/Iceberg MERGE shape without a table format). Spend is an
    // exact decimal, so the balance update is a single identical IEEE
    // add in both engines.
    "sink_merge" -> Q(
      (s, dir) => {
        val out = tmp(dir, "merge")
        val src = Tables.orders(s, dir)
          .filter(year(col("o_orderdate")) === 1995)
          .groupBy(col("o_custkey"))
          .agg(psumLong(2, cents(col("o_totalprice"))).as("spend"))
        val matchedOrKept = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_acctbal"))
          .join(src, col("c_custkey") === col("o_custkey"), "left")
          .filter(!(col("o_custkey").isNotNull &&
            pmod(col("c_custkey"), lit(89)) === 0)) // WHEN MATCHED ... DELETE
          .select(col("c_custkey"),
            when(col("o_custkey").isNotNull, col("c_acctbal") + col("spend"))
              .otherwise(col("c_acctbal")).as("new_bal"),
            when(col("o_custkey").isNotNull, lit("updated"))
              .otherwise(lit("kept")).as("status"))
        val inserts = src.filter(pmod(col("o_custkey"), lit(97)) === 0)
          .select((col("o_custkey") + 10000000L).as("c_custkey"),
            col("spend").as("new_bal"), lit("inserted").as("status"))
        matchedOrKept.unionByName(inserts)
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out).orderBy("c_custkey")
      },
      Some(s"""
        WITH src AS (
          SELECT o_custkey, ${S.psum(S.d("o_totalprice"))} AS spend
          FROM orders WHERE date_part('year', o_orderdate) = 1995
          GROUP BY o_custkey),
        m AS (
          SELECT c_custkey,
                 CASE WHEN o_custkey IS NOT NULL THEN c_acctbal + spend
                      ELSE c_acctbal END AS new_bal,
                 CASE WHEN o_custkey IS NOT NULL THEN 'updated'
                      ELSE 'kept' END AS status
          FROM customer LEFT JOIN src ON c_custkey = o_custkey
          WHERE NOT (o_custkey IS NOT NULL AND c_custkey % 89 = 0)),
        ins AS (
          SELECT o_custkey + 10000000 AS c_custkey, spend AS new_bal,
                 'inserted' AS status
          FROM src WHERE o_custkey % 97 = 0)
        SELECT * FROM m UNION ALL SELECT * FROM ins ORDER BY c_custkey"""),
    ),

    // ------------------------------------------------------------------
    // Manifest-pruned read (the Iceberg/Delta file-skipping layer,
    // built from first principles): a per-FILE min/max stats manifest
    // over the z-order layout — computed once by a distributed pass
    // and memoized, the way a table format writes manifests at commit
    // time — lets the planner enumerate only the files whose stat
    // ranges overlap the box predicate. The file list is
    // metadata-sized driver work by design (that IS the manifest
    // pattern); the data read then opens just those files, and the
    // residual filter keeps exactness. At 100 TB this is the layer
    // above row-group stats: skip whole FILES without opening a
    // footer.
    "src_manifest_prune" -> Q(
      (s, dir) => {
        val lay = zorderLayout(s, dir)
        val manifest = graft.DfCache.memo(
          s.read.parquet(lay)
            .select(input_file_name().as("file"),
              col("l_partkey"), col("l_suppkey"))
            .groupBy("file")
            .agg(min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"),
              min("l_suppkey").as("sk_min"), max("l_suppkey").as("sk_max"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
          s"zorder-manifest:$dir")
        val files = manifest
          .filter(col("pk_max") >= 100 && col("pk_min") <= 120 &&
            col("sk_max") >= 7 && col("sk_min") <= 9)
          .collect().map(_.getString(0))
        s.read.parquet(files.toIndexedSeq: _*)
          .filter(col("l_partkey").between(100, 120) &&
            col("l_suppkey").between(7, 9))
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy("l_partkey")
      },
      Some(s"""
        SELECT l_partkey, count(*) AS n_lines,
               ${S.dsum("l_extendedprice")} AS sum_price
        FROM lineitem
        WHERE l_partkey BETWEEN 100 AND 120 AND l_suppkey BETWEEN 7 AND 9
        GROUP BY l_partkey ORDER BY l_partkey"""),
    ),

    // ------------------------------------------------------------------
    // ORDER BY ... LIMIT ... OFFSET pagination, executed as Spark
    // plans it (a global sort + offset+limit fetch — the engine
    // fetches offset+limit rows from each partition, never
    // materializing the full sort on one node).
    "q_offset" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("pg_orders")
        s.sql("""
          SELECT o_orderkey, o_totalprice
          FROM pg_orders
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 10 OFFSET 20""")
      },
      Some("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 20"""),
    ),

    // ------------------------------------------------------------------
    // CDC diff between two table snapshots (the change-data-feed a
    // sink emits downstream): snapshot v2 is derived from v1 by
    // deterministic update/delete/insert sets, both are written, and
    // the feed is ONE full outer join on the key emitting
    // (op, old, new) rows — only changed keys survive the filter.
    // At scale both sides shuffle once on the key; unchanged rows
    // compare equal and drop before any downstream work.
    "sink_cdc" -> Q(
      (s, dir) => {
        val root = tmp(dir, "cdc")
        if (!new java.io.File(s"$root/v2/_SUCCESS").isFile) {
          val v1 = Tables.customer(s, dir)
            .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
          v1.write.mode("overwrite").parquet(s"$root/v1")
          val v2 = v1.filter(pmod(col("k"), lit(31)) =!= 0) // deletes
            .select(col("k"),
              when(pmod(col("k"), lit(7)) === 0, col("bal") + 100.0)
                .otherwise(col("bal")).as("bal")) // updates
            .unionByName(v1.filter(pmod(col("k"), lit(41)) === 0)
              .select((col("k") + 20000000L).as("k"), col("bal"))) // inserts
          v2.write.mode("overwrite").parquet(s"$root/v2")
        }
        val a = s.read.parquet(s"$root/v1").withColumnRenamed("bal", "old_bal")
        val b = s.read.parquet(s"$root/v2").withColumnRenamed("bal", "new_bal")
        a.join(b, Seq("k"), "full_outer")
          .select(col("k"),
            when(col("old_bal").isNull, lit("insert"))
              .when(col("new_bal").isNull, lit("delete"))
              .when(col("old_bal") =!= col("new_bal"), lit("update"))
              .as("op"),
            col("old_bal"), col("new_bal"))
          .filter(col("op").isNotNull)
          .orderBy("k")
      },
      Some("""
        WITH v1 AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
        v2 AS (
          SELECT k, CASE WHEN k % 7 = 0 THEN bal + 100.0 ELSE bal END AS bal
          FROM v1 WHERE k % 31 <> 0
          UNION ALL
          SELECT k + 20000000 AS k, bal FROM v1 WHERE k % 41 = 0)
        SELECT coalesce(v1.k, v2.k) AS k,
               CASE WHEN v1.k IS NULL THEN 'insert'
                    WHEN v2.k IS NULL THEN 'delete'
                    WHEN v1.bal <> v2.bal THEN 'update' END AS op,
               v1.bal AS old_bal, v2.bal AS new_bal
        FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        WHERE CASE WHEN v1.k IS NULL THEN 'insert'
                   WHEN v2.k IS NULL THEN 'delete'
                   WHEN v1.bal <> v2.bal THEN 'update' END IS NOT NULL
        ORDER BY k"""),
    ),

    // ------------------------------------------------------------------
    // Nested struct round-trip: documents reshaped into a nested
    // (meta, stats) struct schema, written as parquet (nested groups
    // on disk), read back, and projected by dot-path — with a filter
    // ON a nested field, which must still push down to the scan.
    // Output is flattened so the oracle compares flat cells.
    "src_struct_nested" -> Q(
      (s, dir) => {
        val out = tmp(dir, "nested")
        if (!new java.io.File(s"$out/_SUCCESS").isFile) {
          Tables.documents(s, dir)
            .select(col("doc_id"),
              struct(col("lang"), col("source")).as("meta"),
              struct(col("n_chars"),
                size(split(col("text"), "\\s+")).as("n_tokens")).as("stats"))
            .write.mode("overwrite").parquet(out)
        }
        s.read.parquet(out)
          .filter(col("meta.lang") === "en")
          .select(col("doc_id"), col("meta.lang").as("lang"),
            col("meta.source").as("source"),
            col("stats.n_chars").as("n_chars"),
            col("stats.n_tokens").as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, lang, source, n_chars,
               CAST(len(regexp_split_to_array(text, '\s+')) AS INTEGER)
                 AS n_tokens
        FROM documents WHERE lang = 'en' ORDER BY doc_id"""),
    ),

    // ------------------------------------------------------------------
    // mannWhitneyUTest(x, sample_index): the tie-corrected rank-sum
    // test (CH's implementation buffers both samples per group and
    // sorts in memory — O(rows) state; here the pooled tie-corrected
    // ranks come from a distinct-VALUE count table plus one global
    // prefix sum, O(distinct values) state, rows never buffered).
    // Integer-exactness device: with t = per-value tie-group size and
    // ct its inclusive prefix sum, 2x the average pooled rank of the
    // group is exactly 2*(ct - t) + t + 1 (an odd long), so
    // 2*R1 = sum(a * rank2) and 2*U1 = 2*R1 - 2*n1(n1+1)/2 are exact
    // integers — no fractional half-ranks ever materialize. The
    // normal-approximation z uses the tie-corrected variance
    // n1*n2/12 * ((n+1) - sum(t^3-t)/(n(n-1))) with the identical
    // IEEE tree in both engines; sums are 128-bit-exact in both
    // (Spark DECIMAL(38,0), DuckDB HUGEINT — no rescale-divide), and
    // an integer's round-to-nearest double cast is the same IEEE
    // operation in both engines at any magnitude.
    "ch_mann_whitney" -> Q(
      (s, dir) => {
        val counts = Tables.lineitem(s, dir)
          .filter(col("l_returnflag").isin("A", "N"))
          .groupBy(col("l_quantity").as("v"))
          .agg(count_if(col("l_returnflag") === "A").as("a"),
            count_if(col("l_returnflag") === "N").as("b"))
          .withColumn("t", col("a") + col("b"))
        val cum = graft.plans.PrefixSum.cumsumLong(
          counts, Seq("v"), Seq("t"), Seq("ct"))
        val m = cum.agg(
          sum(col("a")).as("n1"), sum(col("b")).as("n2"),
          sum(col("a").cast(DecimalType(38, 0)) *
            (lit(2) * (col("ct") - col("t")) + col("t") + lit(1)))
            .cast(DecimalType(38, 0)).as("r1_x2"),
          sum(col("t").cast(DecimalType(38, 0)) * col("t") * col("t")
            - col("t")).cast(DecimalType(38, 0)).as("ties"))
        val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
        val nd = (col("n1") + col("n2")).cast("double")
        val ud = col("u1_x2").cast("double")
        val tiesd = col("ties").cast("double")
        m.withColumn("u1_x2",
            (col("r1_x2") - col("n1").cast(DecimalType(38, 0)) *
              (col("n1") + lit(1))).cast("long"))
          .select(col("n1"), col("n2"), col("u1_x2"),
            ((ud - n1d * n2d) /
              (lit(2.0) * sqrt(n1d * n2d / lit(12.0) *
                ((nd + lit(1.0)) - tiesd / (nd * (nd - lit(1.0)))))))
              .as("z"))
      },
      Some("""
        WITH f AS (
          SELECT l_quantity AS v,
                 count(*) FILTER (WHERE l_returnflag = 'A') AS a,
                 count(*) FILTER (WHERE l_returnflag = 'N') AS b
          FROM lineitem WHERE l_returnflag IN ('A', 'N') GROUP BY 1),
        c AS (
          SELECT v, a, b, a + b AS t,
                 CAST(sum(a + b) OVER (ORDER BY v) AS BIGINT) AS ct
          FROM f),
        m AS (
          SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2,
                 sum(CAST(a AS HUGEINT) * (2 * (ct - t) + t + 1)) AS r1_x2,
                 sum(CAST(t AS HUGEINT) * t * t - t) AS ties
          FROM c),
        u AS (
          SELECT n1, n2, ties,
                 CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT)
                   AS u1_x2
          FROM m)
        SELECT n1, n2, u1_x2,
               (CAST(u1_x2 AS DOUBLE)
                  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
               / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                   * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                      - CAST(ties AS DOUBLE)
                        / (CAST(n1 + n2 AS DOUBLE)
                           * (CAST(n1 + n2 AS DOUBLE) - 1.0))))) AS z
        FROM u""")),

    // ------------------------------------------------------------------
    // rankCorr(x, y): Spearman rank correlation with average ranks for
    // ties (= Pearson on tie-averaged ranks), per group. The rank of a
    // row is a function of its VALUE only, so ranks live on the
    // per-(group, value) count tables — two value-domain-bounded dims
    // (50 quantities x 11 discounts here; bounded at any corpus size).
    // Each dim gets 2x-average-rank via a per-group running count
    // (2*ct - c + 1, exact odd longs), the fact joins both dims
    // BROADCAST (zero fact shuffle), and one hash aggregate collects
    // the five Pearson moments as exact DECIMAL(38,0) sums. rho is the
    // identical IEEE tree over those sums in both engines. The window
    // runs over the dim tables, never the fact.
    "ch_rank_corr" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("g"), col("l_quantity").as("x"),
            col("l_discount").as("y"))
        // r13 (guide §2.3, aggregate before you shuffle): every rank
        // and every moment is a function of the JOINT DISTRIBUTION of
        // (x, y) per group — quantity and discount are domain-bounded
        // (~50 x 11 values), so ONE scan compresses 600k rows into
        // ~1.6k (g, x, y, c) cells and all the former per-row work
        // (two rank joins + five DECIMAL(38) product sums per ROW —
        // a JavaBigDecimal add each) now runs over cells, weighted by
        // c. Integer sums are exact under the regrouping, so every
        // output bit is unchanged. The former plan scanned lineitem
        // three times (both rank dims + the moment pass); the cell
        // table is checkpointed once and feeds all three.
        val jd = graft.CkptSlot.swap("rank_corr_jd",
          li.groupBy("g", "x", "y").agg(count(lit(1)).as("c"))
            .localCheckpoint(true))
        def rankDim(vcol: String, rname: String) = {
          val w = Window.partitionBy("g").orderBy(vcol)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          jd.groupBy(col("g"), col(vcol))
            .agg(sum(col("c")).as("cd"))
            .withColumn("ct", sum(col("cd")).over(w))
            .select(col("g"), col(vcol),
              (lit(2) * col("ct") - col("cd") + lit(1)).as(rname))
        }
        val d38 = DecimalType(38, 0)
        val mom = jd
          .join(broadcast(rankDim("x", "rx")), Seq("g", "x"))
          .join(broadcast(rankDim("y", "ry")), Seq("g", "y"))
          .groupBy("g")
          .agg(sum(col("c")).as("n_rows"),
            sum(col("rx").cast(d38) * col("c")).as("sx"),
            sum(col("ry").cast(d38) * col("c")).as("sy"),
            sum(col("rx").cast(d38) * col("ry") * col("c")).as("sxy"),
            sum(col("rx").cast(d38) * col("rx") * col("c")).as("sxx"),
            sum(col("ry").cast(d38) * col("ry") * col("c")).as("syy"))
        val nd = col("n_rows").cast("double")
        def dd(c: String) = col(c).cast("double")
        mom.select(col("g"), col("n_rows"),
            ((nd * dd("sxy") - dd("sx") * dd("sy")) /
              (sqrt(nd * dd("sxx") - dd("sx") * dd("sx")) *
                sqrt(nd * dd("syy") - dd("sy") * dd("sy")))).as("rho"))
          .orderBy("g")
      },
      Some("""
        WITH li AS (
          SELECT l_returnflag AS g, l_quantity AS x, l_discount AS y
          FROM lineitem),
        rx AS (
          SELECT g, x,
                 2 * CAST(sum(count(*)) OVER
                       (PARTITION BY g ORDER BY x) AS BIGINT)
                   - count(*) + 1 AS rx
          FROM li GROUP BY g, x),
        ry AS (
          SELECT g, y,
                 2 * CAST(sum(count(*)) OVER
                       (PARTITION BY g ORDER BY y) AS BIGINT)
                   - count(*) + 1 AS ry
          FROM li GROUP BY g, y),
        mom AS (
          SELECT li.g, CAST(count(*) AS BIGINT) AS n_rows,
                 sum(CAST(rx AS HUGEINT)) AS sx,
                 sum(CAST(ry AS HUGEINT)) AS sy,
                 sum(CAST(rx AS HUGEINT) * ry) AS sxy,
                 sum(CAST(rx AS HUGEINT) * rx) AS sxx,
                 sum(CAST(ry AS HUGEINT) * ry) AS syy
          FROM li JOIN rx USING (g, x) JOIN ry USING (g, y)
          GROUP BY li.g)
        SELECT g, n_rows,
               (CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho
        FROM mom ORDER BY g""")),
  )
}
