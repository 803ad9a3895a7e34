package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical aggregate surface (ClickHouse's corr/covarPop/
  * stddevPop/skewPop/kurtPop/entropy/uniqUpTo/groupArrayMovingSum
  * family).
  *
  * Exactness strategy: every moment (sum x, sum x^2, sum x*y, ...) is
  * an EXACT decimal sum — order-independent, so partial aggregation
  * and AQE re-partitioning cannot perturb it — and the final
  * floating-point formula is written with the identical IEEE
  * operation tree in the Spark plan and the DuckDB oracle, making the
  * resulting doubles bit-identical (the ch_linreg technique extended
  * to second/third/fourth moments). Big-magnitude product sums are
  * surfaced through DECIMAL(38,0): values are >> 1, integer rounding
  * is deterministic in both engines, and the unscaled value stays
  * under 2^53 so both engines' decimal->double casts are exact.
  */
object Stats {

  /** Memoized-persisted cumulative histogram of l_extendedprice in
    * integer cents per l_returnflag: (flag, c, cnt, cum) with cum the
    * running row count in c order. The shared substrate of every
    * EXACT rank statistic over the price column (ch_mad,
    * ch_quantiles): its state is bounded by the VALUE DOMAIN (~10.5M
    * distinct cents at any corpus size), never by row count — the
    * scalable replacement for percentile()'s per-group value buffer.
    */
  def priceCentHist(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy("c")
    graft.DfCache.memo(
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          (d(col("l_extendedprice")) * 100).cast("long").as("c"))
        .groupBy("l_returnflag", "c").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(w))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      s"price-cent-hist:$dir")
  }

  /** Exact decimal product sum, integer-rounded then cast to double
    * (both engines exact: unscaled < 2^53). For product moments whose
    * scale-6 unscaled sums would overflow 2^53 (see Dec.DOut notes).
    */
  private def isum(c: Column): Column =
    sum(c).cast(DecimalType(38, 0)).cast("double")

  /** DuckDB mirror of [[isum]]. CAST alone would TRUNCATE (DuckDB's
    * decimal rescale drops digits; Spark's rounds HALF_UP), so the
    * explicit round(x, 0) — half away from zero, same rule as
    * HALF_UP — runs first and the final rescale drops only zeros.
    */
  private def isumSql(e: String): String =
    s"CAST(CAST(round(sum($e), 0) AS DECIMAL(38,0)) AS DOUBLE)"

  /** l_quantity is integer-valued in this schema; DECIMAL(10,0) keeps
    * q^2 and (via a (12,0) re-cast) q^3/q^4 products inside 38 digits
    * in BOTH engines' multiplication-widening rules.
    */
  private val qd: Column = col("l_quantity").cast(DecimalType(10, 0))
  private val qdSql = "CAST(l_quantity AS DECIMAL(10,0))"

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // corr / covarPop / stddevPop over (quantity, extendedprice) per
    // return flag: one hash aggregation computes all five exact
    // moments (map-side partials intact), the correlation formula
    // runs on the tiny grouped result.
    "ch_stats" -> Q(
      (s, dir) => {
        // r13: all five moment sums on exact LONG units (see Dec.dsum
        // rationale) — the decimal originals' (20,0)+/(25,8)+ buffers
        // ran JavaBigDecimal per row. Values bit-identical: exact
        // integer sums, same closing casts.
        val pc = cents(col("l_extendedprice"))
        val qL = asLong(col("l_quantity"))
        val m = Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(qL).cast("double").as("sx"),
            dsum(col("l_extendedprice")).as("sy"),
            sum(qL * qL).cast("double").as("sxx"),
            isumLong(2, qL * pc).as("sxy"),
            isumLong(4, pc * pc).as("syy"))
        val n = col("n")
        val varX = (col("sxx") - col("sx") * col("sx") / n) / n
        val varY = (col("syy") - col("sy") * col("sy") / n) / n
        val cov = (col("sxy") - col("sx") * col("sy") / n) / n
        m.select(col("l_returnflag"), n,
            cov.as("covar_pop"),
            (cov / (sqrt(varX) * sqrt(varY))).as("corr"),
            sqrt(varX).as("stddev_qty"),
            sqrt(varY).as("stddev_price"))
          .orderBy("l_returnflag")
      },
      Some(s"""
        WITH m AS (
          SELECT l_returnflag, count(*) AS n,
                 CAST(sum($qdSql) AS DOUBLE) AS sx,
                 ${S.dsum("l_extendedprice")} AS sy,
                 CAST(sum($qdSql * $qdSql) AS DOUBLE) AS sxx,
                 ${isumSql(s"$qdSql * ${S.d("l_extendedprice")}")} AS sxy,
                 ${isumSql("CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))")} AS syy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               (sxy - sx * sy / n) / n AS covar_pop,
               ((sxy - sx * sy / n) / n)
                 / (sqrt((sxx - sx * sx / n) / n)
                    * sqrt((syy - sy * sy / n) / n)) AS corr,
               sqrt((sxx - sx * sx / n) / n) AS stddev_qty,
               sqrt((syy - sy * sy / n) / n) AS stddev_price
        FROM m ORDER BY l_returnflag"""),
    ),

    // ------------------------------------------------------------------
    // skewPop / kurtPop of quantity per return flag from exact
    // integer moment sums up to x^4. The re-cast of q^2 to
    // DECIMAL(12,0) keeps the q^4 product inside decimal width in
    // both engines; m2^1.5 is written m2*sqrt(m2) because sqrt and
    // multiply are IEEE-exact everywhere while pow() need not be.
    "ch_skew_kurt" -> Q(
      (s, dir) => {
        // r13: integer moment sums on longs (q^4 <= 6.25e6/row rides
        // the hi/lo split; see Dec.isumLong) — same values, no
        // per-row BigDecimal.
        val qL = asLong(col("l_quantity"))
        val m = Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(qL).cast("double").as("s1"),
            sum(qL * qL).cast("double").as("s2"),
            isumLong(0, qL * qL * qL).as("s3"),
            isumLong(0, qL * qL * qL * qL).as("s4"))
        val n = col("n")
        val mx = col("s1") / n
        val m2 = col("s2") / n - mx * mx
        val m3 = col("s3") / n - lit(3.0) * mx * (col("s2") / n) +
          lit(2.0) * mx * mx * mx
        val m4 = col("s4") / n - lit(4.0) * mx * (col("s3") / n) +
          lit(6.0) * mx * mx * (col("s2") / n) -
          lit(3.0) * mx * mx * mx * mx
        m.select(col("l_returnflag"), n,
            (m3 / (m2 * sqrt(m2))).as("skew_pop"),
            (m4 / (m2 * m2) - lit(3.0)).as("kurt_pop"))
          .orderBy("l_returnflag")
      },
      Some(s"""
        WITH m AS (
          SELECT l_returnflag, count(*) AS n,
                 CAST(sum($qdSql) AS DOUBLE) AS s1,
                 CAST(sum(CAST($qdSql * $qdSql AS DECIMAL(12,0))) AS DOUBLE) AS s2,
                 ${isumSql(s"CAST($qdSql * $qdSql AS DECIMAL(12,0)) * $qdSql")} AS s3,
                 ${isumSql(s"CAST($qdSql * $qdSql AS DECIMAL(12,0)) * CAST($qdSql * $qdSql AS DECIMAL(12,0))")} AS s4
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               (s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n)) * sqrt(s2 / n - (s1 / n) * (s1 / n)))
                 AS skew_pop,
               (s4 / n - 4.0 * (s1 / n) * (s3 / n) + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3.0
                 AS kurt_pop
        FROM m ORDER BY l_returnflag"""),
    ),

    // ------------------------------------------------------------------
    // Shannon entropy of each user's event-type distribution (CH
    // `entropy`): two hash aggregations — counts per (user, type),
    // then the -sum(p log2 p) fold per user. The log is the one
    // genuinely transcendental step in the engine, so the output is
    // rounded to 6 decimals on both sides (sub-ulp libm disagreement
    // and double-sum ordering both vanish at that precision).
    "ch_entropy" -> Q(
      (s, dir) => {
        val counts = Tables.events(s, dir)
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
          .withColumn("tot", sum(col("n")).over(Window.partitionBy("user_id")))
        val p = col("n").cast("double") / col("tot")
        counts
          .withColumn("term", p * log(p) / log(lit(2.0)))
          .groupBy("user_id")
          .agg(round(-sum(col("term")), 6).as("entropy"))
          .orderBy("user_id")
      },
      Some("""
        WITH c AS (
          SELECT user_id, event_type, count(*) AS n,
                 sum(count(*)) OVER (PARTITION BY user_id) AS tot
          FROM events GROUP BY user_id, event_type)
        SELECT user_id,
               round(-sum((CAST(n AS DOUBLE) / tot)
                 * ln(CAST(n AS DOUBLE) / tot) / ln(2.0)), 6) AS entropy
        FROM c GROUP BY user_id ORDER BY user_id"""),
    ),

    // ------------------------------------------------------------------
    // uniqUpTo(600): exact distinct parts per supplier up to the cap,
    // 601 beyond it — with aggregation state BOUNDED at 601 keys per
    // group (see graft.functions.UniqUpTo scaladoc for why that is
    // the 100 TB answer when count(DISTINCT) state is unbounded). At
    // sf0.1 suppliers span the cap from both sides, so both the exact
    // and the saturated branch are exercised.
    "ch_uniq_upto" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy("l_suppkey")
          .agg(graft.functions.UniqUpTo(col("l_partkey"), 600).as("uniq_parts"))
          .orderBy("l_suppkey")
      },
      Some("""
        SELECT l_suppkey,
               least(count(DISTINCT l_partkey), 601) AS uniq_parts
        FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey"""),
    ),

    // ------------------------------------------------------------------
    // groupArrayMovingSum(3): per customer, the time-ordered array of
    // 3-order moving spend. One window pass (exact decimal frame
    // sums) + one aggregation; the array is assembled from a struct
    // sort so the order is the window order, not arrival order.
    // Output shape: each element is %.6f-formatted BEFORE the collect
    // and the array is string-joined (as ch_grouparray does) so the
    // result column is a portable scalar in every harness. The
    // formatting is cross-engine exact: the doubles are bit-identical
    // by construction and no double's exact decimal expansion can tie
    // at the 7th digit (that would need a 5^7 denominator), so
    // HALF_UP (JVM) and half-even (C printf) agree.
    "ch_moving_sum" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
        Tables.orders(s, dir)
          .withColumn("mv", format_string("%.6f",
            sum(d(col("o_totalprice"))).over(w).cast(DOut).cast("double")))
          .groupBy("o_custkey")
          .agg(
            concat_ws(",", transform(
              array_sort(collect_list(
                struct(col("o_orderdate"), col("o_orderkey"), col("mv")))),
              x => x("mv"))).as("moving_sums"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_custkey")
      },
      Some(s"""
        WITH w AS (
          SELECT o_custkey, o_orderdate, o_orderkey,
                 printf('%.6f', CAST(CAST(sum(${S.d("o_totalprice")}) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS DECIMAL(38,6)) AS DOUBLE)) AS mv
          FROM orders)
        SELECT o_custkey,
               array_to_string(array_agg(mv ORDER BY o_orderdate, o_orderkey),
                 ',') AS moving_sums,
               count(*) AS n_orders
        FROM w GROUP BY o_custkey ORDER BY o_custkey"""),
    ),

    // ------------------------------------------------------------------
    // arrayDifference + arrayCumSum over each customer's time-ordered
    // spend (CH's groupArray-then-array-lambda idiom). Both arrays
    // are computed by WINDOW functions before the collect — exact
    // decimal lag-deltas and running sums — so no per-group array is
    // ever re-walked; the collect is pure assembly. First delta is 0,
    // matching CH arrayDifference. Elements are %.6f-formatted before
    // the collect and string-joined for portable scalar output (see
    // ch_moving_sum note on cross-engine formatting exactness).
    "ch_arraydiff" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        val p = d(col("o_totalprice"))
        Tables.orders(s, dir)
          .withColumn("delta", format_string("%.6f",
            (p - lag(p, 1, 0).over(w)).cast("double")))
          .withColumn("cum", format_string("%.6f",
            sum(p).over(w.rowsBetween(Window.unboundedPreceding, 0))
              .cast(DOut).cast("double")))
          .groupBy("o_custkey")
          .agg(
            concat_ws(",", transform(array_sort(collect_list(
                struct(col("o_orderdate"), col("o_orderkey"), col("delta")))),
              x => x("delta"))).as("deltas"),
            concat_ws(",", transform(array_sort(collect_list(
                struct(col("o_orderdate"), col("o_orderkey"), col("cum")))),
              x => x("cum"))).as("cumsum"))
          .orderBy("o_custkey")
      },
      Some(s"""
        WITH w AS (
          SELECT o_custkey, o_orderdate, o_orderkey,
                 printf('%.6f', CAST(${S.d("o_totalprice")}
                      - lag(${S.d("o_totalprice")}, 1, 0) OVER (
                        PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS DOUBLE)) AS delta,
                 printf('%.6f', CAST(CAST(sum(${S.d("o_totalprice")}) OVER (
                        PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DECIMAL(38,6)) AS DOUBLE)) AS cum
          FROM orders)
        SELECT o_custkey,
               array_to_string(array_agg(delta ORDER BY o_orderdate, o_orderkey),
                 ',') AS deltas,
               array_to_string(array_agg(cum ORDER BY o_orderdate, o_orderkey),
                 ',') AS cumsum
        FROM w GROUP BY o_custkey ORDER BY o_custkey"""),
    ),

    // ------------------------------------------------------------------
    // avgWeighted(x, w): exact decimal sum(x*w)/sum(w) — one hash
    // aggregation, the division a single IEEE op on identical
    // operands in both engines.
    "ch_avg_weighted" -> Q(
      (s, dir) => {
        val xc = cents(col("l_extendedprice"))
        val wL = asLong(col("l_quantity"))
        Tables.lineitem(s, dir)
          .groupBy("l_linestatus")
          .agg((isumLong(2, xc * wL) / sum(wL).cast("double")).as("avg_weighted"),
            sum(wL).cast("long").as("total_weight"))
          .orderBy("l_linestatus")
      },
      Some(s"""
        SELECT l_linestatus,
               ${isumSql(s"${S.d("l_extendedprice")} * $qdSql")}
                 / CAST(sum($qdSql) AS DOUBLE) AS avg_weighted,
               CAST(sum($qdSql) AS BIGINT) AS total_weight
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""),
    ),

    // ------------------------------------------------------------------
    // groupArraySorted(5): the 5 smallest order totals per customer
    // as a sorted array. The rank filter runs BEFORE the collect, so
    // per-group state is bounded at N rows everywhere — a group with
    // a million rows collects five (CH's bounded groupArraySorted
    // semantics, not collect-then-slice). Elements are formatted
    // AFTER the numeric struct sort (the price is the sort key, so it
    // must stay numeric through array_sort) and string-joined for
    // portable scalar output (see ch_moving_sum note).
    "ch_grouparray_sorted" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .groupBy("o_custkey")
          .agg(concat_ws(",", transform(array_sort(collect_list(
              struct(d(col("o_totalprice")).cast("double").as("p"),
                col("o_orderkey")))),
            x => format_string("%.6f", x("p")))).as("low5"))
          .orderBy("o_custkey")
      },
      Some(s"""
        WITH r AS (
          SELECT o_custkey, o_orderkey,
                 CAST(${S.d("o_totalprice")} AS DOUBLE) AS p,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn
          FROM orders)
        SELECT o_custkey,
               array_to_string(array_agg(printf('%.6f', p)
                 ORDER BY p, o_orderkey), ',') AS low5
        FROM r WHERE rn <= 5
        GROUP BY o_custkey ORDER BY o_custkey"""),
    ),

    // ------------------------------------------------------------------
    // Salted two-stage distinct aggregation: distinct users per event
    // type where one type dominates the corpus (the hot-key problem —
    // a plain count(DISTINCT) holds the hot key's ENTIRE user set in
    // one reducer's agg state). Stage 1 splits each key's distinct
    // state across 16 salt shards (disjoint by construction: the
    // salt is a function of the counted value), stage 2 sums the
    // shard counts — every reducer holds at most 1/16th of a key's
    // state, at the price of one extra (tiny) shuffle.
    "q_salted_agg" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("event_type"), pmod(col("user_id"), lit(16)).as("salt"))
          .agg(countDistinct(col("user_id")).as("part_uniq"))
          .groupBy("event_type")
          .agg(sum(col("part_uniq")).as("uniq_users"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS uniq_users
        FROM events GROUP BY event_type ORDER BY event_type"""),
    ),

    // ------------------------------------------------------------------
    // ORDER BY ... WITH FILL (+ LOCF interpolation): the hourly
    // signup series has real gaps; the calendar spine is generated
    // from the aggregated bounds (one row -> sequence explode, pure
    // metadata at any scale), left-joined back, and filled two ways —
    // zeros (CH WITH FILL) and carry-forward (INTERPOLATE/LOCF via
    // last_value IGNORE NULLS). The single global window is the
    // nature of one time series; multi-series fills partition this
    // window by the series key.
    "ch_with_fill" -> Q(
      (s, dir) => {
        val d = Tables.events(s, dir)
          .filter(col("event_type") === "signup")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"))
        val cal = d.agg(min("h").as("lo"), max("h").as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("h"))
        val w = Window.orderBy("h")
          .rowsBetween(Window.unboundedPreceding, 0)
        cal.join(d, Seq("h"), "left")
          .select(col("h").as("hour_start"),
            coalesce(col("n"), lit(0L)).as("n_zero_fill"),
            last(col("n"), ignoreNulls = true).over(w).as("n_locf"))
          .orderBy("hour_start")
      },
      Some("""
        WITH d AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n
                   FROM events WHERE event_type = 'signup' GROUP BY 1),
        b AS (SELECT min(h) AS lo, max(h) AS hi FROM d),
        cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
                FROM b)
        SELECT cal.h AS hour_start,
               coalesce(d.n, 0) AS n_zero_fill,
               last_value(d.n IGNORE NULLS) OVER (ORDER BY cal.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_locf
        FROM cal LEFT JOIN d ON cal.h = d.h
        ORDER BY hour_start"""),
    ),

    // ------------------------------------------------------------------
    // Unigram language-model scoring (the KenLM-style perplexity
    // proxy a quality-filtering pipeline uses): corpus word
    // frequencies in one agg, per-token -log2 p joined back by word,
    // per-doc mean bits-per-token. Rounded to 6 decimals: the log is
    // transcendental, everything else is exact integer arithmetic.
    //
    // The token<->vocab join is Zipf-skewed BY NATURE (the top word
    // is a constant fraction of all tokens, so a plain shuffle join
    // funnels it through one task — measured 11x super-linear at the
    // sf1 scaling point). Scale shape: HEAD/TAIL split. The top-1024
    // words by frequency (a bounded TakeOrdered + broadcast, however
    // large the vocabulary) join broadcast — they carry the Zipf
    // mass, no shuffle at all; the remaining tail words shuffle-join,
    // but every tail key's frequency is <= the head minimum, so the
    // tail shuffle is skew-free. A real vocabulary outgrows ONE
    // broadcast, but its head never does.
    "txt_unigram_logprob" -> Q(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(split(regexp_replace(trim(lower(col("text"))), " +", " "),
              " ")).as("w"))
        // corpus total as a broadcast 1-row cross join, NOT a global
        // window over the vocabulary (which would drag the whole vocab
        // through one task at scale)
        val vocab = toks.groupBy("w").agg(count(lit(1)).as("wn"))
          .crossJoin(broadcast(toks.agg(count(lit(1)).as("tot"))))
        val head = vocab.orderBy(col("wn").desc, col("w")).limit(1024)
        val bits = -log(col("wn").cast("double") / col("tot")) / log(lit(2.0))
        val headScored = toks.join(broadcast(head), Seq("w"))
        val tailScored = toks
          .join(broadcast(head.select("w")), Seq("w"), "left_anti")
          .join(vocab, Seq("w"))
        headScored.unionByName(tailScored)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(sum(bits) / count(lit(1)), 6).as("bits_per_token"))
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (SELECT doc_id,
               unnest(string_split(regexp_replace(trim(lower(text)),
                 ' +', ' ', 'g'), ' ')) AS w
             FROM documents),
        vocab AS (SELECT w, count(*) AS wn, sum(count(*)) OVER () AS tot
                  FROM toks GROUP BY w)
        SELECT doc_id, count(*) AS n_tokens,
               round(sum(-ln(CAST(wn AS DOUBLE) / tot) / ln(2.0))
                     / count(*), 6) AS bits_per_token
        FROM toks JOIN vocab USING (w)
        GROUP BY doc_id ORDER BY doc_id"""),
    ),

    // ------------------------------------------------------------------
    // LIMIT WITH TIES (top-10 order totals keeping ties): Spark has
    // no WITH TIES, and a global rank() over the raw table would move
    // every row to ONE task (the WindowExec single-partition
    // warning — a driver-killer at scale). The scale-safe plan: (1)
    // distributed top-k (orderBy+limit plans as TakeOrderedAndProject:
    // per-partition top-10, driver merge of 10-row heads) yields the
    // 10th price as a bounded driver scalar; (2) filter price >=
    // threshold keeps at most 9 + ties rows; (3) rank INSIDE the tiny
    // survivor set — survivors are a prefix of the global sort order,
    // so their local rank IS the global rank — via a broadcast
    // non-equi join against the <=10-distinct-price histogram
    // (rank = 1 + number of survivor rows with a higher price).
    // No unpartitioned window anywhere in the plan.
    "q_limit_ties" -> Q(
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val threshold = orders
          .select(col("o_totalprice"))
          .orderBy(col("o_totalprice").desc).limit(10)
          .agg(min(col("o_totalprice"))).head().get(0)
        val survivors = orders
          .filter(col("o_totalprice") >= lit(threshold))
          .select(col("o_orderkey"), col("o_totalprice"))
        val hist = survivors
          .groupBy(col("o_totalprice").as("p2"))
          .agg(count(lit(1)).as("n2"))
        survivors
          .join(broadcast(hist), col("o_totalprice") < col("p2"), "left")
          .groupBy("o_orderkey", "o_totalprice")
          .agg((coalesce(sum(col("n2")), lit(0)) + 1).cast("int").as("rnk"))
          .filter(col("rnk") <= 10)
          .orderBy(col("rnk"), col("o_orderkey"))
      },
      Some("""
        WITH r AS (SELECT o_orderkey, o_totalprice,
                     CAST(rank() OVER (ORDER BY o_totalprice DESC) AS INTEGER)
                       AS rnk
                   FROM orders)
        SELECT o_orderkey, o_totalprice, rnk FROM r
        WHERE rnk <= 10 ORDER BY rnk, o_orderkey"""),
    ),

    // ------------------------------------------------------------------
    // Cohort retention matrix: users grouped by first-seen week, the
    // distinct actives per (cohort, week offset) — the standard
    // product-analytics table behind CH's retention(). Three hash
    // aggregations, all keyed by (user) or (cohort, offset); the
    // weekly distinct pass shrinks the join input to one row per
    // (user, week) before the cohort join.
    "ch_cohort" -> Q(
      (s, dir) => {
        val wk = date_trunc("week", col("ts")).cast("date")
        val firstWeek = Tables.events(s, dir)
          .groupBy("user_id").agg(min(wk).as("cohort"))
        val activity = Tables.events(s, dir)
          .select(col("user_id"), wk.as("wk")).distinct()
        activity.join(firstWeek, "user_id")
          .withColumn("week_offset",
            (datediff(col("wk"), col("cohort")) / 7).cast("int"))
          .groupBy("cohort", "week_offset")
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy("cohort", "week_offset")
      },
      Some("""
        WITH f AS (SELECT user_id,
               min(CAST(date_trunc('week', ts) AS DATE)) AS cohort
             FROM events GROUP BY user_id),
        a AS (SELECT DISTINCT user_id,
                CAST(date_trunc('week', ts) AS DATE) AS wk
              FROM events)
        SELECT cohort,
               CAST(datediff('day', cohort, wk) // 7 AS INTEGER) AS week_offset,
               count(DISTINCT user_id) AS active_users
        FROM a JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort, week_offset"""),
    ),

    // ------------------------------------------------------------------
    // The NOT IN null trap, executed CORRECTLY: a NOT IN whose
    // subquery contains a NULL matches nothing (three-valued logic),
    // which Spark implements as a null-aware anti join — silently
    // "losing" every row is the SQL-correct answer, and the contrast
    // row shows the null-filtered variant returning real counts. The
    // kind of semantic edge a query engine must not paper over.
    "q_not_in_trap" -> Q(
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("nit_customer")
        Tables.orders(s, dir)
          .select(when(pmod(col("o_orderkey"), lit(1000)) === 0, lit(null))
            .otherwise(col("o_custkey")).as("ck"))
          .createOrReplaceTempView("nit_sub")
        s.sql("""
          SELECT 'with_nulls' AS variant, count(*) AS n
          FROM nit_customer WHERE c_custkey NOT IN (SELECT ck FROM nit_sub)
          UNION ALL
          SELECT 'null_filtered' AS variant, count(*) AS n
          FROM nit_customer
          WHERE c_custkey NOT IN (SELECT ck FROM nit_sub WHERE ck IS NOT NULL)
          ORDER BY variant""")
      },
      Some("""
        WITH sub AS (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                                 ELSE o_custkey END AS ck FROM orders)
        SELECT 'with_nulls' AS variant, count(*) AS n
        FROM customer WHERE c_custkey NOT IN (SELECT ck FROM sub)
        UNION ALL
        SELECT 'null_filtered' AS variant, count(*) AS n
        FROM customer
        WHERE c_custkey NOT IN (SELECT ck FROM sub WHERE ck IS NOT NULL)
        ORDER BY variant"""),
    ),

    // ------------------------------------------------------------------
    // maxIntersections (peak interval concurrency): every event opens
    // a 30-minute interval; the +1/-1 boundary sweep with a running
    // sum finds the peak overlap per type. End points sort before
    // simultaneous starts (ORDER BY t, d with d=-1 first), giving
    // half-open [t, t+30m) semantics deterministically. The sweep is
    // linear in events AND bucket-parallel (see the fn comment) — a
    // per-type global window would cap parallelism at 5 tasks.
    "ch_max_intersections" -> Q(
      (s, dir) => {
        val e = Tables.events(s, dir)
        val pts = e.select(col("event_type"), col("ts_us").as("t"),
            lit(1).as("d"))
          .unionAll(e.select(col("event_type"),
            (col("ts_us") + 1800000000L).as("t"), lit(-1).as("d")))
        // TWO-LEVEL PARALLEL SWEEP. A single window partitioned by
        // event_type caps parallelism at the TYPE cardinality (5):
        // one task sorts the whole type regardless of cluster size —
        // the low-cardinality-window trap (measured 12x on the
        // sf1->sf10 decade; at 100 TB it is 5 tasks, full stop).
        // Classic prefix-sum parallelization instead: time-bucket the
        // boundary points (ties share a bucket, so cross-bucket order
        // is total), sweep each (type, bucket) independently, then the
        // global running sum at any point = exclusive prefix of
        // earlier buckets' +-1 totals + the local running sum — so
        // peak = max over buckets of (prefix offset + local peak).
        // The bucket window runs (types x buckets)-wide; the prefix
        // window touches one tiny row per bucket. Bucket width derives
        // from the domain span so bucket count scales with the data.
        val st = e.agg(min(col("ts_us")), max(col("ts_us")),
          count(lit(1))).head()
        val spanUs = st.getLong(1) - st.getLong(0) + 1800000001L
        val targetBuckets = math.max(
          s.sparkContext.defaultParallelism * 8L, st.getLong(2) / 250000L)
        val w = math.max(1L, spanUs / targetBuckets)
        val wLoc = Window.partitionBy("event_type", "bucket")
          .orderBy("t", "d").rowsBetween(Window.unboundedPreceding, 0)
        val wPre = Window.partitionBy("event_type").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        pts.withColumn("bucket", expr(s"t div ${w}L"))
          .withColumn("run", sum(col("d")).over(wLoc))
          .groupBy("event_type", "bucket")
          .agg(max(col("run")).as("lpeak"), sum(col("d")).as("btot"))
          .withColumn("off", coalesce(sum(col("btot")).over(wPre), lit(0L)))
          .groupBy("event_type")
          .agg(max(col("off") + col("lpeak")).as("peak"))
          .orderBy("event_type")
      },
      Some("""
        WITH pts AS (
          SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
          UNION ALL
          SELECT event_type, epoch_us(ts) + 1800000000, -1 FROM events),
        r AS (SELECT event_type,
                sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
              FROM pts)
        SELECT event_type, CAST(max(conc) AS BIGINT) AS peak
        FROM r GROUP BY event_type ORDER BY event_type"""),
    ),

    // ------------------------------------------------------------------
    // Deterministic content-derived UUIDs (the UUIDv5 idea: a stable
    // id from a namespace + content hash, so re-ingestion assigns the
    // same id — unlike generateUUIDv4, which is useless for
    // idempotent pipelines). md5 of the namespaced key, formatted
    // 8-4-4-4-12; pure per-row expressions.
    "f_uuid" -> Q(
      (s, dir) => {
        val h = md5(concat(lit("graft:doc:"), col("doc_id").cast("string")))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            concat_ws("-",
              substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
              substring(h, 17, 4), substring(h, 21, 12)).as("doc_uuid"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' ||
               substr(h, 13, 4) || '-' || substr(h, 17, 4) || '-' ||
               substr(h, 21, 12) AS doc_uuid
        FROM (SELECT doc_id, md5('graft:doc:' || CAST(doc_id AS VARCHAR)) AS h
              FROM documents)
        ORDER BY doc_id"""),
    ),

    // ------------------------------------------------------------------
    // As-of with TOLERANCE (the point-in-time feature join): each
    // order is matched to the same customer's PREVIOUS order only if
    // it falls within 90 days — beyond the tolerance the feature is
    // NULL, never a stale value (the leakage rule feature stores
    // enforce). One keyed window pass; no array buffering, no range
    // join.
    "q_asof_tolerance" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, dir)
          .withColumn("prev_key", lag(col("o_orderkey"), 1).over(w))
          .withColumn("gap_days",
            datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
          .select(col("o_orderkey"), col("o_custkey"),
            when(col("gap_days") <= 90, col("prev_key")).as("prev_within_90d"),
            when(col("gap_days") <= 90, col("gap_days")).as("days_since_prev"))
          .orderBy("o_orderkey")
      },
      Some("""
        WITH l AS (
          SELECT o_orderkey, o_custkey,
                 lag(o_orderkey, 1) OVER w AS prev_key,
                 CAST(datediff('day', lag(o_orderdate, 1) OVER w, o_orderdate)
                      AS INTEGER) AS gap_days
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey))
        SELECT o_orderkey, o_custkey,
               CASE WHEN gap_days <= 90 THEN prev_key END AS prev_within_90d,
               CASE WHEN gap_days <= 90 THEN gap_days END AS days_since_prev
        FROM l ORDER BY o_orderkey"""),
    ),

    // ------------------------------------------------------------------
    // Relational division ("for all"): customers who have placed
    // orders in EVERY priority class — the classic ÷ operator,
    // executed as distinct-count-equals-universe (one distinct pass +
    // one agg + a broadcast scalar), not as the nested NOT EXISTS
    // pair it is usually written as.
    "q_rel_division" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val universe = o.agg(countDistinct(col("o_orderpriority")).as("u"))
        o.select("o_custkey", "o_orderpriority").distinct()
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_classes"))
          .crossJoin(broadcast(universe))
          .filter(col("n_classes") === col("u"))
          .select("o_custkey", "n_classes")
          .orderBy("o_custkey")
      },
      Some("""
        WITH u AS (SELECT count(DISTINCT o_orderpriority) AS u FROM orders),
        d AS (SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_classes
              FROM orders GROUP BY o_custkey)
        SELECT o_custkey, n_classes FROM d, u
        WHERE n_classes = u.u ORDER BY o_custkey"""),
    ),

    // ------------------------------------------------------------------
    // Deterministic train/val/test split: assignment is a pure
    // function of the document id (multiplicative hash mod 100 ->
    // 80/10/10), so re-running the pipeline — or running it on a
    // different cluster layout — assigns every document to the same
    // split; per (source, split) doc and token counts summarize the
    // partition. No shuffle beyond the final summary agg.
    "txt_train_split" -> Q(
      (s, dir) => {
        val bucket = pmod(col("doc_id") * 2654435761L, lit(100L))
        Tables.documents(s, dir)
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test"))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " "))).as("n_tokens"))
          .orderBy("source", "split")
      },
      Some("""
        SELECT source,
               CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                    WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1, 2 ORDER BY source, split"""),
    ),

    // ------------------------------------------------------------------
    // Transcendental math batch (exp/ln/log10/sin/cos/atan2): libm
    // implementations agree to ~1 ulp but are not guaranteed
    // identical, so outputs round to 6 decimals on both sides (the
    // f_geo precedent); inputs are scaled into tame domains so no
    // value sits near a rounding boundary.
    "f_math2" -> Q(
      (s, dir) => {
        val x = col("l_discount") + lit(0.5) // 0.5 .. 0.6
        val y = col("l_tax") + lit(0.25)
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(exp(x), 6).as("exp_x"),
            round(log(x), 6).as("ln_x"),
            round(log10(col("l_extendedprice")), 6).as("log10_price"),
            round(sin(x), 6).as("sin_x"),
            round(cos(x), 6).as("cos_x"),
            round(atan2(y, x), 6).as("atan2_yx"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               round(exp(l_discount + 0.5), 6) AS exp_x,
               round(ln(l_discount + 0.5), 6) AS ln_x,
               round(log10(l_extendedprice), 6) AS log10_price,
               round(sin(l_discount + 0.5), 6) AS sin_x,
               round(cos(l_discount + 0.5), 6) AS cos_x,
               round(atan2(l_tax + 0.25, l_discount + 0.5), 6) AS atan2_yx
        FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
    ),

    // ------------------------------------------------------------------
    // groupConcat / arrayStringConcat: ordered, delimited string
    // assembly per key (CH's groupConcat with ORDER BY determinism).
    "ch_group_concat" -> Q(
      (s, dir) => {
        Tables.nation(s, dir)
          .groupBy("n_regionkey")
          .agg(concat_ws(",", array_sort(collect_list(col("n_name"))))
            .as("nations"),
            count(lit(1)).as("n"))
          .orderBy("n_regionkey")
      },
      Some("""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(*) AS n
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),
    ),

    // ------------------------------------------------------------------
    // Median absolute deviation (the robust dispersion statistic):
    // per-group median via one exact percentile pass, then the median
    // of absolute deviations in a second — both interpolated
    // identically in the two engines, and |x - m| is a single exact
    // IEEE subtraction.
    // ------------------------------------------------------------------
    // Two-sample Kolmogorov-Smirnov statistic (CH
    // kolmogorovSmirnovTest's D): D = max_v |F1(v) - F2(v)| computed
    // EXACTLY — per distinct value one row of (cnt_a, cnt_b), a
    // RANGE-PARTITIONED two-pass prefix sum (graft.plans.PrefixSum:
    // per-range totals -> broadcast offsets -> local cumsum; no
    // single-partition window, so hundreds of millions of distinct
    // values never funnel through one task), and the sup norm as the
    // INTEGER max |ca*n2 - cb*n1| with a single closing division, so
    // the double is bit-identical cross-engine by construction.
    "ch_ks_test" -> Q(
      (s, dir) => {
        val counts = Tables.lineitem(s, dir)
          .filter(col("l_returnflag").isin("A", "N"))
          .groupBy(col("l_extendedprice").as("v"))
          .agg(count_if(col("l_returnflag") === "A").as("a"),
            count_if(col("l_returnflag") === "N").as("b"))
        val cum = graft.plans.PrefixSum.cumsumLong(
          counts, Seq("v"), Seq("a", "b"), Seq("ca", "cb"))
        // totals first (one tiny job), then the exact sup norm — the
        // driver-side scalars are two longs, not data
        val t = cum.agg(max(col("ca")).as("n1"), max(col("cb")).as("n2"))
          .head()
        val (n1, n2) = (t.getLong(0), t.getLong(1))
        cum.agg(
            max(abs(col("ca") * lit(n2) - col("cb") * lit(n1))).as("d_num"))
          .select(lit(n1).as("n1"), lit(n2).as("n2"), col("d_num"),
            (col("d_num").cast("double") /
              lit((n1 * n2).toDouble)).as("d"))
      },
      Some("""
        WITH f AS (
          SELECT l_extendedprice AS v,
                 count(*) FILTER (WHERE l_returnflag = 'A') AS a,
                 count(*) FILTER (WHERE l_returnflag = 'N') AS b
          FROM lineitem WHERE l_returnflag IN ('A', 'N') GROUP BY 1),
        c AS (
          SELECT v,
                 CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
                 CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb
          FROM f),
        t AS (SELECT max(ca) AS n1, max(cb) AS n2 FROM c)
        SELECT t.n1, t.n2,
               CAST(max(abs(ca * t.n2 - cb * t.n1)) AS BIGINT) AS d_num,
               CAST(max(abs(ca * t.n2 - cb * t.n1)) AS DOUBLE)
                 / CAST(t.n1 * t.n2 AS DOUBLE) AS d
        FROM c, t GROUP BY t.n1, t.n2""")),

    // ------------------------------------------------------------------
    // Pearson chi-square independence test + Cramer's V over the
    // (orderstatus x orderpriority) contingency table. All counts are
    // exact longs; every per-cell double term uses the IDENTICAL IEEE
    // tree in both engines ((rt*ct)/n, dev*dev/exp — products stay
    // under 2^53 so the double casts are exact); and the closing sum
    // runs as a SHARED FOLD over the cells in (status, priority)
    // order — Spark aggregate() and DuckDB list_reduce add the same
    // 15 doubles in the same order, so the statistic is bit-identical
    // with no decimal-rounding crutch (the ch_sequencecount device
    // applied to floating-point reduction).
    "ch_chi_square" -> Q(
      (s, dir) => {
        val wAll = Window.partitionBy(lit(1))
        val cells = Tables.orders(s, dir)
          .groupBy(col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"))
          .agg(count(lit(1)).as("obs"))
          .withColumn("rt", sum(col("obs")).over(Window.partitionBy("st")))
          .withColumn("ct", sum(col("obs")).over(Window.partitionBy("pr")))
          .withColumn("n", sum(col("obs")).over(wAll))
          .withColumn("nr", size(collect_set(col("st")).over(wAll)))
          .withColumn("nc", size(collect_set(col("pr")).over(wAll)))
        val expv = (col("rt").cast("double") * col("ct").cast("double")) /
          col("n").cast("double")
        val dev = col("obs").cast("double") - expv
        val chi = aggregate(
          expr("transform(cells, c -> c.term)"), lit(0.0), (acc, x) => acc + x)
        cells
          .withColumn("term", dev * dev / expv)
          .groupBy("n", "nr", "nc")
          .agg(sort_array(collect_list(struct(col("st"), col("pr"),
            col("term")))).as("cells"))
          .select(col("n"),
            chi.as("chi2"),
            ((col("nr") - 1) * (col("nc") - 1)).cast("long").as("dof"),
            sqrt(chi / (col("n").cast("double") *
              least(col("nr") - 1, col("nc") - 1).cast("double")))
              .as("cramers_v"))
      },
      Some("""
        WITH c AS (
          SELECT o_orderstatus AS st, o_orderpriority AS pr,
                 count(*) AS obs
          FROM orders GROUP BY 1, 2),
        t AS (
          SELECT st, pr, obs,
                 CAST(sum(obs) OVER (PARTITION BY st) AS BIGINT) AS rt,
                 CAST(sum(obs) OVER (PARTITION BY pr) AS BIGINT) AS ct,
                 CAST(sum(obs) OVER () AS BIGINT) AS n
          FROM c),
        term AS (
          SELECT st, pr, n,
                 (CAST(obs AS DOUBLE)
                    - (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                      / CAST(n AS DOUBLE))
                 * (CAST(obs AS DOUBLE)
                    - (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                      / CAST(n AS DOUBLE))
                 / ((CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                    / CAST(n AS DOUBLE)) AS term
          FROM t),
        agg AS (
          SELECT max(n) AS n,
                 list_reduce(list_prepend(0.0,
                   list(term ORDER BY st, pr)), (a, x) -> a + x) AS chi2,
                 count(DISTINCT st) AS nr, count(DISTINCT pr) AS nc
          FROM term)
        SELECT n, chi2,
               CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
               sqrt(chi2 / (CAST(n AS DOUBLE)
                 * CAST(least(nr - 1, nc - 1) AS DOUBLE))) AS cramers_v
        FROM agg""")),

    // medianAbsoluteDeviation — EXACT, with bounded state: Spark's
    // percentile() buffers every group value in one task (a 20B-row
    // group cannot), so both medians run as SELECTION OVER THE
    // CUMULATIVE HISTOGRAM of the integer cent domain instead: one
    // hash agg to (flag, cents, cnt) — state bounded by the VALUE
    // DOMAIN (~10.5M distinct cents at any corpus size), not by rows
    // — a running-count window over it, and a 2-row-per-group rank
    // probe. Deviations reuse the same aggregated table (equal cents
    // => equal deviation), so the corpus is scanned ONCE. Everything
    // stays integer until one closing division (median = (lo+hi)
    // cents / 200, mad = (ulo+uhi) half-cents / 400): both engines
    // divide identical BIGINTs, so the doubles are bit-identical with
    // no float-ordering hazard anywhere (the quantile_cont
    // formulation this replaces compared IEEE-rounded |x - med|
    // doubles, whose near-tie ORDER can differ from the exact
    // decimal order).
    "ch_mad" -> Q(
      (s, dir) => {
        // (flag, cents) histogram: the one corpus-sized aggregation
        // (memoized-persisted: med, dev and n all read it; shared
        // with ch_quantiles)
        val hist = priceCentHist(s, dir)
        val n = hist.groupBy("l_returnflag").agg(sum(col("cnt")).as("n"))
        // 0-based middle ranks: lo = (n-1) div 2, hi = n div 2; the
        // element at rank r is the least c whose running count
        // exceeds r
        def pick(h: org.apache.spark.sql.DataFrame,
            nDf: org.apache.spark.sql.DataFrame,
            vc: String): org.apache.spark.sql.DataFrame =
          h.join(broadcast(nDf), "l_returnflag")
            .withColumn("lo_r", expr("(n - 1) div 2"))
            .withColumn("hi_r", expr("n div 2"))
            .groupBy("l_returnflag")
            .agg(min(when(col("cum") > col("lo_r"), col(vc))).as("lo"),
              min(when(col("cum") > col("hi_r"), col(vc))).as("hi"))
            .withColumn("m2", col("lo") + col("hi"))
        val med = pick(hist, n, "c").select(col("l_returnflag"),
          col("m2"))
        // deviations on the HISTOGRAM, not the corpus: u in half-cents
        val dev = hist.join(broadcast(med), "l_returnflag")
          .select(col("l_returnflag"),
            abs(lit(2) * col("c") - col("m2")).as("u"), col("cnt"))
          .groupBy("l_returnflag", "u").agg(sum(col("cnt")).as("cnt"))
          .withColumn("cum",
            sum(col("cnt")).over(Window.partitionBy("l_returnflag").orderBy("u")))
        val mad = pick(dev, n, "u")
          .select(col("l_returnflag"), col("m2").as("u2"))
        med.join(mad, "l_returnflag")
          .select(col("l_returnflag"),
            (col("m2").cast("double") / 200.0).as("median_price"),
            (col("u2").cast("double") / 400.0).as("mad_price"))
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
        med AS (
          SELECT h.l_returnflag,
                 min(CASE WHEN h.cum > (nn.n - 1) // 2 THEN h.c END)
                 + min(CASE WHEN h.cum > nn.n // 2 THEN h.c END) AS m2
          FROM cumh h JOIN nn USING (l_returnflag)
          GROUP BY h.l_returnflag),
        dev AS (
          SELECT h.l_returnflag, abs(2 * h.c - m.m2) AS u,
                 CAST(sum(h.cnt) AS BIGINT) AS cnt
          FROM hist h JOIN med m USING (l_returnflag)
          GROUP BY 1, 2),
        cumd AS (
          SELECT l_returnflag, u, cnt,
                 sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY u) AS cum
          FROM dev),
        mad AS (
          SELECT d.l_returnflag,
                 min(CASE WHEN d.cum > (nn.n - 1) // 2 THEN d.u END)
                 + min(CASE WHEN d.cum > nn.n // 2 THEN d.u END) AS u2
          FROM cumd d JOIN nn USING (l_returnflag)
          GROUP BY d.l_returnflag)
        SELECT m.l_returnflag,
               CAST(m.m2 AS DOUBLE) / 200.0 AS median_price,
               CAST(mad.u2 AS DOUBLE) / 400.0 AS mad_price
        FROM med m JOIN mad USING (l_returnflag)
        ORDER BY m.l_returnflag"""),
    ),

    // ------------------------------------------------------------------
    // Slowly-changing dimension type 2: collapse each customer's
    // order-status history into [valid_from, valid_to) intervals —
    // one row per status CHANGE, closed by the next change's date
    // (NULL = current). Two window passes over (customer, time), no
    // self-join: the change filter runs before the lead() so interval
    // rows never rescan the full history.
    "q_scd2" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        val changes = Tables.orders(s, dir)
          .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
          .filter(col("prev_status").isNull ||
            col("o_orderstatus") =!= col("prev_status"))
        val w2 = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        changes
          .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w2))
          .select(col("o_custkey"), col("o_orderstatus"),
            col("o_orderdate").as("valid_from"), col("valid_to"))
          .orderBy("o_custkey", "valid_from", "o_orderstatus")
      },
      Some("""
        WITH h AS (SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
                     lag(o_orderstatus) OVER w AS prev_status
                   FROM orders
                   WINDOW w AS (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey)),
        c AS (SELECT * FROM h
              WHERE prev_status IS NULL OR o_orderstatus <> prev_status)
        SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS valid_to
        FROM c ORDER BY o_custkey, valid_from, o_orderstatus"""),
    ),

    // ------------------------------------------------------------------
    // regexp_extract_all / match counting (CH's extractAll family).
    "f_regex2" -> Q(
      (s, dir) => {
        Tables.part(s, dir)
          .select(col("p_partkey"),
            concat_ws("|", regexp_extract_all(col("p_name"), lit("\\w+"), lit(0)))
              .as("all_words"),
            size(regexp_extract_all(col("p_name"), lit("\\w+"), lit(0)))
              .as("n_words"),
            regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               array_to_string(regexp_extract_all(p_name, '\w+'), '|')
                 AS all_words,
               CAST(len(regexp_extract_all(p_name, '\w+')) AS INTEGER)
                 AS n_words,
               regexp_extract(p_brand, '(\d+)', 1) AS brand_num
        FROM part ORDER BY p_partkey"""),
    ),

    // ------------------------------------------------------------------
    // arrayIntersect / arrayUnion over per-key sets: each supplier's
    // distinct parts shipped before vs since 1995, overlap and union
    // sizes via array set ops on collected distinct sets (bounded by
    // the supplier's true part count; the relational oracle computes
    // the same sizes from per-(supplier, part) period flags).
    "ch_array_setops" -> Q(
      (s, dir) => {
        val cut = lit("1995-01-01").cast("timestamp")
        Tables.lineitem(s, dir)
          .groupBy("l_suppkey")
          .agg(
            array_sort(array_distinct(collect_list(
              when(col("l_shipdate") < cut, col("l_partkey"))))).as("early"),
            array_sort(array_distinct(collect_list(
              when(col("l_shipdate") >= cut, col("l_partkey"))))).as("late"))
          .select(col("l_suppkey"),
            size(col("early")).as("n_early"),
            size(col("late")).as("n_late"),
            size(array_intersect(col("early"), col("late"))).as("n_both"),
            size(array_union(col("early"), col("late"))).as("n_either"))
          .orderBy("l_suppkey")
      },
      Some("""
        WITH p AS (SELECT l_suppkey, l_partkey,
                     max(CASE WHEN l_shipdate < TIMESTAMP '1995-01-01'
                              THEN 1 ELSE 0 END) AS e,
                     max(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01'
                              THEN 1 ELSE 0 END) AS l
                   FROM lineitem GROUP BY 1, 2)
        SELECT l_suppkey,
               CAST(sum(e) AS INTEGER) AS n_early,
               CAST(sum(l) AS INTEGER) AS n_late,
               CAST(sum(e * l) AS INTEGER) AS n_both,
               CAST(count(*) AS INTEGER) AS n_either
        FROM p GROUP BY l_suppkey ORDER BY l_suppkey"""),
    ),
  )
}
