package graft.operators

import graft.{Q, Tables}
import graft.Dec._
import graft.{Sql => S}
import graft.sources.Sink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental-maintenance surface: ClickHouse materialized-view
  * semantics (per-insert partial-state merge into an aggregate
  * target), mutation DELETE on an immutable layout, and the KMV
  * distinct sketch that makes incremental distinct-state mergeable.
  */
object Incremental {

  private def tmp(dir: String, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  val all: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Materialized view, maintained INCREMENTALLY (CH `CREATE
    // MATERIALIZED VIEW ... ENGINE=AggregatingMergeTree`): each
    // insert batch computes partial aggregate state over ONLY the new
    // rows and merges it into the stored target — the full history is
    // never rescanned. Here orders arrive as two batches; batch 2's
    // refresh reads batch 2 + the (priority-count-sum) target, not
    // batch 1. All the states are algebraic (count/sum/min/max merge
    // by sum/sum/min/max; avg derives at read), so refresh cost is
    // O(delta + groups) at any table size. The oracle aggregates the
    // FULL table — a pass proves merged increments == recompute.
    "mv_incremental" -> Q(
      (s, dir) => {
        val target = tmp(dir, "mvtarget")
        val o = Tables.orders(s, dir)
        def partials(batch: org.apache.spark.sql.DataFrame) =
          batch.groupBy("o_orderpriority")
            .agg(
              count(lit(1)).as("n"),
              sum(d(col("o_totalprice"))).as("sum_price"),
              min(col("o_orderdate")).as("first_order"),
              max(col("o_orderdate")).as("last_order"))
        // insert #1: seed the target with batch-1 state
        partials(o.filter(pmod(col("o_orderkey"), lit(2)) === 0))
          .write.mode("overwrite").parquet(target)
        // insert #2: merge batch-2 partials with the STORED state
        val merged = s.read.parquet(target)
          .unionByName(partials(o.filter(pmod(col("o_orderkey"), lit(2)) === 1)))
          .groupBy("o_orderpriority")
          .agg(
            sum(col("n")).as("n"),
            sum(col("sum_price")).as("sum_price"),
            min(col("first_order")).as("first_order"),
            max(col("last_order")).as("last_order"))
        merged.select(
            col("o_orderpriority"), col("n"),
            col("sum_price").cast("double").as("total_price"),
            (col("sum_price").cast("double") / col("n")).as("avg_price"),
            col("first_order"), col("last_order"))
          .orderBy("o_orderpriority")
      },
      Some(s"""
        SELECT o_orderpriority, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total_price,
               ${S.davg("o_totalprice")} AS avg_price,
               min(o_orderdate) AS first_order,
               max(o_orderdate) AS last_order
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    // Lightweight DELETE (CH `DELETE FROM t WHERE ...` mutation) on a
    // month-partitioned layout: the predicate names no partition, the
    // implementation DISCOVERS the affected months from the predicate
    // match and rewrites only those via dynamic partition overwrite —
    // untouched months keep their files (asserted byte-identical in
    // IncrementalSpec). Oracle = the surviving rows on the source.
    "sink_delete_mutation" -> Q(
      (s, dir) => {
        val out = tmp(dir, "delmut")
        // r13: seed through the range-partitioned writer — the plain
        // partitionBy write planned ONE scan task that wrote all ~80
        // month files serially (measured as a single 1.6 s job, the
        // whole query's dominant cost); ranging by (month, custkey)
        // writes the same layout in parallel.
        graft.sources.Sink.writePartitionedSorted(Tables.orders(s, dir), out,
          "o_month" -> date_format(col("o_orderdate"), "yyyy-MM"),
          Seq("o_custkey"))
        // delete: one bad load window (predicate on DATA, not partition)
        Sink.deleteWhere(s, out, "o_month",
          col("o_orderdate") >= lit("1997-06-10").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-20").cast("timestamp") &&
            col("o_orderstatus") === "F")
        s.read.parquet(out)
          .groupBy(col("o_month").cast("string").as("o_month"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_month")
      },
      Some(s"""
        SELECT strftime(o_orderdate, '%Y-%m') AS o_month, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total
        FROM orders
        WHERE NOT (o_orderdate >= TIMESTAMP '1997-06-10'
               AND o_orderdate <  TIMESTAMP '1997-07-20'
               AND o_orderstatus = 'F')
        GROUP BY 1 ORDER BY o_month""")),

    // ------------------------------------------------------------------
    // Predicate UPDATE mutation (CH `ALTER TABLE ... UPDATE`), the
    // copy-on-write twin of sink_delete_mutation: a mispriced July
    // window is repriced +5% in place; only partitions DISCOVERED to
    // contain matches are rewritten (Sink.updateWhere), others stay
    // byte-identical. Oracle applies the same CASE to the source, so
    // a pass proves both the update arithmetic and that untouched
    // rows survived the rewrite unchanged.
    "sink_update_mutation" -> Q(
      (s, dir) => {
        val out = tmp(dir, "updmut")
        // r13: parallel range-partitioned seed (see sink_delete_mutation)
        graft.sources.Sink.writePartitionedSorted(Tables.orders(s, dir), out,
          "o_month" -> date_format(col("o_orderdate"), "yyyy-MM"),
          Seq("o_custkey"))
        val pred = col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-08-01").cast("timestamp") &&
          col("o_orderstatus") === "O"
        Sink.updateWhere(s, out, "o_month", pred, Seq(
          "o_totalprice" ->
            (d(col("o_totalprice")) * lit(1.05).cast(DecimalType(3, 2)))
              .cast("double")))
        s.read.parquet(out)
          .groupBy(col("o_month").cast("string").as("o_month"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_month")
      },
      Some(s"""
        SELECT strftime(o_orderdate, '%Y-%m') AS o_month, count(*) AS n,
               CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1997-07-01'
                          AND o_orderdate <  TIMESTAMP '1997-08-01'
                          AND o_orderstatus = 'O'
                 THEN CAST(CAST(${S.d("o_totalprice")} * CAST(1.05 AS DECIMAL(3,2))
                   AS DOUBLE) AS DECIMAL(12,4))
                 ELSE ${S.d("o_totalprice")} END) AS DOUBLE) AS total
        FROM orders GROUP BY 1 ORDER BY o_month""")),

    // ------------------------------------------------------------------
    // Projection routing (CH `ALTER TABLE ... ADD PROJECTION`): a
    // registered pre-aggregation is substituted under the query BY
    // THE OPTIMIZER (plans/ProjectionRoute.scala) — the query below
    // is written against the BASE orders table, and the plan-audit
    // spec proves the executed plan scans only the projection. The
    // oracle aggregates the base table directly, so a pass proves the
    // routed answer is exactly the unrouted one.
    "mv_route" -> Q(
      (s, dir) => {
        val base = s"$dir/orders.parquet"
        val proj = tmp(dir, "mvproj")
        graft.plans.Projections.register(s, base, proj,
          Seq("o_orderpriority", "o_orderstatus"),
          Seq("o_totalprice" -> graft.Dec.D))
        s.read.parquet(base)
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            sum(d(col("o_totalprice"))).cast("double").as("total_price"),
            min(d(col("o_totalprice"))).cast("double").as("min_price"),
            max(d(col("o_totalprice"))).cast("double").as("max_price"))
          .orderBy("o_orderpriority")
      },
      Some(s"""
        SELECT o_orderpriority, count(*) AS n,
               ${S.dsum("o_totalprice")} AS total_price,
               CAST(min(${S.d("o_totalprice")}) AS DOUBLE) AS min_price,
               CAST(max(${S.d("o_totalprice")}) AS DOUBLE) AS max_price
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    // KMV distinct sketch per group: EXACT below k — k=4096 covers
    // the distinct-user universe at every shipped SF (1500 at sf0.1),
    // so the oracle is count(DISTINCT); the round-3 sf0.1 cross-check
    // caught k=256 silently switching groups into estimation mode.
    // Fixed 32 KiB mergeable state at any cardinality — the
    // incremental/streaming answer when distinct state must survive
    // merges without holding the key space (estimation error spec'd
    // at forced overflow in IncrementalSpec).
    "ch_uniq_kmv" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(graft.functions.Kmv(4096, xxhash64(col("user_id")))
            .as("uniq_users"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS uniq_users
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
