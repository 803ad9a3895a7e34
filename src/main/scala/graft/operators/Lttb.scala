package graft.operators

import graft.Dec
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 —
  * ClickHouse ships it as the largestTriangleThreeBuckets aggregate):
  * reduce each (event_type) time series to nOut visually-
  * representative points. First and last points are always kept; the
  * interior is split into nOut-2 equal index buckets and each bucket
  * contributes the point forming the largest triangle with the
  * PREVIOUSLY selected point and the NEXT bucket's average point —
  * a left-to-right sequential selection. A series with n <= nOut
  * points is returned unchanged (CH's rule — nothing to sample).
  *
  * Exactness (what makes a geometry fold DuckDB-replayable): all
  * coordinates are integers — x is group-relative microseconds
  * (shifting by the group min keeps every product far from overflow),
  * y is exact cents via the Dec decimal device — and the triangle
  * comparison multiplies the anchor's average through by the bucket
  * count c, so 2*area*c = |(px*c - Sx)*(yp - py) - (px - xp)*(Sy -
  * py*c)| is EXACT integer arithmetic (BigInt here, HUGEINT in the
  * oracle). Ties break on the smaller index. No float enters any
  * comparison.
  *
  * Scale shape: one shuffle (the per-series sort via
  * flatMapSortedGroups — spillable, never an in-heap series sort);
  * per-series driver state is the (nOut-2)-row bucket-sum table (the
  * IVF-centroid metadata class); the fold streams each series with
  * O(1) state for buckets whose anchor is known ahead (all but the
  * last) and buffers only the FINAL bucket (~n/(nOut-2) points),
  * whose anchor is the series' last point. LTTB is a visualization
  * sampler: series are bounded per rendering contract, and nOut is
  * the knob.
  */
object Lttb {

  case class P(event_type: String, ts_us: Long, event_id: Long,
      x: Long, y: Long, value: Double)
  case class Out(event_type: String, seq: Int, ts_us: Long, value: Double)

  /** Per-group per-bucket (c, Sx, Sy) with BigInt sums. */
  private type Sums = Map[(String, Long), (Long, BigInt, BigInt)]

  private def area2c(pxc: BigInt, sx: BigInt, py: BigInt, sy: BigInt,
      px: BigInt, c: BigInt, xp: Long, yp: Long): BigInt =
    ((pxc - sx) * (BigInt(yp) - py) - (px - BigInt(xp)) * (sy - py * c)).abs

  private def fold(g: String, rows: Iterator[P], n: Long,
      sums: Sums, nOut: Int): Iterator[Out] = {
    val nb = nOut - 2
    // ClickHouse's largestTriangleThreeBuckets returns a series with
    // n <= nOut points unchanged — nothing to sample. Pass it through
    // verbatim (seq = index); the bucket-sum table excludes these
    // series, so no sums lookup can occur below.
    if (n <= nOut)
      return rows.zipWithIndex.map { case (p, idx) =>
        Out(g, idx, p.ts_us, p.value)
      }
    val out = Seq.newBuilder[Out]
    var i = 0L
    var prevX = 0L; var prevY = 0L
    // running best of the current bucket (anchor known in advance)
    var curB = -1L
    var bestA = BigInt(-1); var bestP: P = null
    // the last bucket's anchor is the final point: buffer it instead
    val lastBucket = scala.collection.mutable.ArrayBuffer.empty[P]
    def finalize(b: Long, anchor: (Long, BigInt, BigInt),
        cands: Iterator[P]): Unit = {
      val (c, sx, sy) = anchor
      var bA = BigInt(-1); var bP: P = null
      val px = BigInt(prevX); val py = BigInt(prevY)
      val pxc = px * c
      for (p <- cands) {
        val a = area2c(pxc, sx, py, sy, px, BigInt(c), p.x, p.y)
        if (a > bA) { bA = a; bP = p } // iteration is index-ascending:
        // a strict > keeps the SMALLEST index on ties
      }
      out += Out(g, (b + 1).toInt, bP.ts_us, bP.value)
      prevX = bP.x; prevY = bP.y
    }
    for (p <- rows) {
      if (i == 0L) {
        out += Out(g, 0, p.ts_us, p.value)
        prevX = p.x; prevY = p.y
      } else if (i == n - 1) {
        // close the final bucket against the last point, then emit it
        finalize(nb - 1L, (1L, BigInt(p.x), BigInt(p.y)),
          lastBucket.iterator)
        out += Out(g, nOut - 1, p.ts_us, p.value)
      } else {
        val b = ((i - 1) * nb) / (n - 2)
        if (b == nb - 1L) {
          // entering the buffered final bucket: close the tracked one
          // first, so its selection is the final bucket's prev point
          if (curB >= 0L) {
            out += Out(g, (curB + 1).toInt, bestP.ts_us, bestP.value)
            prevX = bestP.x; prevY = bestP.y
            curB = -1L; bestA = BigInt(-1); bestP = null
          }
          lastBucket += p
        } else {
          if (b != curB) {
            // bucket advanced: finalize the finished one (its best is
            // tracked incrementally — anchor was known up front)
            if (curB >= 0L) {
              out += Out(g, (curB + 1).toInt, bestP.ts_us, bestP.value)
              prevX = bestP.x; prevY = bestP.y
            }
            curB = b; bestA = BigInt(-1); bestP = null
          }
          val (c, sx, sy) = sums((g, b + 1))
          val a = area2c(BigInt(prevX) * c, sx, BigInt(prevY), sy,
            BigInt(prevX), BigInt(c), p.x, p.y)
          if (a > bestA) { bestA = a; bestP = p }
        }
      }
      i += 1
    }
    // buckets nb-2 and nb-1 both close inside the loop (nb-2 when its
    // successor's first point arrives, nb-1 at the final point); a
    // non-final tracked bucket can only be open here if the iterator
    // ended early, which the i==n-1 branch makes impossible
    out.result().iterator
  }

  /** Downsample each event_type's (ts, value) series to nOut points. */
  def downsample(events: DataFrame, nOut: Int = 20): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val nb = nOut - 2
    val base = events.select(col("event_type"), col("ts_us"), col("event_id"),
      col("value"), (col("value").cast(Dec.D) * 100).cast("long").as("y"))
    val gstats = base.groupBy("event_type")
      .agg(min(col("ts_us")).as("minx"), count(lit(1)).as("n"))
    val pts = base.join(broadcast(gstats), Seq("event_type"))
      .withColumn("x", col("ts_us") - col("minx"))
    // bucket sums: bounded driver state (groups x (nOut-2) rows)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
    val sumRows = pts
      .filter(col("n") > nOut) // short series pass through unsampled
      .withColumn("i", row_number().over(w).cast("long") - 1)
      .filter(col("i") > 0 && col("i") < col("n") - 1)
      .withColumn("b", expr(s"((i - 1) * $nb) div (n - 2)"))
      .groupBy("event_type", "b")
      .agg(sum(col("x").cast(DecimalType(38, 0))).as("sx"),
        sum(col("y").cast(DecimalType(38, 0))).as("sy"),
        count(lit(1)).as("c"))
      .collect()
    val sums: Sums = sumRows.map { r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getLong(4), BigInt(r.getDecimal(2).toBigInteger),
          BigInt(r.getDecimal(3).toBigInteger)))
    }.toMap
    val ns: Map[String, Long] = gstats.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    pts.select(col("event_type"), col("ts_us"), col("event_id"),
        col("x"), col("y"), col("value")).as[P]
      .groupByKey(_.event_type)
      .flatMapSortedGroups(col("ts_us"), col("event_id"))(
        (g, rows) => fold(g, rows, ns(g), sums, nOut))
      .toDF()
      .orderBy("event_type", "seq")
  }

  /** DuckDB replay (nOut pinned 20 => 18 unrolled selection CTEs, the
    * emb_pca unrolled-iteration device): same integer coordinates,
    * same HUGEINT 2*area*c statistic, same (area DESC, index ASC)
    * tie rule via row_number — bit-exact selection chain.
    */
  def oracleSql(nOut: Int = 20): String = {
    val nb = nOut - 2
    val steps = (1 to nb).map { k =>
      s"""      s$k AS MATERIALIZED (
        SELECT event_type, x AS px, y AS py, ts_us, value FROM (
          SELECT p.event_type, p.x, p.y, p.ts_us, p.value,
                 row_number() OVER (PARTITION BY p.event_type ORDER BY
                   abs((s.px * a.c - a.sx) * (p.y - s.py)
                       - (s.px - p.x) * (a.sy - s.py * a.c)) DESC,
                   p.i ASC) AS rn
          FROM bkt p
          JOIN s${k - 1} s USING (event_type)
          JOIN anch a ON a.event_type = p.event_type AND a.k = ${k - 1}
          WHERE p.b = ${k - 1})
        WHERE rn = 1)"""
    }.mkString(",\n")
    val sel = (1 to nb).map(k =>
      s"        UNION ALL SELECT event_type, $k AS seq, ts_us, value FROM s$k")
      .mkString("\n")
    s"""
      WITH base AS (
        SELECT event_type, epoch_us(ts) AS ts_us, event_id, value,
               CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS y
        FROM events),
      g AS (SELECT event_type, min(ts_us) AS minx, count(*) AS n
            FROM base GROUP BY 1),
      shorts AS ( -- n <= nOut: CH returns the series unchanged
        SELECT b.event_type,
               CAST(row_number() OVER (PARTITION BY b.event_type
                 ORDER BY b.ts_us, b.event_id) - 1 AS INTEGER) AS seq,
               b.ts_us, b.value
        FROM base b JOIN g USING (event_type) WHERE g.n <= $nOut),
      pts AS MATERIALIZED (
        SELECT b.event_type,
               row_number() OVER (PARTITION BY b.event_type
                 ORDER BY b.ts_us, b.event_id) - 1 AS i,
               g.n, b.ts_us, b.ts_us - g.minx AS x, b.y, b.value
        FROM base b JOIN g USING (event_type) WHERE g.n > $nOut),
      bkt AS MATERIALIZED (
        SELECT *, CASE WHEN i = 0 THEN -1 WHEN i = n - 1 THEN $nb
                       ELSE ((i - 1) * $nb) // (n - 2) END AS b
        FROM pts),
      sums AS MATERIALIZED (
        SELECT event_type, b,
               CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(count(*) AS HUGEINT) AS c
        FROM bkt WHERE b BETWEEN 0 AND ${nb - 1} GROUP BY 1, 2),
      lastp AS (SELECT event_type, x, y, ts_us, value FROM bkt WHERE b = $nb),
      anch AS (
        SELECT event_type, b - 1 AS k, sx, sy, c FROM sums WHERE b >= 1
        UNION ALL
        SELECT event_type, ${nb - 1}, CAST(x AS HUGEINT),
               CAST(y AS HUGEINT), CAST(1 AS HUGEINT) FROM lastp),
      s0 AS (SELECT event_type, x AS px, y AS py, ts_us, value
             FROM bkt WHERE i = 0),
$steps
      SELECT event_type, seq, ts_us, value FROM (
        SELECT event_type, 0 AS seq, ts_us, value FROM s0
$sel
        UNION ALL SELECT event_type, ${nOut - 1} AS seq, ts_us, value
        FROM lastp
        UNION ALL SELECT event_type, seq, ts_us, value FROM shorts)
      ORDER BY event_type, seq"""
  }
}
