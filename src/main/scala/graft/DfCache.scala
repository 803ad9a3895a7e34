package graft

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.DataFrame

/** Centralized memoization for PERSISTED index DataFrames (exploded
  * shingle indexes, LSH band indexes, IVF cell assignments).
  *
  * Why this exists: those indexes are persisted because several legs
  * of one query read them, but the building functions are re-entered
  * on every registry call — naively each call would persist a fresh
  * copy and leak the previous one's cached blocks in a long-lived
  * session. Memoizing per (session, corpus, params) gives each index
  * exactly ONE resident copy that later calls reuse — the
  * "build the index once, serve it many times" shape a resident
  * engine wants (same pattern as Ann.fitCellsCached for centroids).
  *
  * Keys include the owning SparkContext's applicationId, so entries
  * from a stopped session are never handed to a new one (their cached
  * blocks died with the session; the map entry itself is a few words).
  * `clear()` drops and unpersists everything for tests / manual reset.
  */
object DfCache {
  private val cache = new ConcurrentHashMap[String, DataFrame]()

  /** Monotonic count of memo HITS (an entry already present at get).
    * Bench reads the delta around each query to attribute warm-memo
    * reuse: a query whose first run scores hits built by a SIBLING
    * query is not paying its own index cost, which contaminated the
    * r10 ladder's per-query ratios (dedup_clusters measured 0.017 s
    * warm at sf0.1 vs 30.8 s cold at sf10 — a bogus 1814x headline).
    */
  private val hitCounter = new java.util.concurrent.atomic.AtomicLong()
  def hitCount: Long = hitCounter.get()

  /** Memoize `build` (which should return an already-persisted DF)
    * under `key` for the session owning `any`'s SparkSession.
    */
  def memo(df: => DataFrame, key: String): DataFrame = {
    // computeIfAbsent would evaluate build under the map lock; plain
    // get/putIfAbsent keeps Spark planning outside it. A rare race
    // builds twice and unpersists the loser.
    val appId = org.apache.spark.sql.SparkSession.active.sparkContext.applicationId
    val k = s"$appId:$key"
    val hit = cache.get(k)
    if (hit != null) { hitCounter.incrementAndGet(); hit }
    else {
      val built = df
      val prev = cache.putIfAbsent(k, built)
      if (prev == null) built
      else { built.unpersist(blocking = false); prev }
    }
  }

  /** Drop and unpersist everything. `blocking = true` waits for the
    * old blocks to actually leave the block manager — required when
    * the caller immediately rebuilds the same indexes (Bench COLD
    * mode): an async unpersist leaves both copies transiently
    * resident, and at sf10 that double-residency OOMed an 8 GB heap
    * mid-broadcast-unroll (r11 ladder, first attempt).
    */
  def clear(blocking: Boolean = false): Unit = {
    cache.values.forEach(df => try df.unpersist(blocking) catch { case _: Throwable => () })
    cache.clear()
  }
}

/** Per-query slots for eager localCheckpoints created INSIDE a query
  * function (graph_triangles' edge list, ch_rank_corr's cell table,
  * shortestPaths' frontier layers). Their blocks must outlive the
  * function (the returned frame reads them), so they cannot be
  * unpersisted on exit — but in a resident session repeated
  * invocations would otherwise accumulate dead checkpoint RDDs for
  * the life of the JVM (r13 advice). `swap` frees the PREVIOUS
  * invocation's blocks (safe: its result was materialized before the
  * query was re-entered) and registers the new frame.
  */
object CkptSlot {
  private val slots =
    new ConcurrentHashMap[String, DataFrame]()

  def swap(key: String, df: DataFrame): DataFrame = {
    val appId =
      org.apache.spark.sql.SparkSession.active.sparkContext.applicationId
    val prev = slots.put(s"$appId:$key", df)
    if (prev != null)
      try org.apache.spark.sql.GraftBenchShim.unpersistLocalCheckpoint(prev)
      catch { case scala.util.control.NonFatal(_) => () }
    df
  }
}
