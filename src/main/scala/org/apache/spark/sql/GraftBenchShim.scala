package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}

/** Bench-only helper (lives in the spark.sql package to reach the
  * private[sql] Dataset factory): drops the TERMINAL global Sort of a
  * query plan. Every graft operator ends in an `orderBy` purely to
  * satisfy the driver's deterministic row-hash compare (Verify keeps
  * it); a resident engine writing to a sink has no output-order
  * contract, so the bench measures the computation, not the
  * contract's presentation sort. Only root-level Sorts (possibly
  * under pure Projects) are stripped — a Sort under a Limit is top-k
  * semantics and is untouched.
  */
object GraftBenchShim {

  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case s: Sort if s.global => strip(s.child)
    case pr @ Project(_, child) =>
      val c = strip(child)
      if (c eq child) pr else pr.copy(child = c)
    case other => other
  }

  def stripTopSort(df: DataFrame): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val stripped = strip(analyzed)
    if (stripped eq analyzed) df
    else classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[classic.SparkSession], stripped)
  }

  /** Free the storage blocks behind a `localCheckpoint`ed frame.
    * `Dataset.unpersist` only clears CacheManager entries, but a
    * local checkpoint's blocks live on the INTERNAL checkpointed RDD
    * inside the LogicalRDD leaf — without this, every superstep's
    * dead checkpoint waits for a full GC the big bench heap may
    * never run (graph_pagerank at sf100 leaked ~160 MB x iterations
    * of rank blocks this way, on top of the shuffle-file class the
    * periodic-GC cleaner interval handles). No-op for frames that
    * are not local checkpoints.
    */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
