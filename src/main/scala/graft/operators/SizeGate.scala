package graft.operators

import org.apache.spark.sql.SparkSession

/** The shared broadcast size gate: an explicit `broadcast(df)` hint is
  * an unconditional claim that df fits every executor — correct for
  * genuinely bounded sides (dimension tables, probe sets, LUTs,
  * metadata) and a scale-up failure for sides that grow with the data
  * (PageRank ranks, BFS frontiers, hot-key exclusion sets). Operators
  * with a data-growing side gate the hint here on a measured row
  * count vs spark.sql.autoBroadcastJoinThreshold and degrade to a
  * shuffle join past the ceiling.
  */
object SizeGate {

  private def parseBytes(s: String): Long = {
    val t = s.trim
    if (t.startsWith("-")) -1L
    else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(t)
  }

  /** Does a `rows`-row frame at ~`bytesPerRow` fit under the session's
    * broadcast threshold? A threshold of -1 (broadcasts disabled)
    * gates everything off.
    */
  def fits(s: SparkSession, rows: Long, bytesPerRow: Long): Boolean = {
    val thr = parseBytes(
      s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    thr > 0 && rows * bytesPerRow <= thr
  }
}
