package graft.functions

import scala.collection.mutable

/** Space-saving (Metwally et al., "Efficient computation of frequent
  * and top-k elements in data streams") heavy-hitter sketch: at most
  * `capacity` tracked keys; when full, the minimum-count key is
  * evicted and the newcomer inherits its count as an overestimate,
  * recorded in `error`. Guarantees: every true count is
  * <= estimate <= true + error, and any key with true frequency
  * > n/capacity is present in the sketch.
  *
  * Scale shape: one sketch per partition built map-side, merged up a
  * tree (`treeAggregate`) — the driver only ever sees `capacity`-sized
  * state, never the key space. This is the unbounded-cardinality
  * answer to exact groupBy top-k, whose partial-agg state is the full
  * key space.
  *
  * The min-scan on eviction is O(capacity); production implementations
  * use the stream-summary linked-bucket structure for O(1), which only
  * changes constants, not the sketch semantics sized here
  * (capacity <= a few thousand).
  */
final class SpaceSaving(val capacity: Int) extends Serializable {
  require(capacity > 0)
  private[functions] val counts = mutable.HashMap.empty[String, Long]
  private[functions] val errors = mutable.HashMap.empty[String, Long]

  /** Number of items observed (for error-bound checks). */
  var n: Long = 0L

  private def minCount: Long =
    if (counts.isEmpty) 0L else counts.valuesIterator.min

  def add(x: String, w: Long = 1L): this.type = {
    n += w
    counts.get(x) match {
      case Some(c) => counts.update(x, c + w)
      case None if counts.size < capacity =>
        counts.update(x, w)
        errors.update(x, 0L)
      case None =>
        val m = minCount
        val victim = counts.find(_._2 == m).get._1
        counts.remove(victim)
        errors.remove(victim)
        counts.update(x, m + w)
        errors.update(x, m)
    }
    this
  }

  /** Standard overestimating merge: a key absent from one side is
    * assumed to sit just below that side's minimum (its worst case),
    * then the union is trimmed back to `capacity` by estimated count.
    */
  def merge(o: SpaceSaving): SpaceSaving = {
    val out = new SpaceSaving(capacity)
    out.n = n + o.n
    val mA = if (counts.size < capacity) 0L else minCount
    val mB = if (o.counts.size < o.capacity) 0L else o.minCount
    val keys = counts.keySet ++ o.counts.keySet
    val merged = keys.iterator.map { k =>
      val (ca, ea) = (counts.getOrElse(k, mA), errors.getOrElse(k, mA))
      val (cb, eb) = (o.counts.getOrElse(k, mB), o.errors.getOrElse(k, mB))
      (k, ca + cb, ea + eb)
    }.toSeq.sortBy { case (k, c, _) => (-c, k) }
    merged.take(capacity).foreach { case (k, c, e) =>
      out.counts.update(k, c)
      out.errors.update(k, e)
    }
    out
  }

  /** Top-k by estimated count (ties broken by key for determinism):
    * (key, estimate, maxError).
    */
  def topK(k: Int): Seq[(String, Long, Long)] =
    counts.iterator.map { case (key, c) => (key, c, errors.getOrElse(key, 0L)) }
      .toSeq.sortBy { case (key, c, _) => (-c, key) }.take(k)
}

object SpaceSaving {
  import org.apache.spark.sql.{Column, Encoder, Encoders}
  import org.apache.spark.sql.expressions.Aggregator
  import org.apache.spark.sql.functions.udaf

  /** The sketch as a Column aggregate (usable in batch AND streaming
    * aggregations, unlike the RDD treeAggregate path): finish emits
    * the deterministic top-k (count desc, key asc) as
    * array<struct<key, cnt>>. Exact whenever the group's distinct
    * cardinality fits `capacity` — which is what makes the test-SF
    * oracle a plain GROUP BY count.
    */
  final class TopKAgg(capacity: Int, k: Int)
      extends Aggregator[String, SpaceSaving, Seq[(String, Long)]] {
    def zero: SpaceSaving = new SpaceSaving(capacity)
    def reduce(b: SpaceSaving, a: String): SpaceSaving =
      if (a == null) b else b.add(a)
    def merge(a: SpaceSaving, b: SpaceSaving): SpaceSaving = a.merge(b)
    def finish(r: SpaceSaving): Seq[(String, Long)] =
      r.topK(k).map { case (key, c, _) => (key, c) }
    def bufferEncoder: Encoder[SpaceSaving] =
      Encoders.javaSerialization[SpaceSaving]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** `spaceSavingTopK(capacity, k)(col)` as a Column aggregate. */
  def topk(capacity: Int, k: Int, c: Column): Column =
    udaf(new TopKAgg(capacity, k), Encoders.STRING)(c)
}
