package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed prefix sum (running total over a global order) without
  * a single-partition window.
  *
  * `Window.orderBy(v)` with no partition key moves EVERY row through
  * one task — the classic cumulative-window scale trap. The
  * distributed device is the textbook two-pass range-partitioned
  * scan:
  *
  *   1. ONE range shuffle puts each partition in charge of a
  *      contiguous key range, sorted within the partition.
  *   2. A bounded first pass emits one row of per-partition totals
  *      (numPartitions rows to the driver — partition metadata, not
  *      data).
  *   3. The exclusive prefix of those totals is broadcast back as
  *      per-partition offsets, and a second pass walks each
  *      partition's sorted rows once, folding offset + local running
  *      sum in O(1) state.
  *
  * Both passes read the SAME shuffle output (shared lineage — Spark
  * skips the map stage on the second job), so total cost is one wide
  * shuffle + one bounded collect, at any scale. The per-partition
  * walk is genuine imperative per-partition logic, the one place
  * mapPartitions beats every declarative form.
  */
object PrefixSum {

  /** Appends running-total columns `out(i)` = cumulative sum of long
    * column `values(i)` over the global `order`, computed with the
    * two-pass device above. `order` columns must be a total order
    * (ties within a key land in one partition, where the within-key
    * order follows `order`'s sort — callers that need tie determinism
    * must make the order key unique, as with any cumulative window).
    */
  def cumsumLong(
      df: DataFrame,
      order: Seq[String],
      values: Seq[String],
      out: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    require(values.length == out.length, "one output name per value column")
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(p, order.map(col): _*)
      .sortWithinPartitions(order.map(col): _*)
    val schema = ranged.schema
    val vIdx = values.map(schema.fieldIndex).toArray
    val n = vIdx.length
    val rdd = ranged.rdd

    // Pass 1: per-partition totals — numPartitions rows, bounded.
    val totals = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val acc = new Array[Long](n)
        it.foreach { r =>
          var i = 0
          while (i < n) { acc(i) += r.getLong(vIdx(i)); i += 1 }
        }
        Iterator((pid, acc))
      }
      .collect()
      .sortBy(_._1)

    // Exclusive prefix of the totals = each partition's start offset.
    val offsets = new Array[Array[Long]](totals.length)
    val run = new Array[Long](n)
    for (((_, t), i) <- totals.zipWithIndex) {
      offsets(i) = run.clone()
      var j = 0
      while (j < n) { run(j) += t(j); j += 1 }
    }
    val bc = spark.sparkContext.broadcast(offsets)

    // Pass 2: offset + local running sum, O(1) state per partition.
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = bc.value(pid).clone()
      it.map { r =>
        var i = 0
        while (i < n) { acc(i) += r.getLong(vIdx(i)); i += 1 }
        Row.fromSeq(r.toSeq ++ acc.toSeq)
      }
    }
    spark.createDataFrame(
      outRdd,
      StructType(schema.fields ++ out.map(StructField(_, LongType, nullable = false))))
  }
}
