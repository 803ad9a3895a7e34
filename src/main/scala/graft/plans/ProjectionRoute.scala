package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** ClickHouse-projection semantics for parquet tables: a registered
  * pre-aggregation (count / sum / min / max partials grouped by a key
  * set) is substituted AUTOMATICALLY under any aggregate over the
  * base table whose grouping keys are a subset of the projection's
  * and whose aggregates are derivable from the stored partials —
  * count(*) becomes sum(n), sum(x) becomes sum(sum_x), min/max
  * re-minimize their partials. The query text never changes; the
  * optimizer swaps the scan, exactly like CH picks a projection part.
  *
  * At 100 TB this is the difference between scanning the fact table
  * and scanning one row per (key-set) group: the rewrite wins
  * whenever the projection's group count is far below the row count,
  * and costs nothing otherwise (unregistered paths never match).
  *
  * Correct because every stored partial is an algebraic-merge state:
  * re-aggregating partials over a SUBSET of the projection keys is
  * the same two-level tree Spark's own partial aggregation performs.
  * Rewrites are all-or-nothing per Aggregate — one underivable
  * aggregate keeps the whole query on the base table.
  */
object Projections {

  final case class Spec(
      projPlan: LogicalPlan,
      keys: Map[String, Attribute],
      n: Attribute,
      sums: Map[String, Attribute],
      mins: Map[String, Attribute],
      maxs: Map[String, Attribute],
      measureType: Map[String, DataType],
      signature: String,
      baseFingerprint: String)

  private val registry = new ConcurrentHashMap[String, Spec]()

  def clear(): Unit = registry.clear()

  /** A projection answers a query only while the base table it was
    * built from is UNCHANGED — CH keeps projection parts in lockstep
    * with table parts transactionally; here (plain parquet dirs, no
    * transaction log) freshness is re-verified at lookup time against
    * a content fingerprint of the base directory. The fingerprint is
    * one recursive listing — the same metadata operation planning the
    * base scan itself performs to build its file index, so routing
    * adds no new scale cost class. A stale entry self-evicts.
    */
  def lookup(path: String): Option[Spec] =
    Option(registry.get(path)).filter { spec =>
      val fresh =
        try fingerprint(SparkSession.active, path) == spec.baseFingerprint
        catch { case _: Exception => false }
      if (!fresh) registry.remove(path)
      fresh
    }

  /** (name, length, mtime) digest of the base table's data files. */
  def fingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        buf += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(buf.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private def signatureOf(
      keys: Seq[String], measures: Seq[(String, DataType)]): String =
    s"keys=${keys.mkString(",")};measures=${
      measures.map { case (m, t) => s"$m:${t.sql}" }.mkString(",")}"

  /** Qualified-path key, so `/x/y.parquet` and `file:/x/y.parquet`
    * hit the same entry.
    */
  def normalize(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(p).toString
  }

  /** Build the projection (one aggregation pass over the base table,
    * written to `projPath`) and register it for [[ProjectionRoute]].
    * `measures` maps a base column to the cast type under which it is
    * aggregated (the same cast queries must use to match).
    */
  def register(spark: SparkSession, basePath: String, projPath: String,
      keys: Seq[String], measures: Seq[(String, DataType)]): Unit = {
    val key = normalize(spark, basePath)
    val sig = signatureOf(keys, measures)
    val fp = fingerprint(spark, basePath)
    Option(registry.get(key)) match {
      // Same projection over an unchanged base: no-op (CH mirrors
      // this — adding an existing projection does nothing).
      case Some(spec) if spec.signature == sig && spec.baseFingerprint == fp =>
        return
      // Different key/measure set, or the base changed since: DROP
      // the entry BEFORE rebuilding, or the rebuild's own aggregate
      // would be routed to the stale projection file it is about to
      // overwrite (read-under-delete).
      case _ => registry.remove(key)
    }
    val aggs = Seq(count(lit(1)).as("n")) ++ measures.flatMap { case (m, t) =>
      val c = col(m).cast(t)
      Seq(sum(c).as(s"sum_$m"), min(c).as(s"min_$m"), max(c).as(s"max_$m"))
    }
    spark.read.parquet(basePath)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(projPath)
    val plan = spark.read.parquet(projPath).queryExecution.analyzed
    val byName = plan.output.map(a => a.name -> a).toMap
    registry.put(key, Spec(
      plan,
      keys.map(k => k -> byName(k)).toMap,
      byName("n"),
      measures.map { case (m, _) => m -> byName(s"sum_$m") }.toMap,
      measures.map { case (m, _) => m -> byName(s"min_$m") }.toMap,
      measures.map { case (m, _) => m -> byName(s"max_$m") }.toMap,
      measures.toMap,
      sig, fp))
  }
}

object ProjectionRoute extends Rule[LogicalPlan] {

  /** The (column name, aggregated-as type) of a measure reference —
    * either the raw column or a single cast of it.
    */
  private def measureOf(e: Expression): Option[(String, DataType)] = e match {
    case ar: AttributeReference => Some(ar.name -> ar.dataType)
    case Cast(ar: AttributeReference, t, _, _) => Some(ar.name -> t)
    case _ => None
  }

  /** Strip attribute-only Projects down to the base-table scan. */
  private def baseScan(plan: LogicalPlan): Option[LogicalRelation] = plan match {
    case lr: LogicalRelation => Some(lr)
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      baseScan(child)
    case _ => None
  }

  private def castTo(e: Expression, t: DataType): Expression =
    if (e.dataType == t) e else Cast(e, t)

  /** Rewrite one aggregate function to its partial-merging twin over
    * the projection, or None if not derivable.
    */
  private def rewriteAgg(f: AggregateFunction, spec: Projections.Spec)
      : Option[Expression] = f match {
    // count(lit) with a NON-NULL literal only: SQL defines
    // count(NULL) = 0, which sum(n) would turn into the row count.
    case Count(Seq(Literal(v, _))) if v != null =>
      Some(Sum(spec.n).toAggregateExpression())
    case Count(Seq()) =>
      Some(Sum(spec.n).toAggregateExpression())
    case Sum(c, _) => measureOf(c).collect {
      case (m, t) if spec.measureType.get(m).contains(t) =>
        castTo(Sum(spec.sums(m)).toAggregateExpression(), f.dataType)
    }
    case Min(c) => measureOf(c).collect {
      case (m, t) if spec.measureType.get(m).contains(t) =>
        Min(spec.mins(m)).toAggregateExpression()
    }
    case Max(c) => measureOf(c).collect {
      case (m, t) if spec.measureType.get(m).contains(t) =>
        Max(spec.maxs(m)).toAggregateExpression()
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groups, aggExprs, child, _) =>
      val rewritten = for {
        lr <- baseScan(child)
        fsRel <- lr.relation match {
          case r: HadoopFsRelation => Some(r)
          case _ => None
        }
        paths = fsRel.location.rootPaths
        if paths.length == 1
        spec <- Projections.lookup(paths.head.toString)
        // every grouping key must be a projection key
        groupAttrs <- Option(groups).filter(_.forall {
          case ar: AttributeReference => spec.keys.contains(ar.name)
          case _ => false
        })
        newAggExprs <- rewriteAll(aggExprs, spec)
      } yield {
        val newGroups = groupAttrs.map {
          case ar: AttributeReference => spec.keys(ar.name)
        }
        Aggregate(newGroups, newAggExprs, spec.projPlan)
      }
      rewritten.getOrElse(agg)
  }

  /** All-or-nothing rewrite of the aggregate output list, preserving
    * every output name, type, and ExprId so parent operators resolve
    * unchanged.
    */
  private def rewriteAll(aggExprs: Seq[NamedExpression],
      spec: Projections.Spec): Option[Seq[NamedExpression]] = {
    val out = aggExprs.map {
      case ar: AttributeReference if spec.keys.contains(ar.name) =>
        Some(Alias(spec.keys(ar.name), ar.name)(exprId = ar.exprId))
      case al @ Alias(child, name) =>
        var ok = true
        // hand-rolled recursion: an AggregateExpression is rewritten
        // WHOLE (its measure-attr children must not be visited as
        // bare references), bare attrs outside aggregates must be
        // projection keys, everything else recurses structurally.
        def rw(e: Expression): Expression = e match {
          case ae: AggregateExpression if ae.filter.isEmpty && !ae.isDistinct =>
            rewriteAgg(ae.aggregateFunction, spec) match {
              case Some(r) => castTo(r, ae.dataType)
              case None => ok = false; ae
            }
          case ae: AggregateExpression => ok = false; ae
          case ar: AttributeReference =>
            if (spec.keys.contains(ar.name)) spec.keys(ar.name)
            else { ok = false; ar }
          case other => other.mapChildren(rw)
        }
        val newChild = rw(child)
        if (ok) Some(Alias(newChild, name)(exprId = al.exprId)) else None
      case _ => None
    }
    if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
  }
}
