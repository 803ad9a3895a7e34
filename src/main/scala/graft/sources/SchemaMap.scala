package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Declarative source→target schema mapping for ingest: rename,
  * reorder, coerce types with per-column cast policies, and route
  * rows that fail coercion to a bad-row side channel instead of
  * poisoning the load (the day-one ETL need: sources lie about
  * types).
  *
  * Everything is pure `Column` expression work (`try_cast` +
  * `coalesce`), so the whole mapping stays inside whole-stage codegen
  * and pushes through to the scan — no UDFs, no extra shuffle, and
  * the good/bad split is two filters over one cached pass.
  */
object SchemaMap {

  /** How a column reacts when the source value cannot be cast:
    *  - Strict: the whole row goes to the bad-row channel.
    *  - Nullify: the value becomes NULL, row stays good.
    *  - Default(v): the value becomes `v`, row stays good.
    */
  sealed trait CastPolicy extends Serializable
  case object Strict extends CastPolicy
  case object Nullify extends CastPolicy
  final case class Default(value: Any) extends CastPolicy

  /** One target column: pull `source`, cast to `targetType` under
    * `policy`, surface as `target`.
    */
  final case class FieldMap(
      source: String,
      target: String,
      targetType: DataType,
      policy: CastPolicy = Strict)

  final case class Mapped(good: DataFrame, bad: DataFrame)

  private def tryCast(c: Column, t: DataType): Column =
    c.try_cast(t)

  /** A cast "fails" when the source is present but the cast comes back
    * null — a null source is a legitimate null, not a failure.
    */
  private def failed(src: Column, t: DataType): Column =
    src.isNotNull && tryCast(src, t).isNull

  /** Apply the mapping. `good` carries exactly the target columns in
    * mapping order; `bad` carries the ORIGINAL source row plus a
    * `bad_reason` column naming every strict column that failed, so
    * the quarantine is self-describing and re-ingestable after a fix.
    */
  def apply(df: DataFrame, fields: Seq[FieldMap]): Mapped = {
    val strict = fields.filter(_.policy == Strict)
    val reasons = strict.map { f =>
      when(failed(col(f.source), f.targetType),
        lit(s"${f.source} !~ ${f.targetType.simpleString}"))
    }
    val reason = concat_ws(";", reasons: _*)
    val tagged = df.withColumn("bad_reason",
      when(reason =!= "", reason))

    val outCols = fields.map { f =>
      val c = tryCast(col(f.source), f.targetType)
      val v = f.policy match {
        case Default(d) =>
          // Substitute the default only on an actual cast FAILURE; a
          // legitimately-NULL source value stays NULL (failed() already
          // encodes that distinction).
          when(failed(col(f.source), f.targetType),
            lit(d).try_cast(f.targetType)).otherwise(c)
        case _ => c
      }
      v.as(f.target)
    }
    Mapped(
      good = tagged.filter(col("bad_reason").isNull).select(outCols: _*),
      bad = tagged.filter(col("bad_reason").isNotNull))
  }
}
