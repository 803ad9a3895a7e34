package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.functions._

/** ClickHouse-SPELLED SQL function names, registered as aliases onto
  * the engine's existing implementations — the first thing a
  * CH-migrating user's actual SQL hits after connectivity: `argMax(x,
  * y)`, `uniq(x)`, `countIf(c)`, `quantileTDigest(x, q)` parse and run
  * through `spark.sql` (GraftSql registers these with the corpus
  * views; SqlEntrySpec pins a CH-spelled flagship set cell-exact
  * against the DataFrame twins).
  *
  * Dialect notes, deliberate and documented:
  *  - CH's parametric-aggregate form `f(p)(x)` has no Spark-parser
  *    analogue; parameters flatten into the argument list (`topK(x,
  *    k)`, `quantile*(x, level)`), which is also how CH spells the
  *    non-parametric majority.
  *  - Spark resolves function names case-insensitively, so `argMax`
  *    and `argmax` are the same registration.
  *  - names that collide with a Spark BUILTIN of different semantics
  *    are NOT shadowed (registration is guarded on existence): CH
  *    `any(x)` (first value) stays Spark's bool_or — use `anyLast` or
  *    `first`; CH `position(haystack, needle)` stays Spark's
  *    `position(substr, str)`.
  *  - empty-group semantics follow Spark (NULL), not CH's
  *    default-value convention (`sumIf` over no matches is NULL, not
  *    0) — the portable spelling is an outer `coalesce`.
  *  - `uniq` maps to Spark's HLL++ (`approx_count_distinct`, rsd
  *    0.02 — the ch_uniq_hll sizing): same contract (estimate with
  *    bounded rsd), different estimator constants than CH's
  *    adaptive-sampling uniq.
  *  - `quantileTDigest` runs the k1-scale merging t-digest
  *    (functions/TDigestSketch.scala) — CH's own scale family — under
  *    the documented rank bound; estimates are merge-order-dependent
  *    in BOTH engines, so cross-checks go through rank certificates.
  */
object ChAliases {

  private def c(e: Expression): Column = GraftColumnShim.column(e)

  private def numArg(e: Expression, fn: String): Double = e.eval() match {
    case n: Number => n.doubleValue
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn expects a foldable numeric literal, got $other")
  }

  private def strArg(e: Expression, fn: String): String = e.eval() match {
    case null => throw new IllegalArgumentException(
      s"$fn expects a string literal, got NULL")
    case s => s.toString
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def reg(name: String)(builder: Seq[Expression] => Column): Unit = {
      val ident = FunctionIdentifier(name)
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident,
          new ExpressionInfo("graft.functions.ChAliases", name),
          (children: Seq[Expression]) =>
            GraftColumnShim.expression(builder(children)))
      }
    }

    // ---- aggregates ---------------------------------------------------
    reg("argMax")(ch => max_by(c(ch(0)), c(ch(1))))
    reg("argMin")(ch => min_by(c(ch(0)), c(ch(1))))
    reg("uniqExact")(ch =>
      count_distinct(c(ch.head), ch.tail.map(c): _*))
    reg("uniq")(ch => approx_count_distinct(
      if (ch.size == 1) c(ch(0)) else struct(ch.map(c): _*), 0.02))
    reg("countIf")(ch => count_if(c(ch(0))))
    reg("sumIf")(ch => sum(when(c(ch(1)), c(ch(0)))))
    reg("avgIf")(ch => avg(when(c(ch(1)), c(ch(0)))))
    reg("minIf")(ch => min(when(c(ch(1)), c(ch(0)))))
    reg("maxIf")(ch => max(when(c(ch(1)), c(ch(0)))))
    reg("anyLast")(ch => last(c(ch(0))))
    reg("groupArray")(ch => collect_list(c(ch(0))))
    reg("groupUniqArray")(ch => collect_set(c(ch(0))))
    reg("groupBitAnd")(ch => bit_and(c(ch(0))))
    reg("groupBitOr")(ch => bit_or(c(ch(0))))
    reg("groupBitXor")(ch => bit_xor(c(ch(0))))
    reg("quantileExact")(ch =>
      percentile(c(ch(0)), lit(numArg(ch(1), "quantileExact"))))
    reg("quantileTDigest")(ch => element_at(
      TDigestSketch(200, Seq(numArg(ch(1), "quantileTDigest")),
        c(ch(0)).cast("double"), k1 = true), 1))
    reg("topK")(ch => SpaceSaving.topk(256,
      numArg(ch(1), "topK").toInt, c(ch(0)).cast("string")))
    reg("stddevPop")(ch => stddev_pop(c(ch(0))))
    reg("stddevSamp")(ch => stddev_samp(c(ch(0))))
    reg("varPop")(ch => var_pop(c(ch(0))))
    reg("varSamp")(ch => var_samp(c(ch(0))))

    // ---- arrays / strings ---------------------------------------------
    reg("arraySort")(ch => sort_array(c(ch(0))))
    reg("arrayStringConcat")(ch =>
      array_join(c(ch(0)),
        if (ch.size >= 2) strArg(ch(1), "arrayStringConcat") else ""))
    reg("lengthUTF8")(ch => length(c(ch(0))))
    reg("lowerUTF8")(ch => lower(c(ch(0))))
    reg("upperUTF8")(ch => upper(c(ch(0))))
    reg("splitByChar")(ch => split(c(ch(1)),
      java.util.regex.Pattern.quote(strArg(ch(0), "splitByChar"))))
    reg("empty")(ch => length(c(ch(0))) === 0)
    reg("notEmpty")(ch => length(c(ch(0))) > 0)
    reg("multiIf") { ch =>
      require(ch.size >= 3 && ch.size % 2 == 1,
        "multiIf(cond1, val1, ..., else) needs an odd argument count >= 3")
      val start = when(c(ch(0)), c(ch(1)))
      ch.drop(2).dropRight(1).grouped(2).foldLeft(start) {
        case (acc, Seq(cond, v)) => acc.when(c(cond), c(v))
        case (acc, _) => acc
      }.otherwise(c(ch.last))
    }

    // ---- datetime ------------------------------------------------------
    reg("toYear")(ch => year(c(ch(0))))
    reg("toMonth")(ch => month(c(ch(0))))
    reg("toDayOfMonth")(ch => dayofmonth(c(ch(0))))
    reg("toHour")(ch => hour(c(ch(0))))
    reg("toMinute")(ch => minute(c(ch(0))))
    reg("toSecond")(ch => second(c(ch(0))))
    reg("toDate")(ch => to_date(c(ch(0))))
    reg("toStartOfMonth")(ch => trunc(c(ch(0)), "month"))
    reg("toStartOfDay")(ch => date_trunc("day", c(ch(0))))
    reg("toStartOfHour")(ch => date_trunc("hour", c(ch(0))))
    reg("toStartOfMinute")(ch => date_trunc("minute", c(ch(0))))
    reg("toYYYYMM")(ch =>
      (year(c(ch(0))) * 100 + month(c(ch(0)))).cast("int"))
    // CH: Monday=1..Sunday=7; Spark dayofweek: Sunday=1..Saturday=7
    reg("toDayOfWeek")(ch =>
      (pmod(dayofweek(c(ch(0))) + lit(5), lit(7)) + 1).cast("int"))

    // ---- arithmetic ------------------------------------------------------
    reg("intDiv")(ch => call_function("div", c(ch(0)), c(ch(1))))
    reg("modulo")(ch => c(ch(0)) % c(ch(1)))
  }
}
