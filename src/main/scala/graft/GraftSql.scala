package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string entry point — the ergonomic gap a ClickHouse-migrating
  * user hits first: they write SQL, not the DataFrame API. `sql(...)`
  * registers every test table at `dir` as a temp view (the same
  * loaders every registry operator reads through, so `events` carries
  * the derived `ts_us`/`ts` columns) plus graft's native SQL functions
  * (graft_dot, graft_simhash, ... — [[graft.functions.GraftFunctions]]),
  * then runs the query through `spark.sql`. Because the registry's
  * DuckDB oracles are written in near-ANSI SQL, a large slice of them
  * run here UNCHANGED — SqlEntrySpec pins a flagship set whose
  * spark.sql results equal their DataFrame twins cell-exactly.
  */
object GraftSql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register the corpus views + native functions once per (session,
    * dir). Re-registration is idempotent (temp views overwrite).
    */
  def registerViews(s: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.register(s)
    tableNames.foreach { t =>
      Tables.load(s, dir, t): Unit // fail fast if the table is absent
      (t match {
        case "events" => Tables.events(s, dir)
        case other    => Tables.load(s, dir, other)
      }).createOrReplaceTempView(t)
    }
  }

  def sql(s: SparkSession, dir: String, query: String): DataFrame = {
    registerViews(s, dir)
    s.sql(query)
  }
}
