package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  test("graft_dot matches a hand computation, casts floats, skips nulls") {
    GraftFunctions.register(spark)
    import graft.SparkSpec.spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val got = df.select(expr("graft_dot(a, b)")).head().getDouble(0)
    assert(got == 32.0) // 4 + 10 + 18

    val withNulls = Seq((Seq[java.lang.Double](1.0, null, 3.0),
        Seq[java.lang.Double](2.0, 5.0, null)))
      .toDF("a", "b")
    assert(withNulls.select(expr("graft_dot(a, b)")).head().getDouble(0) == 2.0)
  }

  test("graft_dot equals the HOF formulation bit-for-bit on real embeddings") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding"))
    val both = emb.as("x").crossJoin(emb.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(
        expr("graft_dot(x.embedding, y.embedding)").as("native"),
        aggregate(zip_with(col("x.embedding"), col("y.embedding"),
            (p, q) => p.cast("double") * q.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}"))
  }

  test("graft_dot rejects non-castable input at analysis time") {
    GraftFunctions.register(spark)
    import graft.SparkSpec.spark.implicits._
    val df = Seq(("nope", Array(1.0))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_dot(a, b)")).collect()
    }
  }
}
