package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntersectCountSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._

  test("rule rewrites size(array_intersect) over long arrays") {
    graft.functions.GraftFunctions.register(spark)
    // non-foldable input (range), or constant folding evaluates the
    // whole expression before the assertion can see the plan node
    val df = spark.range(5)
      .select(array(col("id"), col("id") + 1).as("a"),
        array(col("id") + 1, col("id") + 2).as("b"))
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(optimized.contains("intersectcount"), s"not rewritten:\n$optimized")
    assert(df.collect().forall(_.getInt(0) == 1))
  }

  test("IntersectCount matches size(array_intersect) semantics incl. dupes") {
    graft.functions.GraftFunctions.register(spark)
    val cases = Seq(
      (Array(1L, 2L, 3L), Array(2L, 3L, 4L)),         // plain overlap
      (Array(1L, 1L, 2L), Array(1L, 2L, 2L)),          // duplicates count once
      (Array.empty[Long], Array(1L, 2L)),              // empty side
      (Array(5L), Array(5L)),                          // exact
      (Array(1L, 2L), Array(3L, 4L)))                  // disjoint
    val df = cases.toDF("a", "b")
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    // the rewritten plan must produce exactly what the builtin does
    val builtin = cases.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(df.collect().map(_.getInt(0)).toSeq == builtin)
  }

  test("IntersectCount matches array_intersect on null elements") {
    graft.functions.GraftFunctions.register(spark)
    // array_intersect keeps a null shared by both sides in the
    // intersection: size counts it once. The rewrite must agree.
    // Built over range so constant folding can't pre-evaluate it.
    val df = spark.range(4)
      .select(
        array(lit(null).cast("long"), col("id")).as("a"),
        array(lit(null).cast("long"), col("id") * 2).as("b"),
        array(col("id"), col("id")).as("c"))
      .select(
        size(array_intersect(col("a"), col("b"))).as("n_ab"),
        size(array_intersect(col("a"), col("c"))).as("n_ac"))
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(optimized.contains("intersectcount"), s"not rewritten:\n$optimized")
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    // id=0: {null,0}∩{null,0}=2, {null,0}∩{0}=1; id>0: shared null only
    assert(got == Seq((2, 1), (1, 1), (1, 1), (1, 1)))
  }
}
