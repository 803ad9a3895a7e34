package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("withExtensions(GraftExtensions) exposes the native functions in SQL") {
    // builder reuses the shared session's context but applies extensions
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    val r = s.sql(
      """SELECT graft_polyhash('abc') AS ph,
                graft_simhash(array(1L, 2L)) AS sh,
                size(graft_minhash(array(1L, 2L))) AS mh""").head()
    assert(r.getLong(0) == functions.PolyHash64.hash("abc".getBytes("UTF-8"), 1000003L))
    assert(r.getLong(1) == functions.SimHash64.hash(Seq(1L, 2L)))
    assert(r.getInt(2) == 64)
  }
}
