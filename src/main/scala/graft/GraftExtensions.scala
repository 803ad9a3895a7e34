package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomContains, DotProduct, HllEstimate, MinHashSig, NearestCells, PolyHash64, SimHash64}

/** SparkSessionExtensions entry point: lets a deployment enable
  * graft's native expressions declaratively —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * (Operators also call [[graft.functions.GraftFunctions.register]]
  * defensively so externally-built sessions work either way.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_], b: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), b))
    inject("graft_polyhash", classOf[PolyHash64], es => PolyHash64(es.head))
    inject("graft_simhash", classOf[SimHash64], es => SimHash64(es.head))
    inject("graft_minhash", classOf[MinHashSig], es => MinHashSig(es.head))
    inject("graft_dot", classOf[DotProduct], es => DotProduct(es(0), es(1)))
    inject("graft_cells", classOf[NearestCells], es => NearestCells.build(es))
    inject("graft_hll_estimate", classOf[HllEstimate], es => HllEstimate(es.head))
    inject("graft_bloom_contains", classOf[BloomContains], es => BloomContains.build(es))
    ext.injectOptimizerRule(_ => graft.plans.RewriteIntersectCount)
    ext.injectOptimizerRule(_ => graft.plans.ProjectionRoute)
  }
}
