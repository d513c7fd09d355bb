package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: build sessions with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) and the
  * graft function surface is installed in the catalog for every session —
  * no per-session `register` call needed, and SQL-only users (thrift,
  * notebooks) get `cosine_sim` too.
  *
  * This is the standard packaging for library-provided Catalyst
  * extensions (functions now; optimizer rules/strategies would inject
  * here as well).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSim)
    ext.injectFunction(GraftExtensions.l2Micro)
    ext.injectFunction(GraftExtensions.zOrder2)
    ext.injectFunction(GraftExtensions.bloomAgg)
    ext.injectFunction(GraftExtensions.mightContain)
    // dormant until spark.graft.rangeJoin.binSize is set (see its scaladoc)
    ext.injectOptimizerRule(s => graft.plans.BandedRangeJoin(s))
  }
}

object GraftExtensions {
  /** (identifier, info, builder) triple for `cosine_sim`. */
  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[functions.CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => functions.CosineSimilarity(exprs(0), exprs(1)))

  /** (identifier, info, builder) triple for `l2_micro`. */
  val l2Micro: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("l2_micro"),
    new ExpressionInfo(classOf[functions.L2Micro].getName, "l2_micro"),
    (exprs: Seq[Expression]) => functions.L2Micro(exprs(0), exprs(1)))

  /** (identifier, info, builder) triple for `zorder2`. */
  val zOrder2: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("zorder2"),
    new ExpressionInfo(classOf[functions.ZOrder2].getName, "zorder2"),
    (exprs: Seq[Expression]) => functions.ZOrder2(exprs(0), exprs(1)))

  /** `graft_bloom_agg` — builder defined once on
    * [[functions.BloomBridge]], which also documents why the internal
    * runtime-filter aggregate is surfaced under a graft name. */
  val bloomAgg: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "graft_bloom_agg"),
    functions.BloomBridge.aggBuilder)

  /** `graft_might_contain` — scalar probe for [[bloomAgg]] sketches. */
  val mightContain: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "graft_might_contain"),
    functions.BloomBridge.containBuilder)
}
