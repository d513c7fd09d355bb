package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Exposes Spark's INTERNAL bloom-filter expressions to SQL.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` are what Spark's own
  * runtime-filter optimization injects into join plans
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), but they are not in the
  * public function registry — the only public surface is the automatic
  * injection, which the engine cannot steer toward an arbitrary
  * membership problem like decontamination. Registering them as session
  * temp functions (the same mechanism as [[CosineSimilarity]]) gives
  * queries the sketch directly:
  *
  *   `graft_bloom_agg(xxhash64_value, estimatedItems, numBits)` →
  *   binary sketch; `graft_might_contain(sketch, xxhash64_value)` →
  *   boolean, no false negatives by construction.
  *
  * The value side must already be a LongType hash (xxhash64), exactly as
  * the optimizer's own injection wraps join keys. The sketch argument of
  * `graft_might_contain` must be foldable or a scalar subquery — the
  * scalar-subquery form is the broadcast-a-sketch shape used in q133. */
object BloomBridge {
  /** The single definition of both builders — [[graft.GraftExtensions]]
    * injects these same functions for extension-built sessions, so the
    * two registration paths cannot drift. */
  val aggBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression = {
    case Seq(c)       => new BloomFilterAggregate(c)
    case Seq(c, n)    => new BloomFilterAggregate(c, n)
    case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
    case other => throw new IllegalArgumentException(
      s"graft_bloom_agg takes 1-3 arguments, got ${other.size}")
  }

  val containBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => BloomFilterMightContain(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", aggBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain", containBuilder, "built-in")
  }
}
