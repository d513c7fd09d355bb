package graft.queries

import graft.Tables._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import Dsl._

/** Advanced aggregations (SURVEY.md §2.4 A6–A11). */
object Aggregates extends QueryModule {

  /** A6: pivot — fixed pivot-value list so the output schema is static
    * (required both for the oracle and for a stable 100 TB plan; dynamic
    * pivot needs an extra pass to discover values). */
  val pivotQ: Q = Q(
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .orderBy("o_orderpriority")
  }

  /** A7: collect_set, emitted as a canonically-sorted joined string (R1:
    * never emit an unsorted collected list; string form also hash-compares
    * identically across engines). */
  val collectQ: Q = Q(
    """SELECT l_returnflag,
      |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
      |  array_to_string(list_sort(list(DISTINCT CAST(l_quantity AS INT))), ',') AS qtys
      |FROM lineitem WHERE l_quantity <= 10
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    lineitem(s, d).filter(col("l_quantity") <= 10)
      .groupBy("l_returnflag")
      .agg(
        array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"),
        array_join(sort_array(collect_set(col("l_quantity").cast("int"))), ",").as("qtys"))
      .orderBy("l_returnflag")
  }

  /** A8: exact percentiles (linear interpolation in both engines). */
  val percentileQ: Q = Q(
    """SELECT l_returnflag,
      |  CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS p50_qty,
      |  CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE) AS p25_price,
      |  CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE) AS p75_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).cast("double").as("p50_qty"),
        percentile(col("l_extendedprice"), lit(0.25)).cast("double").as("p25_price"),
        percentile(col("l_extendedprice"), lit(0.75)).cast("double").as("p75_price"))
      .orderBy("l_returnflag")
  }

  /** A9: sample stddev/variance/correlation/covariance, rounded to 6 dp —
    * single-pass co-moment formulas in both engines; the rounding absorbs
    * the ≤1e-12 merge-order float noise. */
  val statsQ: Q = Q(
    """SELECT l_returnflag,
      |  ROUND(CAST(stddev_samp(l_quantity) AS DOUBLE), 6) AS sd_qty,
      |  ROUND(CAST(var_samp(l_quantity) AS DOUBLE), 6) AS var_qty,
      |  ROUND(CAST(corr(l_quantity, l_extendedprice) AS DOUBLE), 6) AS corr_qp,
      |  ROUND(CAST(covar_samp(l_quantity, l_discount) AS DOUBLE), 6) AS cov_qd
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
      .orderBy("l_returnflag")
  }

  /** A10: min_by/max_by with an encoded unique sort key (acctbal has ties
    * within a nation — cents*1e10 − custkey breaks them deterministically:
    * max picks the richest, smallest-key customer). */
  val minMaxByQ: Q = Q(
    """SELECT c_nationkey,
      |  arg_max(c_name, CAST(round(c_acctbal*100, 0) AS BIGINT)*10000000000 - c_custkey) AS richest,
      |  arg_min(c_name, CAST(round(c_acctbal*100, 0) AS BIGINT)*10000000000 - c_custkey) AS poorest
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    val key = round(col("c_acctbal") * 100, 0).cast("long") * lit(10000000000L) - col("c_custkey")
    customer(s, d)
      .groupBy("c_nationkey")
      .agg(
        max_by(col("c_name"), key).as("richest"),
        min_by(col("c_name"), key).as("poorest"))
      .orderBy("c_nationkey")
  }

  /** A11: custom typed UDAF — exact weighted average via a decimal
    * accumulator `Aggregator` (order-independent, merge-safe: the same
    * algebraic shape Spark uses for its own partial aggregates). */
  val weightedAvgQ: Q = Q(
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS wavg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(WeightedAvg.udaf(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
      .orderBy("l_returnflag")
  }

  /** Skew-salted aggregation ([[graft.operators.SkewSalt]]): the same
    * (n, exact-decimal sum) per user as a plain groupBy would produce,
    * but the heavy shuffle is keyed (user, salt) so a hot user spreads
    * over 16 reducers. Salting is result-invariant for algebraic
    * aggregates, so the oracle is just the unsalted SQL. */
  val saltedAgg: Q = Q(
    s"""SELECT user_id, COUNT(*) AS n, ${sqlDsum("value")} AS total
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    graft.operators.SkewSalt.countSum(events(s, d), Seq("user_id"), "value", salts = 16)
      .orderBy("user_id")
  }

  override def queries: Seq[(String, Q)] = Seq(
    "q30_pivot"        -> pivotQ,
    "q31_collect"      -> collectQ,
    "q32_percentile"   -> percentileQ,
    "q33_stats"        -> statsQ,
    "q34_minmax_by"    -> minMaxByQ,
    "q35_weighted_avg" -> weightedAvgQ,
    "q83_salted_agg"   -> saltedAgg
  )
}

/** Exact weighted average: Σ(x·w)/Σ(w) accumulated in BigDecimal so the
  * result is independent of partition merge order (doubles would not be).
  * Inputs are exact ≤2-dp doubles, so BigDecimal.valueOf (shortest-string)
  * is lossless.
  */
case class WAvgIn(x: Double, w: Double)

object WeightedAvg extends Aggregator[WAvgIn, (java.math.BigDecimal, java.math.BigDecimal), Double] {
  private val ZERO = java.math.BigDecimal.ZERO
  override def zero: (java.math.BigDecimal, java.math.BigDecimal) = (ZERO, ZERO)
  override def reduce(b: (java.math.BigDecimal, java.math.BigDecimal), a: WAvgIn) = {
    val x = java.math.BigDecimal.valueOf(a.x)
    val w = java.math.BigDecimal.valueOf(a.w)
    (b._1.add(x.multiply(w)), b._2.add(w))
  }
  override def merge(b1: (java.math.BigDecimal, java.math.BigDecimal),
                     b2: (java.math.BigDecimal, java.math.BigDecimal)) =
    (b1._1.add(b2._1), b1._2.add(b2._2))
  override def finish(r: (java.math.BigDecimal, java.math.BigDecimal)): Double =
    if (r._2.signum() == 0) 0.0 else r._1.doubleValue() / r._2.doubleValue()
  override def bufferEncoder: Encoder[(java.math.BigDecimal, java.math.BigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  val udaf = org.apache.spark.sql.functions.udaf(this, Encoders.product[WAvgIn])
}
