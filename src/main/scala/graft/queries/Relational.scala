package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._
import Dsl._

/** Relational core: projection/filter (P), joins (J), aggregates (A),
  * sort/limit/set ops (O). SURVEY.md §2.2–§2.6.
  */
object Relational extends QueryModule {

  /** Flagship (SURVEY §7.2): TPC-H-Q1-shaped pricing summary.
    * Scan → filter(pushed to parquet) → partial+final hash aggregate on two
    * low-cardinality keys → tiny sort. At 100 TB this is the ideal Spark
    * shape: map-side partial aggregation collapses 600M rows/executor to 6
    * groups before the (6-row) shuffle.
    */
  val pricingSummary: Q = {
    // All money/rate columns in the fixtures are exact 2-decimal values, so
    // casting each FACTOR to decimal is lossless+unambiguous; the products
    // and sums then stay in exact decimal arithmetic in both engines
    // (double-valued products would round differently: Spark rounds the
    // shortest-string repr, DuckDB the binary value — observed on sf0.001).
    val ext  = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    val tax  = col("l_tax").cast("decimal(4,2)")
    val one  = lit(1).cast("decimal(4,2)")
    Q(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(ext * (one - disc)).cast("double").as("sum_disc_price"),
          sum(ext * (one - disc) * (one + tax)).cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }
  }

  override def queries: Seq[(String, Q)] = Seq(
    "q01_pricing_summary" -> pricingSummary
  )
}
