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

  // ---------------------------------------------------------------- P family

  /** P1: projection, rename, computed columns. Narrow ReadSchema: only the
    * four referenced columns reach the parquet scan (column pruning). */
  val projectCompute: Q = Q(
    """SELECT p_partkey, UPPER(p_type) AS type_u,
      |  CAST(p_retailprice * p_size AS DOUBLE) AS inventory_value
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d)
      .select(col("p_partkey"), upper(col("p_type")).as("type_u"),
        (col("p_retailprice") * col("p_size")).cast("double").as("inventory_value"))
      .orderBy("p_partkey")
  }

  /** P2+P3: comparison/boolean filters, BETWEEN, IN, LIKE, RLIKE — all
    * pushable predicates except the regex (evaluated post-scan). */
  val filterPredicates: Q = Q(
    """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
      |WHERE p_size BETWEEN 10 AND 40
      |  AND p_brand IN ('Brand#1','Brand#5','Brand#13')
      |  AND (p_type LIKE 'S%' OR regexp_matches(p_name, 'widget|bolt'))
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d)
      .filter(col("p_size").between(10, 40)
        && col("p_brand").isin("Brand#1", "Brand#5", "Brand#13")
        && (col("p_type").like("S%") || col("p_name").rlike("widget|bolt")))
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
      .orderBy("p_partkey")
  }

  /** P4+P5: CASE WHEN, nullif/coalesce (manufactures+handles NULLs — the
    * fixtures have none), greatest/least, null predicates. */
  val conditionalProjection: Q = Q(
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus = 'F' THEN 'FINISHED'
      |       WHEN o_orderstatus = 'O' THEN 'OPEN' ELSE 'OTHER' END AS status_label,
      |  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
      |  (NULLIF(o_orderstatus, 'P') IS NULL) AS was_pending,
      |  CAST(GREATEST(o_totalprice, 100000.0) AS DOUBLE) AS capped_lo,
      |  CAST(LEAST(o_totalprice, 100000.0) AS DOUBLE) AS capped_hi
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", "FINISHED")
          .when(col("o_orderstatus") === "O", "OPEN")
          .otherwise("OTHER").as("status_label"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_norm"),
        nullif(col("o_orderstatus"), lit("P")).isNull.as("was_pending"),
        greatest(col("o_totalprice"), lit(100000.0)).cast("double").as("capped_lo"),
        least(col("o_totalprice"), lit(100000.0)).cast("double").as("capped_hi"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- J family

  private def revenue = {
    val ext  = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    sum(ext * (lit(1).cast("decimal(4,2)") - disc)).cast("double")
  }
  private val sqlRevenue =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"

  /** J1: broadcast hash join — `part` is a bounded dimension (≤20k rows at
    * sf0.1, ~200k at sf100); explicitly broadcast so the fact table never
    * shuffles. At 100 TB this is the difference between a map-side join and
    * a 100 TB exchange. */
  val joinBroadcast: Q = Q(
    s"""SELECT p_brand, COUNT(*) AS n_items, $sqlRevenue AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"), revenue.as("revenue"))
      .orderBy("p_brand")
  }

  /** J2: sort-merge join — the fact⋈fact shape (lineitem⋈orders). SMJ
    * shuffles both sides by key then merges; the right default when both
    * sides are large. AQE can still downgrade to broadcast at runtime if a
    * side turns out small. */
  val joinSortMerge: Q = Q(
    s"""SELECT o_orderpriority, COUNT(*) AS n_items,
       |  ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    lineitem(s, d).hint("merge")
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** J3: shuffled hash join — same SQL semantics as J2, different physical
    * strategy (no sort; builds a hash map per partition). Good for joins
    * where one side is much smaller per key but too big to broadcast. */
  val joinShuffleHash: Q = Q(
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total_value
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    orders(s, d).hint("shuffle_hash")
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_value"))
      .orderBy("c_mktsegment")
  }

  /** J4: left outer join, preserving customers with zero orders. */
  val joinLeftOuter: Q = Q(
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 0.0) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** J5: left semi join = EXISTS. Only customer columns survive; Spark
    * stops probing each key at first match (no fan-out). */
  val joinSemi: Q = Q(
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** J6: left anti join = NOT EXISTS (customers with no finished order). */
  val joinAnti: Q = Q(
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** J7: cross join — only ever sane on bounded dims (5×25 here). */
  val joinCross: Q = Q(
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    region(s, d).crossJoin(nation(s, d))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")
  }

  // ---------------------------------------------------------------- A family

  /** A1 (global form): ungrouped aggregate — partial aggregation reduces
    * every partition to one row before the single-row exchange. */
  val aggGlobal: Q = Q(
    s"""SELECT COUNT(*) AS n_rows,
       |  ${sqlDsum("l_extendedprice")} AS sum_price,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
       |FROM lineitem""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .agg(count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("sum_price"),
        davg(col("l_quantity")).as("avg_qty"),
        min(col("l_shipdate")).as("min_ship"), max(col("l_shipdate")).as("max_ship"))
  }

  /** A3: exact COUNT(DISTINCT), single and multi-column (via a canonical
    * tuple encoding both engines agree on). Distinct agg = two-phase
    * shuffle (dedup then count) — Spark plans Expand for mixed distinct. */
  val countDistinctQ: Q = Q(
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT CONCAT_WS('#', l_partkey, l_suppkey)) AS n_part_supp
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(concat_ws("#", col("l_partkey"), col("l_suppkey"))).as("n_part_supp"))
      .orderBy("l_returnflag")
  }

  /** A5a: ROLLUP with grouping_id — subtotal rows carry NULL keys, so the
    * final sort is explicit about null placement in both engines. */
  val rollupQ: Q = Q(
    s"""SELECT l_returnflag, l_linestatus,
       |  GROUPING(l_returnflag, l_linestatus) AS gid,
       |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** A5b: CUBE over two order dimensions. */
  val cubeQ: Q = Q(
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total_value
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
    orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total_value"))
      .select("o_orderstatus", "o_orderpriority", "gid", "n", "total_value")
      .orderBy(col("gid"), asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  /** A4: approximate count-distinct (HyperLogLog++). The estimate is
    * engine-specific, so the graded columns are the EXACT distinct count
    * (oracle-checkable) plus a `within_tol` boolean proving in-query
    * that the HLL++ estimate at rsd=0.02 lands within 6% (3σ) of exact —
    * the oracle asserts literal TRUE. The unit spec additionally bounds
    * the estimate at ±5%. */
  val approxDistinct: Q = Q(
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_tol
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("ap") - col("exact_parts")).cast("double") <=
          lit(0.06) * col("exact_parts").cast("double")).as("within_tol"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------- O family

  /** O1+O2: multi-key total-order sort + global top-k. Spark plans
    * TakeOrderedAndProject: per-partition heap of k, then k-way driver
    * merge — never a full global sort at scale. */
  val topK: Q = Q(
    """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin) { (s, d) =>
    orders(s, d)
      .select("o_orderkey", "o_totalprice", "o_orderdate")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
  }

  /** O3a: UNION ALL (bag semantics) across two sources, then re-aggregated. */
  val unionAllQ: Q = Q(
    """SELECT nk, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nk FROM supplier
      |) GROUP BY nk ORDER BY nk""".stripMargin) { (s, d) =>
    customer(s, d).select(col("c_nationkey").as("nk"))
      .unionAll(supplier(s, d).select(col("s_nationkey").as("nk")))
      .groupBy("nk").agg(count(lit(1)).as("n"))
      .orderBy("nk")
  }

  /** O3b: UNION DISTINCT (set semantics). */
  val unionDistinctQ: Q = Q(
    """SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
      |UNION
      |SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000
      |ORDER BY nk""".stripMargin) { (s, d) =>
    customer(s, d).filter(col("c_acctbal") > 9000).select(col("c_nationkey").as("nk"))
      .union(supplier(s, d).filter(col("s_acctbal") > 9000).select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")
  }

  /** O4a: INTERSECT (distinct) of two derived key sets. */
  val intersectQ: Q = Q(
    """SELECT p_partkey AS k FROM part WHERE p_size > 25
      |INTERSECT
      |SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 40
      |ORDER BY k""".stripMargin) { (s, d) =>
    part(s, d).filter(col("p_size") > 25).select(col("p_partkey").as("k"))
      .intersect(lineitem(s, d).filter(col("l_quantity") > 40).select(col("l_partkey").as("k")))
      .orderBy("k")
  }

  /** O4b: EXCEPT (distinct) — parts never shipped in large quantity. */
  val exceptQ: Q = Q(
    """SELECT p_partkey AS k FROM part
      |EXCEPT
      |SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 40
      |ORDER BY k""".stripMargin) { (s, d) =>
    part(s, d).select(col("p_partkey").as("k"))
      .except(lineitem(s, d).filter(col("l_quantity") > 40).select(col("l_partkey").as("k")))
      .orderBy("k")
  }

  /** O4c: EXCEPT ALL — multiset difference preserves multiplicity. */
  val exceptAllQ: Q = Q(
    """SELECT l_partkey AS k FROM lineitem WHERE l_quantity >= 48
      |EXCEPT ALL
      |SELECT l_partkey AS k FROM lineitem WHERE l_quantity <= 3
      |ORDER BY k""".stripMargin) { (s, d) =>
    lineitem(s, d).filter(col("l_quantity") >= 48).select(col("l_partkey").as("k"))
      .exceptAll(lineitem(s, d).filter(col("l_quantity") <= 3).select(col("l_partkey").as("k")))
      .orderBy("k")
  }

  /** O4d: INTERSECT ALL. */
  val intersectAllQ: Q = Q(
    """SELECT l_partkey AS k FROM lineitem WHERE l_quantity >= 45
      |INTERSECT ALL
      |SELECT l_partkey AS k FROM lineitem WHERE l_discount >= 0.05
      |ORDER BY k""".stripMargin) { (s, d) =>
    lineitem(s, d).filter(col("l_quantity") >= 45).select(col("l_partkey").as("k"))
      .intersectAll(lineitem(s, d).filter(col("l_discount") >= 0.05).select(col("l_partkey").as("k")))
      .orderBy("k")
  }

  override def queries: Seq[(String, Q)] = Seq(
    "q01_pricing_summary"   -> pricingSummary,
    "q02_project_compute"   -> projectCompute,
    "q03_filter_predicates" -> filterPredicates,
    "q04_conditional"       -> conditionalProjection,
    "q05_join_broadcast"    -> joinBroadcast,
    "q06_join_sortmerge"    -> joinSortMerge,
    "q07_join_shuffle_hash" -> joinShuffleHash,
    "q08_join_left_outer"   -> joinLeftOuter,
    "q09_join_semi"         -> joinSemi,
    "q10_join_anti"         -> joinAnti,
    "q11_join_cross"        -> joinCross,
    "q12_agg_global"        -> aggGlobal,
    "q13_count_distinct"    -> countDistinctQ,
    "q14_rollup"            -> rollupQ,
    "q15_cube"              -> cubeQ,
    "q16_approx_distinct"   -> approxDistinct,
    "q17_topk"              -> topK,
    "q18_union_all"         -> unionAllQ,
    "q19_union_distinct"    -> unionDistinctQ,
    "q20_intersect"         -> intersectQ,
    "q21_except"            -> exceptQ,
    "q22_except_all"        -> exceptAllQ,
    "q23_intersect_all"     -> intersectAllQ
  )
}
