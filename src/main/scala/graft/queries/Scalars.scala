package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._
import Dsl._

/** Scalar function families (SURVEY.md §2.7): string, date/time, math,
  * array (higher-order), JSON, map. One composite query per family, all
  * whole-stage-codegen'd built-ins — no UDFs in these paths.
  */
object Scalars extends QueryModule {

  /** String family. regexp_replace: Spark replaces all matches; DuckDB
    * needs the 'g' flag to do the same. split-index is 0-based in Spark,
    * 1-based in DuckDB lists. initcap exists only in Spark → unit-tested,
    * not oracled. */
  val stringFuncs: Q = Q(
    """SELECT p_partkey,
      |  UPPER(p_name) AS up, LOWER(p_type) AS lo,
      |  SUBSTRING(p_name, 1, 5) AS sub5,
      |  LENGTH(p_name) AS len,
      |  TRIM(' x' || p_brand || ' ') AS trimmed,
      |  LPAD(p_brand, 12, '*') AS padded,
      |  CONCAT_WS('|', p_brand, p_type) AS joined,
      |  string_split(p_name, ' ')[1] AS tok0,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  levenshtein(p_name, p_type) AS lev,
      |  translate(p_name, 'aeiou', 'AEIOU') AS trans
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    part(s, d).select(col("p_partkey"),
        upper(col("p_name")).as("up"), lower(col("p_type")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub5"),
        length(col("p_name")).as("len"),
        trim(concat_ws("", lit(" x"), col("p_brand"), lit(" "))).as("trimmed"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        split(col("p_name"), " ").getItem(0).as("tok0"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        levenshtein(col("p_name"), col("p_type")).as("lev"),
        translate(col("p_name"), "aeiou", "AEIOU").as("trans"))
      .orderBy("p_partkey")
  }

  /** Date/time family. dayofweek is Sun=1 in Spark, Sun=0 in DuckDB —
    * normalized in the oracle SQL. */
  val dateFuncs: Q = Q(
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  dayofmonth(o_orderdate) AS dom,
      |  dayofweek(o_orderdate) + 1 AS dow,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  CAST(o_orderdate AS DATE) + 30 AS plus30,
      |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec,
      |  make_date(2020, month(o_orderdate), dayofmonth(o_orderdate)) AS md
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    orders(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).as("days_since"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        unix_timestamp(col("o_orderdate")).as("unix_sec"),
        make_date(lit(2020), month(col("o_orderdate")), dayofmonth(col("o_orderdate"))).as("md"))
      .orderBy("o_orderkey")
  }

  /** Math family. Avoids the cross-engine landmines: no round() on
    * midpoint-prone money values (half-up-on-string vs half-even-on-binary),
    * x*x instead of pow (pow is not correctly-rounded in either libm),
    * round(ln,6) absorbs last-ulp libm differences. */
  val mathFuncs: Q = Q(
    """SELECT l_orderkey, l_linenumber,
      |  CAST(abs(l_discount - 0.05) AS DOUBLE) AS absd,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceilp,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS floorp,
      |  CAST(sqrt(l_quantity) AS DOUBLE) AS sqrtq,
      |  CAST(l_quantity * l_quantity AS DOUBLE) AS sqq,
      |  ROUND(CAST(ln(l_extendedprice) AS DOUBLE), 6) AS lnp,
      |  CAST(sign(l_discount - 0.05) AS INT) AS sgn,
      |  l_orderkey % 7 AS m7
      |FROM lineitem WHERE l_orderkey < 500
      |ORDER BY l_orderkey, l_linenumber, absd, ceilp, floorp, sqrtq, sqq, lnp, sgn, m7""".stripMargin) { (s, d) =>
    lineitem(s, d).filter(col("l_orderkey") < 500)
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).cast("double").as("absd"),
        ceil(col("l_extendedprice")).cast("long").as("ceilp"),
        floor(col("l_extendedprice")).cast("long").as("floorp"),
        sqrt(col("l_quantity")).cast("double").as("sqrtq"),
        (col("l_quantity") * col("l_quantity")).cast("double").as("sqq"),
        round(log(col("l_extendedprice")), 6).as("lnp"),
        signum(col("l_discount") - 0.05).cast("int").as("sgn"),
        pmod(col("l_orderkey"), lit(7)).as("m7"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture lineitem
      // — sort on the FULL output row so the dump order is total (tied
      // keys with different payloads would otherwise interleave
      // engine-dependently)
      .orderBy("l_orderkey", "l_linenumber", "absd", "ceilp", "floorp",
        "sqrtq", "sqq", "lnp", "sgn", "m7")
  }

  /** Array / higher-order family over the embedding vectors: lambda
    * transform + fold (dot product) stays inside codegen; float math is
    * widened to double BEFORE accumulating, sequentially left-to-right in
    * both engines. */
  val arrayFuncs: Q = Q(
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  CAST(sqrt(list_sum(list_transform(embedding,
      |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS DOUBLE) AS l2,
      |  array_to_string(list_sort([vec_id % 7, vec_id % 5, vec_id % 3]), ',') AS arr_sorted,
      |  array_to_string(list_sort(list_distinct([vec_id % 3, vec_id % 3, vec_id % 2])), ',') AS arr_distinct
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
    embeddings(s, d).select(col("vec_id"),
        size(col("embedding")).as("dim"),
        sqrt(aggregate(transform(col("embedding"), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x * x)).cast("double").as("l2"),
        array_join(sort_array(array(col("vec_id") % 7, col("vec_id") % 5, col("vec_id") % 3)), ",")
          .as("arr_sorted"),
        array_join(sort_array(array_distinct(array(col("vec_id") % 3, col("vec_id") % 3, col("vec_id") % 2))), ",")
          .as("arr_distinct"))
      .orderBy("vec_id")
  }

  /** JSON family over events.props ({"k": <int>}): extraction (string and
    * typed), struct round-trip, and a grouped aggregate over the extracted
    * value. */
  val jsonFuncs: Q = Q(
    """SELECT k_bucket, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT CAST(props->>'$.k' AS INT) % 10 AS k_bucket, value FROM events)
      |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin) { (s, d) =>
    events(s, d)
      .select((get_json_object(col("props"), "$.k").cast("int") % 10).as("k_bucket"), col("value"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("k_bucket")
  }

  /** JSON → typed struct/map path: from_json with an explicit schema, map
    * access, and to_json round-trip (formats agree: {"k":87}). */
  val jsonStructMap: Q = Q(
    """SELECT event_id,
      |  CAST(props->>'$.k' AS INT) AS k_typed,
      |  props->>'$.k' AS k_str,
      |  '{"k":' || (props->>'$.k') || '}' AS rt,
      |  1 AS n_keys
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, d) =>
    val kSchema = org.apache.spark.sql.types.StructType.fromDDL("k INT")
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType))
    events(s, d).filter(col("event_id") < 200)
      .select(col("event_id"),
        from_json(col("props"), kSchema).getField("k").as("k_typed"),
        get_json_object(col("props"), "$.k").as("k_str"),
        to_json(from_json(col("props"), kSchema)).as("rt"),
        size(map_keys(m)).as("n_keys"))
      .orderBy("event_id")
  }

  override def queries: Seq[(String, Q)] = Seq(
    "q40_string_funcs" -> stringFuncs,
    "q41_date_funcs"   -> dateFuncs,
    "q42_math_funcs"   -> mathFuncs,
    "q43_array_funcs"  -> arrayFuncs,
    "q44_json_agg"     -> jsonFuncs,
    "q45_json_struct"  -> jsonStructMap
  )
}
