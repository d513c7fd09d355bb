package graft.fuzz

import scala.util.Random

/** Seeded differential query generator (SURVEY.md §2 assurance tooling).
  *
  * Emits random-but-bounded SQL over the fixture schemas in the dialect
  * subset that Spark SQL and DuckDB evaluate identically. The SAME text is
  * executed by both engines (Spark via `spark.sql` in [[graft.FuzzVerify]],
  * DuckDB via `scripts/oracle_check.py`), so any value/schema/row mismatch
  * is a genuine dialect divergence — exactly the class of bug hand-written
  * oracle queries systematically avoid because their author knows the edges.
  *
  * The grammar is constructive: every known Spark↔DuckDB divergence is
  * mitigated at the generation site rather than filtered after the fact.
  * The catalog of mitigations (each discovered in rounds 1–4 or during
  * fuzzer bring-up, and each re-verified by the fuzzer's own runs):
  *
  *  M1  SUM(BIGINT) → `CAST(SUM(x) AS BIGINT)`: DuckDB widens to HUGEINT
  *      (int128 → arrow decimal), Spark stays BIGINT.
  *  M2  SUM over doubles → `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`:
  *      float accumulation is reassociation-sensitive; decimal is exact and
  *      order-independent (the repo-wide R2 rule).
  *  M3  AVG → never generated; spelled `CAST(SUM(dec)/COUNT AS DOUBLE)`:
  *      engines disagree on the accumulation algorithm and result type.
  *  M4  FLOOR/CEIL → wrapped `CAST(... AS BIGINT)`: DuckDB returns DOUBLE,
  *      Spark returns BIGINT.
  *  M5  CAST(double AS integer) → never: Spark truncates toward zero,
  *      DuckDB rounds half-even. Integerizing goes through FLOOR/CEIL.
  *  M6  every ORDER BY key carries explicit ASC/DESC + NULLS FIRST/LAST:
  *      Spark defaults NULLS FIRST on ASC, DuckDB defaults NULLS LAST.
  *  M7  division only by `COUNT(*)` (>0 in a group) or `NULLIF(x, 0)`:
  *      x/0 is NULL in non-ANSI Spark but an error in DuckDB.
  *  M8  string concat via `||`, never CONCAT(): DuckDB's CONCAT skips
  *      NULLs, Spark's returns NULL.
  *  M9  integer arithmetic operands bounded with `% k` before `*`:
  *      Spark (non-ANSI) wraps int64 overflow silently, DuckDB promotes
  *      or errors.
  *  M10 day-of-week / week-of-year → excluded: 1-based-Sunday (Spark) vs
  *      0-based-Sunday (DuckDB); the normalized form is covered by q41.
  *  M11 LIMIT only under a total ORDER BY (unique key in the sort).
  *  M12 ROUND on raw doubles → only at scale ≤ 2 on money-like 2-decimal
  *      fixture columns (exactly representable halves are already settled);
  *      general double rounding differs at representation boundaries
  *      (Spark rounds the decimal string, DuckDB the binary value).
  *  M13 GROUP BY / ORDER BY by ordinal, aliases on every output column:
  *      alias-visibility rules differ; ordinals are common ground.
  *  M14 no implicit string↔number casts; comparisons are same-type only.
  *
  * Determinism: a case is fully determined by (seed, index); the ScalaTest
  * suite and the DuckDB script see byte-identical SQL.
  */
object QueryGen {

  sealed trait T
  case object TLong extends T
  case object TDouble extends T
  case object TString extends T
  case object TTs extends T

  final case class Col(name: String, t: T)
  /** enums: string columns with a small known domain (IN-list literals). */
  final case class Tbl(
      name: String,
      key: Seq[String],
      cols: Seq[Col],
      enums: Map[String, Seq[String]]) {
    def of(t: T): Seq[Col] = cols.filter(_.t == t)
  }

  val lineitem = Tbl("lineitem", Seq("l_orderkey", "l_linenumber"),
    Seq(Col("l_orderkey", TLong), Col("l_partkey", TLong), Col("l_suppkey", TLong),
      Col("l_linenumber", TLong), Col("l_quantity", TDouble),
      Col("l_extendedprice", TDouble), Col("l_discount", TDouble), Col("l_tax", TDouble),
      Col("l_returnflag", TString), Col("l_linestatus", TString), Col("l_shipdate", TTs)),
    Map("l_returnflag" -> Seq("N", "A", "R"), "l_linestatus" -> Seq("O", "F")))

  val orders = Tbl("orders", Seq("o_orderkey"),
    Seq(Col("o_orderkey", TLong), Col("o_custkey", TLong), Col("o_orderstatus", TString),
      Col("o_totalprice", TDouble), Col("o_orderdate", TTs), Col("o_orderpriority", TString)),
    Map("o_orderstatus" -> Seq("P", "O", "F")))

  val customer = Tbl("customer", Seq("c_custkey"),
    Seq(Col("c_custkey", TLong), Col("c_name", TString), Col("c_nationkey", TLong),
      Col("c_acctbal", TDouble), Col("c_mktsegment", TString)),
    Map.empty)

  val part = Tbl("part", Seq("p_partkey"),
    Seq(Col("p_partkey", TLong), Col("p_name", TString), Col("p_brand", TString),
      Col("p_type", TString), Col("p_size", TLong), Col("p_retailprice", TDouble)),
    Map.empty)

  val supplier = Tbl("supplier", Seq("s_suppkey"),
    Seq(Col("s_suppkey", TLong), Col("s_name", TString), Col("s_nationkey", TLong),
      Col("s_acctbal", TDouble)),
    Map.empty)

  val events = Tbl("events", Seq("event_id"),
    Seq(Col("event_id", TLong), Col("ts", TTs), Col("user_id", TLong),
      Col("event_type", TString), Col("value", TDouble), Col("props", TString)),
    Map.empty)

  val documents = Tbl("documents", Seq("doc_id"),
    Seq(Col("doc_id", TLong), Col("text", TString), Col("lang", TString),
      Col("source", TString), Col("n_chars", TLong)),
    Map.empty)

  val tables: Seq[Tbl] = Seq(lineitem, orders, customer, part, supplier, events, documents)

  /** FK edges for the join shape: (left tbl, left col, right tbl, right col).
    * Right side is the PK side (unique), so inner/left joins stay bounded. */
  val fks: Seq[(Tbl, String, Tbl, String)] = Seq(
    (lineitem, "l_orderkey", orders, "o_orderkey"),
    (lineitem, "l_partkey", part, "p_partkey"),
    (lineitem, "l_suppkey", supplier, "s_suppkey"),
    (orders, "o_custkey", customer, "c_custkey"))

  final case class FuzzCase(name: String, sql: String)

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  /** M15 (found BY this fuzzer, round 5): the fixture "keys" are not unique —
    * sf0.001 lineitem has 1161 duplicate (l_orderkey, l_linenumber) groups —
    * so ordering by them is NOT total and LIMIT cuts / tie orders / window
    * frames diverge between engines. The generator therefore breaks every
    * tie with ALL table columns: ties then exist only between fully
    * identical rows, for which any engine-chosen order or boundary cut
    * yields the identical multiset of output rows. */
  private def tie(tb: Tbl, prefix: String = ""): String =
    tb.cols.map(c => s"$prefix${c.name} ASC NULLS LAST").mkString(", ")

  // ---------------------------------------------------------------------
  // typed expression generators — all emit SQL text valid in both dialects
  // ---------------------------------------------------------------------

  /** exact integer expression; null-injection via NULLIF at the leaves. */
  private def longE(r: Random, tb: Tbl, depth: Int, prefix: String = ""): String = {
    val cols = tb.of(TLong)
    def col() = prefix + pick(r, cols).name
    if (depth <= 0 || r.nextInt(3) == 0) {
      r.nextInt(4) match {
        case 0 => col()
        case 1 => (1 + r.nextInt(100)).toString
        case 2 => s"NULLIF(${col()} % ${2 + r.nextInt(7)}, ${r.nextInt(3)})" // null injection
        case _ => s"(${col()} % ${2 + r.nextInt(96)})"
      }
    } else r.nextInt(7) match {
      case 0 => s"(${longE(r, tb, depth - 1, prefix)} + ${longE(r, tb, depth - 1, prefix)})"
      case 1 => s"(${longE(r, tb, depth - 1, prefix)} - ${longE(r, tb, depth - 1, prefix)})"
      // M9: both operands bounded before multiply
      case 2 => s"((${longE(r, tb, 0, prefix)} % 10000) * ${1 + r.nextInt(50)})"
      case 3 => s"ABS(${longE(r, tb, depth - 1, prefix)})"
      case 4 => s"${pick(r, Seq("GREATEST", "LEAST"))}(${longE(r, tb, depth - 1, prefix)}, ${longE(r, tb, depth - 1, prefix)})"
      case 5 => s"LENGTH(${strE(r, tb, 0, prefix)})"
      case 6 =>
        val ts = tb.of(TTs)
        if (ts.isEmpty) s"(${col()} % 7)"
        else s"${pick(r, Seq("YEAR", "MONTH", "DAY", "HOUR"))}($prefix${pick(r, ts).name})"
    }
  }

  /** double expression: same parse tree → same IEEE ops on both engines. */
  private def dblE(r: Random, tb: Tbl, depth: Int, prefix: String = ""): String = {
    val cols = tb.of(TDouble)
    if (cols.isEmpty) return s"CAST(${longE(r, tb, 0, prefix)} AS DOUBLE)"
    def col() = prefix + pick(r, cols).name
    if (depth <= 0 || r.nextInt(3) == 0) col()
    else r.nextInt(5) match {
      case 0 => s"(${dblE(r, tb, depth - 1, prefix)} + ${dblE(r, tb, depth - 1, prefix)})"
      case 1 => s"(${col()} * ${1 + r.nextInt(9)})"
      case 2 => s"ABS((${dblE(r, tb, depth - 1, prefix)} - ${dblE(r, tb, depth - 1, prefix)}))"
      case 3 => s"ROUND(${col()}, ${1 + r.nextInt(2)})" // M12: raw 2-decimal cols only
      case _ => s"(0 - ${col()})"
    }
  }

  /** integerized double — the only double→int path (M4/M5). */
  private def intOfDbl(r: Random, tb: Tbl, prefix: String = ""): String =
    s"CAST(${pick(r, Seq("FLOOR", "CEIL"))}(${dblE(r, tb, 1, prefix)}) AS BIGINT)"

  private def strE(r: Random, tb: Tbl, depth: Int, prefix: String = ""): String = {
    val cols = tb.of(TString)
    def col() = prefix + pick(r, cols).name
    if (depth <= 0 || r.nextInt(3) == 0) col()
    else r.nextInt(6) match {
      case 0 => s"UPPER(${strE(r, tb, depth - 1, prefix)})"
      case 1 => s"LOWER(${strE(r, tb, depth - 1, prefix)})"
      case 2 => s"SUBSTR(${strE(r, tb, depth - 1, prefix)}, ${1 + r.nextInt(3)}, ${1 + r.nextInt(8)})"
      case 3 => s"(${strE(r, tb, 0, prefix)} || '_' || ${strE(r, tb, 0, prefix)})" // M8
      case 4 => s"TRIM(${strE(r, tb, depth - 1, prefix)})"
      case _ => s"REPLACE(${strE(r, tb, depth - 1, prefix)}, '${"aeiou".charAt(r.nextInt(5))}', '${r.nextInt(10)}')"
    }
  }

  private def predE(r: Random, tb: Tbl, depth: Int, prefix: String = ""): String = {
    if (depth > 0 && r.nextInt(3) == 0) {
      val op = pick(r, Seq("AND", "OR"))
      val neg = if (r.nextInt(4) == 0) "NOT " else ""
      return s"$neg(${predE(r, tb, depth - 1, prefix)} $op ${predE(r, tb, depth - 1, prefix)})"
    }
    r.nextInt(7) match {
      case 0 =>
        s"${longE(r, tb, 1, prefix)} ${pick(r, Seq("<", "<=", ">", ">=", "=", "<>"))} ${longE(r, tb, 1, prefix)}"
      case 1 =>
        s"${dblE(r, tb, 1, prefix)} ${pick(r, Seq("<", ">"))} ${100 + r.nextInt(90000)}.${r.nextInt(100)}"
      case 2 =>
        val sc = tb.of(TString)
        val c = pick(r, sc).name
        tb.enums.get(c) match {
          case Some(dom) =>
            val in = r.shuffle(dom).take(1 + r.nextInt(dom.size)).map(v => s"'$v'").mkString(", ")
            s"$prefix$c IN ($in)"
          case None =>
            val pat = pick(r, Seq("%1%", "%a%", "%er%", "C%", "%0", "%#%", "%e%"))
            val neg = if (r.nextInt(4) == 0) "NOT " else ""
            s"$prefix$c ${neg}LIKE '$pat'"
        }
      case 3 =>
        val lo = r.nextInt(5000); val hi = lo + 1 + r.nextInt(5000)
        s"${longE(r, tb, 0, prefix)} BETWEEN $lo AND $hi"
      case 4 =>
        s"NULLIF(${longE(r, tb, 0, prefix)}, ${r.nextInt(5)}) IS ${if (r.nextBoolean()) "" else "NOT "}NULL"
      case 5 =>
        val ts = tb.of(TTs)
        if (ts.isEmpty) s"${longE(r, tb, 0, prefix)} > ${r.nextInt(500)}"
        else {
          val c = prefix + pick(r, ts).name
          if (tb.name == "events")
            s"$c ${pick(r, Seq("<", ">="))} TIMESTAMP '2024-01-${10 + r.nextInt(15)} 00:00:00'"
          else {
            val y = 1995 + r.nextInt(6); val m = 1 + r.nextInt(12)
            s"$c ${pick(r, Seq("<", ">="))} TIMESTAMP '$y-${f"$m%02d"}-01 00:00:00'"
          }
        }
      case _ =>
        s"${strE(r, tb, 1, prefix)} ${pick(r, Seq("<", ">", "=", "<>"))} ${strE(r, tb, 1, prefix)}"
    }
  }

  /** a grouping key: low-cardinality, alias-ready. */
  private def groupKeyE(r: Random, tb: Tbl, prefix: String = ""): String =
    r.nextInt(5) match {
      case 0 =>
        val sc = tb.of(TString)
        val c = pick(r, sc).name
        if (tb.enums.contains(c) || Seq("lang", "source", "event_type", "c_mktsegment", "p_brand", "o_orderpriority").contains(c)) prefix + c
        else s"SUBSTR($prefix$c, 1, ${1 + r.nextInt(2)})"
      case 1 => s"(${longE(r, tb, 0, prefix)} % ${2 + r.nextInt(9)})"
      case 2 =>
        val ts = tb.of(TTs)
        if (ts.isEmpty) s"(${longE(r, tb, 0, prefix)} % 5)"
        else s"${pick(r, Seq("YEAR", "MONTH"))}($prefix${pick(r, ts).name})"
      case 3 => s"NULLIF(${longE(r, tb, 0, prefix)} % ${3 + r.nextInt(5)}, 1)" // null group
      case _ => s"CASE WHEN ${predE(r, tb, 0, prefix)} THEN 'hit' ELSE 'miss' END"
    }

  /** aggregate over the table, dialect-mitigated (M1/M2/M3). */
  private def aggE(r: Random, tb: Tbl, alias: String, prefix: String = ""): String =
    r.nextInt(8) match {
      case 0 => s"COUNT(*) AS $alias"
      case 1 => s"CAST(SUM(${longE(r, tb, 1, prefix)}) AS BIGINT) AS $alias" // M1
      case 2 => s"CAST(SUM(CAST(${dblE(r, tb, 1, prefix)} AS DECIMAL(18,4))) AS DOUBLE) AS $alias" // M2
      case 3 => s"MIN(${strE(r, tb, 1, prefix)}) AS $alias"
      case 4 => s"MAX(${longE(r, tb, 1, prefix)}) AS $alias"
      case 5 => s"COUNT(DISTINCT ${longE(r, tb, 1, prefix)}) AS $alias"
      case 6 => // M3: avg spelled exactly
        s"(CAST(SUM(CAST(${dblE(r, tb, 0, prefix)} AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) AS $alias"
      case _ => s"COUNT(${pick(r, Seq("", "DISTINCT ")) + s"NULLIF(${longE(r, tb, 0, prefix)} % 7, 2)"}) AS $alias"
    }

  /** M6: explicit direction + null placement on every key. */
  private def orderBy(r: Random, keys: Seq[String]): String =
    keys.map { k =>
      val dir = if (r.nextBoolean()) "ASC" else "DESC"
      val nulls = if (r.nextBoolean()) "NULLS FIRST" else "NULLS LAST"
      s"$k $dir $nulls"
    }.mkString("ORDER BY ", ", ", "")

  // ---------------------------------------------------------------------
  // shapes
  // ---------------------------------------------------------------------

  private def shapeFilterProject(r: Random): String = {
    val tb = pick(r, tables)
    val exprs = Seq(
      s"${longE(r, tb, 2)} AS e1",
      s"${strE(r, tb, 2)} AS e2",
      s"${intOfDbl(r, tb)} AS e3") ++
      (if (r.nextBoolean()) Seq(s"CASE WHEN ${predE(r, tb, 1)} THEN ${longE(r, tb, 1)} ELSE NULL END AS e4") else Nil)
    val keyCols = tb.key.mkString(", ")
    val ord = orderBy(r, (1 to exprs.size).map(i => i.toString))
    s"""SELECT ${exprs.mkString(", ")}, $keyCols FROM ${tb.name}
       |WHERE ${predE(r, tb, 2)}
       |$ord, ${tie(tb)} LIMIT 1000""".stripMargin
  }

  private def shapeAgg(r: Random): String = {
    val tb = pick(r, tables)
    val nk = 1 + r.nextInt(2)
    val keys = (1 to nk).map(i => s"${groupKeyE(r, tb)} AS g$i")
    val aggs = (1 to (2 + r.nextInt(3))).map(i => aggE(r, tb, s"a$i"))
    val having = if (r.nextInt(3) == 0) s"HAVING COUNT(*) > ${r.nextInt(4)}" else ""
    s"""SELECT ${(keys ++ aggs).mkString(", ")} FROM ${tb.name}
       |WHERE ${predE(r, tb, 1)}
       |GROUP BY ${(1 to nk).mkString(", ")} $having
       |${orderBy(r, (1 to nk).map(_.toString))}""".stripMargin
  }

  private def shapeJoinAgg(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, fks)
    val joinType = pick(r, Seq("JOIN", "LEFT JOIN"))
    val l = "l."; val rr = "r."
    val keys = Seq(s"${groupKeyE(r, lt, l)} AS g1") ++
      (if (r.nextBoolean()) Seq(s"${groupKeyE(r, rt, rr)} AS g2") else Nil)
    val nk = keys.size
    // aggregates over BOTH sides; right side is NULL-bearing under LEFT JOIN
    val aggs = Seq(
      "COUNT(*) AS cnt",
      s"CAST(SUM(${longE(r, rt, 1, rr)}) AS BIGINT) AS a1",
      s"CAST(SUM(CAST(${dblE(r, lt, 1, l)} AS DECIMAL(18,4))) AS DOUBLE) AS a2",
      s"COUNT(${rr}${rt.key.head}) AS a3")
    val wpred = predE(r, lt, 1, l)
    val onExtra = if (joinType == "JOIN" && r.nextBoolean()) s" AND ${predE(r, rt, 0, rr)}" else ""
    s"""SELECT ${(keys ++ aggs).mkString(", ")}
       |FROM ${lt.name} l $joinType ${rt.name} r ON l.$lc = r.$rc$onExtra
       |WHERE $wpred
       |GROUP BY ${(1 to nk).mkString(", ")}
       |${orderBy(r, (1 to nk).map(_.toString))}""".stripMargin
  }

  private def shapeSetOp(r: Random): String = {
    val tb = pick(r, tables)
    val op = pick(r, Seq("UNION ALL", "UNION", "INTERSECT", "EXCEPT"))
    val proj = Seq(s"${groupKeyE(r, tb)} AS c1", s"${longE(r, tb, 1)} AS c2")
    def side(p: String) =
      s"SELECT ${proj.mkString(", ")} FROM ${tb.name} WHERE $p"
    val sql = s"${side(predE(r, tb, 1))} $op ${side(predE(r, tb, 1))}"
    s"""SELECT * FROM ($sql) u
       |ORDER BY c1 ASC NULLS FIRST, c2 ASC NULLS FIRST LIMIT 2000""".stripMargin
  }

  private def shapeWindow(r: Random): String = {
    val tb = pick(r, tables)
    val p = groupKeyE(r, tb)
    val o = pick(r, Seq(longE(r, tb, 1), dblE(r, tb, 1), strE(r, tb, 1)))
    // M15: full-column tiebreak — the frame order must be total (up to
    // identical rows) or ROW_NUMBER / running sums diverge between engines.
    val win = s"PARTITION BY $p ORDER BY $o ASC NULLS LAST, ${tie(tb)}"
    val rankFn = pick(r, Seq("ROW_NUMBER()", "RANK()", "DENSE_RANK()"))
    val runAgg =
      s"CAST(SUM(CAST(${dblE(r, tb, 0)} AS DECIMAL(18,4))) OVER ($win ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
    val k = 2 + r.nextInt(5)
    val outTie = (tb.key :+ "run").map(c => s"$c ASC NULLS LAST").mkString(", ")
    s"""SELECT * FROM (
       |  SELECT ${tb.key.mkString(", ")}, $p AS grp,
       |         $rankFn OVER ($win) AS rnk,
       |         $runAgg AS run
       |  FROM ${tb.name} WHERE ${predE(r, tb, 1)}
       |) w WHERE rnk <= $k
       |ORDER BY grp ASC NULLS FIRST, rnk ASC NULLS LAST, $outTie LIMIT 2000""".stripMargin
  }

  private def shapeScalarGauntlet(r: Random): String = {
    val tb = pick(r, tables)
    val n = 6 + r.nextInt(4)
    val exprs = (1 to n).map { i =>
      val e = r.nextInt(5) match {
        case 0 => longE(r, tb, 3)
        case 1 => strE(r, tb, 3)
        case 2 => intOfDbl(r, tb)
        case 3 => s"COALESCE(NULLIF(${longE(r, tb, 1)}, ${r.nextInt(4)}), ${longE(r, tb, 0)})"
        case _ => s"CASE WHEN ${predE(r, tb, 1)} THEN ${strE(r, tb, 1)} WHEN ${predE(r, tb, 0)} THEN 'x' ELSE NULL END"
      }
      s"$e AS s$i"
    }
    val keyCols = tb.key.mkString(", ")
    // M15: row SELECTION (inner LIMIT) and output order both tie-break on
    // all columns, so the 300 surviving rows are engine-independent.
    s"""SELECT $keyCols, ${exprs.mkString(", ")}
       |FROM (SELECT * FROM ${tb.name} ORDER BY ${tie(tb)} LIMIT 300) t0
       |ORDER BY ${tie(tb)}""".stripMargin
  }

  private def shapeNested(r: Random): String = {
    if (r.nextBoolean()) {
      // agg of agg
      val tb = pick(r, Seq(lineitem, orders, events))
      val innerKey2 = pick(r, tb.of(TLong)).name
      s"""SELECT g, COUNT(*) AS n_groups, CAST(SUM(cnt) AS BIGINT) AS total,
         |       CAST(MAX(m) AS BIGINT) AS mx
         |FROM (
         |  SELECT ${groupKeyE(r, tb)} AS g, $innerKey2 AS k2, COUNT(*) AS cnt,
         |         MAX(${longE(r, tb, 1)}) AS m
         |  FROM ${tb.name} WHERE ${predE(r, tb, 1)} GROUP BY 1, 2
         |) t0
         |GROUP BY g ORDER BY g ASC NULLS FIRST""".stripMargin
    } else {
      // IN / NOT IN subquery over an FK — NOT IN only with non-null inner side
      val (lt, lc, rt, rc) = pick(r, fks)
      val neg = r.nextBoolean()
      val inner = s"SELECT $rc FROM ${rt.name} WHERE ${predE(r, rt, 1)}"
      s"""SELECT ${lt.key.mkString(", ")}, ${longE(r, lt, 1)} AS v
         |FROM ${lt.name} WHERE $lc ${if (neg) "NOT IN" else "IN"} ($inner)
         |ORDER BY ${tie(lt)} LIMIT 2000""".stripMargin
    }
  }

  // ---------------------------------------------------------------------
  // v2 grammar extensions. The v1 generators above are FROZEN: the graded
  // corpus slice (queries/Fuzzed.scala) pins SQL text by (seed, index)
  // into the v1 shape cycle, so v1 expression generators must never change
  // their RNG consumption. New function coverage therefore lives in
  // wrapper generators and NEW shapes, appended after the v1 list.
  // ---------------------------------------------------------------------

  /** v2 string functions (LEFT/RIGHT/REVERSE/REPEAT/LPAD/RPAD), falling
    * through to the v1 generator. All verified identical-dialect. */
  private def strE2(r: Random, tb: Tbl, depth: Int, prefix: String = ""): String =
    if (depth <= 0 || r.nextInt(3) == 0) strE(r, tb, depth, prefix)
    else r.nextInt(6) match {
      case 0 => s"LEFT(${strE2(r, tb, depth - 1, prefix)}, ${1 + r.nextInt(8)})"
      case 1 => s"RIGHT(${strE2(r, tb, depth - 1, prefix)}, ${1 + r.nextInt(8)})"
      case 2 => s"REVERSE(${strE2(r, tb, depth - 1, prefix)})"
      case 3 => s"REPEAT(${strE(r, tb, 0, prefix)}, 2)"
      case 4 => s"LPAD(${strE2(r, tb, depth - 1, prefix)}, ${4 + r.nextInt(10)}, '#')"
      case _ => s"RPAD(${strE2(r, tb, depth - 1, prefix)}, ${4 + r.nextInt(10)}, '.')"
    }

  /** v2 integer functions: POSITION (standard `IN` syntax, common to both
    * dialects) and ASCII (already used cross-engine by q171). */
  private def longE2(r: Random, tb: Tbl, depth: Int, prefix: String = ""): String =
    r.nextInt(4) match {
      case 0 => s"POSITION('${"aeiorst".charAt(r.nextInt(7))}' IN ${strE2(r, tb, 1, prefix)})"
      case 1 => s"ASCII(${strE2(r, tb, 1, prefix)})"
      case _ => longE(r, tb, depth, prefix)
    }

  /** v2 predicates: DATE_TRUNC equality and v2-expression comparisons. */
  private def predE2(r: Random, tb: Tbl, depth: Int, prefix: String = ""): String =
    r.nextInt(4) match {
      case 0 =>
        val ts = tb.of(TTs)
        if (ts.isEmpty) predE(r, tb, depth, prefix)
        else {
          val c = prefix + pick(r, ts).name
          val (unit, lit) =
            if (tb.name == "events") ("day", s"2024-01-${10 + r.nextInt(15)}")
            else (pick(r, Seq("month", "year")), s"${1995 + r.nextInt(6)}-${f"${1 + r.nextInt(12)}%02d"}-01")
          val u = if (unit == "year") s"${lit.take(4)}-01-01" else lit
          s"DATE_TRUNC('$unit', $c) ${pick(r, Seq("=", "<", ">="))} TIMESTAMP '$u 00:00:00'"
        }
      case 1 => s"${longE2(r, tb, 1, prefix)} ${pick(r, Seq("<", ">=", "="))} ${1 + r.nextInt(20)}"
      case _ => predE(r, tb, depth, prefix)
    }

  /** simple (non-null-injecting) group keys for ROLLUP/CUBE: the same
    * expression text must be legal in both the SELECT and the grouping
    * set list, and GROUPING() columns disambiguate rollup-nulls. */
  private def simpleKeyE(r: Random, tb: Tbl): String =
    r.nextInt(3) match {
      case 0 =>
        val sc = tb.of(TString)
        val c = pick(r, sc).name
        if (tb.enums.contains(c) || Seq("lang", "source", "event_type", "c_mktsegment", "p_brand", "o_orderpriority").contains(c)) c
        else s"SUBSTR($c, 1, ${1 + r.nextInt(2)})"
      case 1 =>
        val ts = tb.of(TTs)
        if (ts.isEmpty) s"(${pick(r, tb.of(TLong)).name} % ${2 + r.nextInt(7)})"
        else s"${pick(r, Seq("YEAR", "MONTH"))}(${pick(r, ts).name})"
      case _ => s"(${pick(r, tb.of(TLong)).name} % ${2 + r.nextInt(9)})"
    }

  private def shapeWindow2(r: Random): String = {
    val tb = pick(r, tables)
    val p = groupKeyE(r, tb)
    val x = longE(r, tb, 1)
    val o = pick(r, Seq(longE2(r, tb, 1), strE2(r, tb, 1)))
    val win = s"PARTITION BY $p ORDER BY $o ASC NULLS LAST, ${tie(tb)}"
    val outCols = tb.key ++ Seq("grp", "lg", "ld", "nt", "fv")
    s"""SELECT * FROM (
       |  SELECT ${tb.key.mkString(", ")}, $p AS grp,
       |         LAG($x, 1, -1) OVER ($win) AS lg,
       |         LEAD($x, ${1 + r.nextInt(2)}, -1) OVER ($win) AS ld,
       |         NTILE(${2 + r.nextInt(5)}) OVER ($win) AS nt,
       |         FIRST_VALUE($x) OVER ($win ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
       |  FROM ${tb.name} WHERE ${predE2(r, tb, 1)}
       |) w2
       |ORDER BY ${outCols.map(c => s"$c ASC NULLS FIRST").mkString(", ")} LIMIT 2000""".stripMargin
  }

  private def shapeExists(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, fks)
    val neg = if (r.nextBoolean()) "NOT " else ""
    s"""SELECT ${lt.key.mkString(", ")}, ${longE2(r, lt, 1)} AS v
       |FROM ${lt.name} L
       |WHERE ${neg}EXISTS (SELECT 1 FROM ${rt.name} R WHERE R.$rc = L.$lc AND ${predE2(r, rt, 1, "R.")})
       |ORDER BY ${tie(lt, "L.")} LIMIT 2000""".stripMargin
  }

  private def shapeRollup(r: Random): String = {
    val tb = pick(r, tables)
    val k1 = simpleKeyE(r, tb)
    var k2 = simpleKeyE(r, tb)
    if (k2 == k1) k2 = s"(${pick(r, tb.of(TLong)).name} % 3)"
    val op = pick(r, Seq("ROLLUP", "CUBE"))
    // M16 (REAL divergence found by this fuzzer, round 5): over an input
    // the WHERE empties out, the empty grouping set of ROLLUP/CUBE yields
    // ONE grand-total row (COUNT=0) in DuckDB and PostgreSQL (ANSI), but
    // ZERO rows in Spark. HAVING COUNT(*) > 0 equalizes the dialects:
    // only that empty-input grand-total row can carry a zero count.
    s"""SELECT $k1 AS g1, $k2 AS g2, GROUPING($k1) AS gr1, GROUPING($k2) AS gr2,
       |       COUNT(*) AS cnt, CAST(SUM(${longE(r, tb, 1)}) AS BIGINT) AS s1
       |FROM ${tb.name} WHERE ${predE2(r, tb, 1)}
       |GROUP BY $op($k1, $k2)
       |HAVING COUNT(*) > 0
       |ORDER BY gr1 ASC NULLS LAST, gr2 ASC NULLS LAST, g1 ASC NULLS FIRST, g2 ASC NULLS FIRST""".stripMargin
  }

  private def shapeDistinct(r: Random): String = {
    val tb = pick(r, tables)
    val cols = Seq(s"${groupKeyE(r, tb)} AS d1", s"${longE2(r, tb, 1)} AS d2") ++
      (if (r.nextBoolean()) Seq(s"${strE2(r, tb, 1)} AS d3") else Nil)
    val ord = (1 to cols.size).map(i => s"$i ASC NULLS FIRST").mkString(", ")
    s"""SELECT DISTINCT ${cols.mkString(", ")} FROM ${tb.name}
       |WHERE ${predE2(r, tb, 1)}
       |ORDER BY $ord LIMIT 2000""".stripMargin
  }

  private def shapeScalarSub(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, fks)
    s"""SELECT ${rt.key.mkString(", ")},
       |  (SELECT COUNT(*) FROM ${lt.name} L WHERE L.$lc = R.$rc AND ${predE2(r, lt, 1, "L.")}) AS n_match
       |FROM ${rt.name} R
       |ORDER BY ${tie(rt, "R.")} LIMIT 1000""".stripMargin
  }

  // ---------------------------------------------------------------------
  // v3 grammar extensions (round 6). Same freeze discipline: v1/v2
  // generators keep their RNG consumption; new composition shapes are
  // appended so existing (seed, index) corpora stay byte-stable for the
  // frozen casesV1 slice, while campaigns pick up the wider grammar.
  // ---------------------------------------------------------------------

  /** v3: three-table FK chain (lineitem→orders→customer — the only 2-hop
    * path in the fixture graph) with aggregates drawn from all three
    * sides. Hunts multi-join planning edges: join reorder under
    * mixed-side predicates, COUNT(DISTINCT) over a fan-out, decimal
    * sums through two joins. */
  private def shapeMultiJoin(r: Random): String = {
    val keys = Seq(s"${groupKeyE(r, customer, "c.")} AS g1") ++
      (if (r.nextBoolean()) Seq(s"${groupKeyE(r, orders, "o.")} AS g2") else Nil)
    val nk = keys.size
    val aggs = Seq(
      "COUNT(*) AS cnt",
      s"CAST(SUM(${longE(r, lineitem, 1, "l.")}) AS BIGINT) AS a1", // M1
      s"CAST(SUM(CAST(${dblE(r, orders, 1, "o.")} AS DECIMAL(18,4))) AS DOUBLE) AS a2", // M2
      s"COUNT(DISTINCT ${longE(r, orders, 0, "o.")}) AS a3")
    s"""SELECT ${(keys ++ aggs).mkString(", ")}
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |WHERE ${predE2(r, lineitem, 1, "l.")} AND ${predE(r, customer, 0, "c.")}
       |GROUP BY ${(1 to nk).mkString(", ")}
       |${orderBy(r, (1 to nk).map(_.toString))}""".stripMargin
  }

  /** v3: conditional aggregation — aggregates whose inputs are CASE arms
    * (the pivot-by-hand idiom). Exercises NULL-arm aggregation (COUNT/
    * MAX skip the ELSE-less NULL arm) and 3VL predicates INSIDE the
    * aggregate, composed with the M1/M2 mitigations outside it. */
  private def shapeCaseAgg(r: Random): String = {
    val tb = pick(r, tables)
    val p1 = predE2(r, tb, 1)
    val p2 = predE(r, tb, 1)
    val key = groupKeyE(r, tb)
    s"""SELECT $key AS g1,
       |  COUNT(*) AS cnt,
       |  CAST(SUM(CASE WHEN $p1 THEN ${longE(r, tb, 1)} ELSE 0 END) AS BIGINT) AS a1,
       |  COUNT(CASE WHEN $p2 THEN 1 END) AS a2,
       |  CAST(SUM(CASE WHEN $p1 THEN CAST(${dblE(r, tb, 1)} AS DECIMAL(18,4))
       |            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS a3,
       |  MAX(CASE WHEN $p2 THEN ${strE2(r, tb, 1)} END) AS a4
       |FROM ${tb.name}
       |GROUP BY 1 ORDER BY g1 ASC NULLS FIRST""".stripMargin
  }

  /** v3: window over a many-to-one FK join — partition key from the PK
    * side, frame order + tiebreak from the fact side. Right-side attrs
    * are a function of the join key (PK side), so the M15 full-left-
    * column tiebreak stays total up to fully identical output rows. */
  private def shapeJoinWindow(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, fks)
    val p = groupKeyE(r, rt, "r.")
    val o = longE(r, lt, 1, "l.")
    val win = s"PARTITION BY $p ORDER BY $o ASC NULLS LAST, ${tie(lt, "l.")}"
    val k = 3 + r.nextInt(5)
    val outCols = lt.key ++ Seq("grp", "rn", "run")
    s"""SELECT * FROM (
       |  SELECT ${lt.key.map(c => s"l.$c").mkString(", ")}, $p AS grp,
       |         ROW_NUMBER() OVER ($win) AS rn,
       |         CAST(SUM(CAST(${dblE(r, lt, 0, "l.")} AS DECIMAL(18,4)))
       |              OVER ($win ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run
       |  FROM ${lt.name} l JOIN ${rt.name} r ON l.$lc = r.$rc
       |  WHERE ${predE2(r, lt, 1, "l.")}
       |) jw WHERE rn <= $k
       |ORDER BY ${outCols.map(c => s"$c ASC NULLS FIRST").mkString(", ")} LIMIT 2000""".stripMargin
  }

  /** v3: RANGE value frames. Peer-inclusive by definition — the frame is
    * determined by the ORDER value, not row position, so duplicate order
    * values CANNOT diverge between engines (the one window family where
    * M15's tiebreak is unnecessary; the order key is a raw non-null
    * fixture column to keep NULL-peer-group semantics out of play). */
  private def shapeRangeFrame(r: Random): String = {
    val tb = pick(r, tables)
    val p = groupKeyE(r, tb)
    val oc = pick(r, tb.of(TLong)).name
    val w = 100 + r.nextInt(5000)
    val win = s"PARTITION BY $p ORDER BY $oc ASC"
    s"""SELECT ${tb.key.mkString(", ")}, $p AS grp, $oc AS ov,
       |  COUNT(*) OVER ($win RANGE BETWEEN $w PRECEDING AND CURRENT ROW) AS cw,
       |  CAST(SUM(CAST(${dblE(r, tb, 0)} AS DECIMAL(18,4)))
       |       OVER ($win RANGE BETWEEN $w PRECEDING AND $w FOLLOWING) AS DOUBLE) AS sw
       |FROM ${tb.name} WHERE ${predE2(r, tb, 1)}
       |ORDER BY ${tie(tb)}, grp ASC NULLS FIRST LIMIT 2000""".stripMargin
  }

  /** v3: aggregate over a UNION ALL of schema-aligned projections from
    * two different tables (customer ∪ supplier) — the multi-source
    * consolidation shape; exercises type unification across branches
    * before grouping. */
  private def shapeUnionAgg(r: Random): String = {
    val k = 2 + r.nextInt(9)
    s"""SELECT g1, src, COUNT(*) AS cnt, CAST(SUM(v) AS BIGINT) AS s1,
       |  CAST(SUM(CAST(dv AS DECIMAL(18,4))) AS DOUBLE) AS s2
       |FROM (
       |  SELECT (c_nationkey % $k) AS g1, 'c' AS src, c_custkey AS v, c_acctbal AS dv
       |  FROM customer WHERE ${predE(r, customer, 1)}
       |  UNION ALL
       |  SELECT (s_nationkey % $k) AS g1, 's' AS src, s_suppkey AS v, s_acctbal AS dv
       |  FROM supplier WHERE ${predE(r, supplier, 1)}
       |) u
       |GROUP BY 1, 2 ORDER BY g1 ASC NULLS FIRST, src ASC NULLS FIRST""".stripMargin
  }

  private val shapesV1: Seq[(String, Random => String)] = Seq(
    "filter" -> shapeFilterProject _,
    "agg" -> shapeAgg _,
    "join" -> shapeJoinAgg _,
    "setop" -> shapeSetOp _,
    "window" -> shapeWindow _,
    "scalar" -> shapeScalarGauntlet _,
    "nested" -> shapeNested _)

  private val shapesV2: Seq[(String, Random => String)] = shapesV1 ++ Seq(
    "window2" -> shapeWindow2 _,
    "exists" -> shapeExists _,
    "rollup" -> shapeRollup _,
    "distinct" -> shapeDistinct _,
    "scalarsub" -> shapeScalarSub _)

  // ---------------------------------------------------------------------
  // v4 grammar extensions (round 6, second batch): standard-SQL surfaces
  // both engines parse identically but hand-written queries underuse.
  // ---------------------------------------------------------------------

  /** v4: FILTER-clause aggregates (`agg(x) FILTER (WHERE p)`) — the ANSI
    * form of conditional aggregation (v3's caseagg covers the CASE-arm
    * form; the two must agree with each other and with DuckDB). */
  private def shapeFilterAgg(r: Random): String = {
    val tb = pick(r, tables)
    val p1 = predE2(r, tb, 1)
    val p2 = predE(r, tb, 1)
    val key = groupKeyE(r, tb)
    s"""SELECT $key AS g1,
       |  COUNT(*) AS cnt,
       |  COUNT(*) FILTER (WHERE $p1) AS f1,
       |  CAST(SUM(${longE(r, tb, 1)}) FILTER (WHERE $p2) AS BIGINT) AS f2,
       |  CAST(SUM(CAST(${dblE(r, tb, 1)} AS DECIMAL(18,4))) FILTER (WHERE $p1) AS DOUBLE) AS f3,
       |  MIN(${strE2(r, tb, 1)}) FILTER (WHERE $p2) AS f4
       |FROM ${tb.name}
       |GROUP BY 1 ORDER BY g1 ASC NULLS FIRST""".stripMargin
  }

  /** v4: INTERVAL arithmetic in predicates and window-style bucketing —
    * literal-anchored `TIMESTAMP ± INTERVAL n unit` bounds (engines
    * agree on literal interval arithmetic; column-derived intervals and
    * month-end semantics stay excluded like M10's dow). */
  private def shapeIntervalArith(r: Random): String = {
    val tb = if (r.nextBoolean()) events else Seq(lineitem, orders)(r.nextInt(2))
    val tsCol = tb.of(TTs).head.name
    val (anchor, spanUnit) =
      if (tb.name == "events") (s"2024-01-${10 + r.nextInt(10)} 00:00:00", "HOUR")
      else (s"${1995 + r.nextInt(5)}-${f"${1 + r.nextInt(12)}%02d"}-01 00:00:00", "DAY")
    val span = 1 + r.nextInt(if (spanUnit == "HOUR") 72 else 45)
    val key = groupKeyE(r, tb)
    s"""SELECT $key AS g1, COUNT(*) AS cnt,
       |  CAST(MIN(EXTRACT(DAY FROM $tsCol)) AS BIGINT) AS d1,
       |  CAST(MAX(EXTRACT(HOUR FROM $tsCol)) AS BIGINT) AS h1,
       |  CAST(SUM(${longE(r, tb, 1)}) AS BIGINT) AS s1
       |FROM ${tb.name}
       |WHERE $tsCol >= TIMESTAMP '$anchor'
       |  AND $tsCol < TIMESTAMP '$anchor' + INTERVAL $span $spanUnit
       |  AND ${predE(r, tb, 1)}
       |GROUP BY 1 ORDER BY g1 ASC NULLS FIRST""".stripMargin
  }

  // ---------------------------------------------------------------------
  // v5 grammar extensions (round 7): LATERAL + EXISTS composition and
  // bounded ROWS frames — the two surfaces the round-6 review called out
  // as under-fuzzed. Same freeze discipline as v2→v4.
  // ---------------------------------------------------------------------

  /** v5: correlated LATERAL top-k — per PK-side row, the k best fact
    * rows by a generated expression (the decorrelate-to-WindowGroupLimit
    * shape q123 pins by hand, here with machine-generated expressions).
    * The lateral subquery's ORDER BY carries the M15 full tiebreak so
    * the k-cut is total; the outer ORDER BY covers every output column
    * so ties exist only between fully identical output rows. */
  private def shapeLateral(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, fks)
    val k = 1 + r.nextInt(4)
    s"""SELECT ${rt.key.map(c => s"R.$c").mkString(", ")}, X.v1, X.v2
       |FROM ${rt.name} R, LATERAL (
       |  SELECT ${longE(r, lt, 1, "L0.")} AS v1, ${strE2(r, lt, 1, "L0.")} AS v2
       |  FROM ${lt.name} L0
       |  WHERE L0.$lc = R.$rc AND ${predE2(r, lt, 1, "L0.")}
       |  ORDER BY v1 ASC NULLS LAST, v2 ASC NULLS LAST, ${tie(lt, "L0.")} LIMIT $k
       |) X
       |ORDER BY ${rt.key.map(c => s"R.$c ASC NULLS FIRST").mkString(", ")},
       |  v1 ASC NULLS LAST, v2 ASC NULLS LAST LIMIT 2000""".stripMargin
  }

  /** v5: bounded ROWS frames (j PRECEDING .. k FOLLOWING) — position-
    * based frames where duplicate order keys WOULD diverge, so the
    * window ORDER BY carries the M15 full tiebreak (frame contents are
    * then engine-independent up to interchangeable identical rows) and
    * the outer ORDER BY covers every output column (the window2
    * discipline: a LIMIT cut can only fall between identical rows). */
  private def shapeBoundedFrame(r: Random): String = {
    val tb = pick(r, tables)
    val p = groupKeyE(r, tb)
    val j = r.nextInt(4); val f = 1 + r.nextInt(4)
    val win = s"PARTITION BY $p ORDER BY ${longE(r, tb, 1)} ASC NULLS LAST, ${tie(tb)}"
    val outCols = tb.key ++ Seq("grp", "cw", "sw", "mw")
    s"""SELECT * FROM (
       |  SELECT ${tb.key.mkString(", ")}, $p AS grp,
       |    COUNT(*) OVER ($win ROWS BETWEEN $j PRECEDING AND $f FOLLOWING) AS cw,
       |    CAST(SUM(${longE(r, tb, 1)}) OVER ($win ROWS BETWEEN $j PRECEDING AND CURRENT ROW) AS BIGINT) AS sw,
       |    MAX(${strE2(r, tb, 1)}) OVER ($win ROWS BETWEEN CURRENT ROW AND $f FOLLOWING) AS mw
       |  FROM ${tb.name} WHERE ${predE2(r, tb, 1)}
       |) bf
       |ORDER BY ${outCols.map(c => s"$c ASC NULLS FIRST").mkString(", ")} LIMIT 2000""".stripMargin
  }

  /** v5: EXISTS composed with aggregation — a correlated (NOT) EXISTS
    * semi-filter under a GROUP BY + HAVING, so the anti/semi join result
    * feeds an aggregate instead of a bare projection (v2's exists shape
    * covers the projection form). */
  private def shapeExistsAgg(r: Random): String = {
    val (lt, lc, rt, rc) = pick(r, fks)
    val neg = if (r.nextBoolean()) "NOT " else ""
    s"""SELECT ${groupKeyE(r, lt, "L.")} AS g1, COUNT(*) AS cnt,
       |  CAST(SUM(${longE(r, lt, 1, "L.")}) AS BIGINT) AS s1,
       |  CAST(SUM(CAST(${dblE(r, lt, 1, "L.")} AS DECIMAL(18,4))) AS DOUBLE) AS s2
       |FROM ${lt.name} L
       |WHERE ${neg}EXISTS (SELECT 1 FROM ${rt.name} R WHERE R.$rc = L.$lc AND ${predE2(r, rt, 1, "R.")})
       |  AND ${predE(r, lt, 1, "L.")}
       |GROUP BY 1
       |HAVING COUNT(*) > ${r.nextInt(3)}
       |ORDER BY g1 ASC NULLS FIRST""".stripMargin
  }

  private val shapesV3: Seq[(String, Random => String)] = shapesV2 ++ Seq(
    "multijoin" -> shapeMultiJoin _,
    "caseagg" -> shapeCaseAgg _,
    "joinwindow" -> shapeJoinWindow _,
    "rangeframe" -> shapeRangeFrame _,
    "unionagg" -> shapeUnionAgg _)

  private val shapesV4: Seq[(String, Random => String)] = shapesV3 ++ Seq(
    "filteragg" -> shapeFilterAgg _,
    "intervalarith" -> shapeIntervalArith _)

  private val shapesV5: Seq[(String, Random => String)] = shapesV4 ++ Seq(
    "lateral" -> shapeLateral _,
    "boundedframe" -> shapeBoundedFrame _,
    "existsagg" -> shapeExistsAgg _)

  /** Number of shapes in the current grammar (one full cycle). */
  def nShapes: Int = shapesV5.size

  /** Standalone predicate generator for metamorphic tests. */
  def predFor(r: Random, tb: Tbl): String = predE2(r, tb, 2)

  private def casesFor(shapes: Seq[(String, Random => String)], seed: Long, n: Int): Seq[FuzzCase] =
    (0 until n).map { i =>
      val (shapeName, gen) = shapes(i % shapes.size)
      val r = new Random(seed * 1000003L + i)
      FuzzCase(f"fz$i%03d_$shapeName", gen(r))
    }

  /** FROZEN v1 corpus — the graded q189–q195 picks index into this; its
    * SQL must stay byte-stable across grammar growth. */
  def casesV1(seed: Long, n: Int): Seq[FuzzCase] = casesFor(shapesV1, seed, n)

  /** FROZEN v2 corpus — kept addressable so recorded v2 campaign seeds
    * (FUZZ.md round 5) remain reproducible byte-for-byte. */
  def casesV2(seed: Long, n: Int): Seq[FuzzCase] = casesFor(shapesV2, seed, n)

  /** FROZEN v3 corpus — the graded q196–q200 picks index into this. */
  def casesV3(seed: Long, n: Int): Seq[FuzzCase] = casesFor(shapesV3, seed, n)

  /** FROZEN v4 corpus — graded picks from the v4 shapes index into this. */
  def casesV4(seed: Long, n: Int): Seq[FuzzCase] = casesFor(shapesV4, seed, n)

  /** FROZEN v5 corpus — graded picks from the v5 shapes index into this. */
  def casesV5(seed: Long, n: Int): Seq[FuzzCase] = casesFor(shapesV5, seed, n)

  /** Current full grammar (campaign + FuzzSpec default). */
  def cases(seed: Long, n: Int): Seq[FuzzCase] = casesV5(seed, n)
}
