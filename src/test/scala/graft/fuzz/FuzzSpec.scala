package graft.fuzz

import graft.{FuzzVerify, TestSpark}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** In-sbt half of the differential fuzzing story (VERDICT r4 #2).
  *
  * DuckDB is not on the sbt classpath (driver-side only), so the
  * cross-engine compare runs via `FuzzVerify` + `scripts/oracle_check.py`
  * (1,250 cases across 4 seeds and 2 scale factors verified in round 5;
  * recorded in FUZZ.md). What CAN be asserted hermetically, this suite
  * does:
  *
  *  1. generator determinism — byte-identical SQL for (seed, i), so the
  *     script and the suite grade the same corpus;
  *  2. every generated case parses and executes on Spark (the grammar
  *     stays inside the dialect subset as it evolves);
  *  3. execution determinism — identical results across reruns under a
  *     different shuffle-partition count (catches accidental reliance on
  *     partition order, the in-engine analogue of a dialect divergence);
  *  4. metamorphic partition invariant — for random predicates p,
  *     |WHERE p| + |WHERE NOT p| + |WHERE p IS NULL| = |table|, a
  *     three-valued-logic check no oracle is needed for.
  */
class FuzzSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("generator is deterministic in (seed, index)") {
    val a = QueryGen.cases(42L, 60)
    val b = QueryGen.cases(42L, 60)
    assert(a == b)
    val c = QueryGen.cases(43L, 60)
    assert(a.map(_.sql) != c.map(_.sql), "different seeds must differ")
  }

  test("all shapes execute on Spark and are rerun-deterministic") {
    FuzzVerify.registerViews(spark, sf)
    // two full cycles of the current grammar (17 shapes in v3)
    val cases = QueryGen.cases(4242L, 2 * QueryGen.nShapes)
    cases.foreach { c =>
      val r1 =
        try spark.sql(c.sql).collect().toSeq
        catch { case e: Throwable => fail(s"${c.name} failed: ${e.getMessage}\n${c.sql}") }
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        val r2 = spark.sql(c.sql).collect().toSeq
        assert(r1 == r2, s"${c.name} not deterministic across partition counts\n${c.sql}")
      } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
  }

  test("metamorphic: semi + anti partition the left side; intersect + except partition distinct") {
    FuzzVerify.registerViews(spark, sf)
    val r = new Random(99L)
    // |L semi R| + |L anti R| = |L| for ANY join condition and ANY right
    // multiplicity (no uniqueness assumption — M15 taught us not to make one)
    Seq(("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey")).foreach {
      case (lt, lc, rt, rc) =>
        val total = spark.table(lt).count()
        val rp = QueryGen.predFor(r, QueryGen.tables.find(_.name == rt).get)
        val semi = spark.sql(
          s"SELECT COUNT(*) c FROM $lt L LEFT SEMI JOIN (SELECT * FROM $rt WHERE $rp) R ON L.$lc = R.$rc")
          .head().getLong(0)
        val anti = spark.sql(
          s"SELECT COUNT(*) c FROM $lt L LEFT ANTI JOIN (SELECT * FROM $rt WHERE $rp) R ON L.$lc = R.$rc")
          .head().getLong(0)
        assert(semi + anti == total, s"semi/anti partition broken for $lt vs $rt WHERE $rp")
    }
    // |A ∩ B| + |A \ B| = |distinct A|  and  |A UNION ALL B| = |A| + |B|
    QueryGen.tables.take(4).foreach { tb =>
      val pa = QueryGen.predFor(r, tb)
      val pb = QueryGen.predFor(r, tb)
      val proj = s"SELECT ${tb.key.mkString(", ")} FROM ${tb.name}"
      def cnt(q: String): Long = spark.sql(s"SELECT COUNT(*) c FROM ($q) t").head().getLong(0)
      val distinctA = cnt(s"SELECT DISTINCT * FROM ($proj WHERE $pa) x")
      val inter = cnt(s"($proj WHERE $pa) INTERSECT ($proj WHERE $pb)")
      val excep = cnt(s"($proj WHERE $pa) EXCEPT ($proj WHERE $pb)")
      assert(inter + excep == distinctA,
        s"intersect/except partition broken on ${tb.name}: $pa vs $pb")
      val a = cnt(s"$proj WHERE $pa"); val b = cnt(s"$proj WHERE $pb")
      val uall = cnt(s"($proj WHERE $pa) UNION ALL ($proj WHERE $pb)")
      assert(uall == a + b, s"union-all count broken on ${tb.name}")
    }
  }

  test("metamorphic: p / NOT p / p IS NULL partition every table") {
    FuzzVerify.registerViews(spark, sf)
    val r = new Random(7L)
    QueryGen.tables.foreach { tb =>
      val total = spark.table(tb.name).count()
      (1 to 3).foreach { _ =>
        val p = QueryGen.predFor(r, tb)
        val counts = spark.sql(
          s"""SELECT
             |  COUNT(CASE WHEN $p THEN 1 END) AS yes,
             |  COUNT(CASE WHEN NOT ($p) THEN 1 END) AS no,
             |  COUNT(CASE WHEN ($p) IS NULL THEN 1 END) AS unk
             |FROM ${tb.name}""".stripMargin).head()
        assert(counts.getLong(0) + counts.getLong(1) + counts.getLong(2) == total,
          s"3VL partition broken for $p on ${tb.name}")
      }
    }
  }

  test("metamorphic: FILTER-clause aggregates partition like their CASE-arm twins") {
    // the v4 filteragg shape's semantics, pinned hermetically: for any
    // predicate p, COUNT(*) FILTER over {p, NOT p, p IS NULL} partitions
    // the table, and SUM FILTER (WHERE p) == SUM(CASE WHEN p ...)
    FuzzVerify.registerViews(spark, sf)
    val r = new Random(13L)
    QueryGen.tables.take(4).foreach { tb =>
      val total = spark.table(tb.name).count()
      val p = QueryGen.predFor(r, tb)
      val key = tb.key.head
      val row = spark.sql(
        s"""SELECT
           |  COUNT(*) FILTER (WHERE $p) AS yes,
           |  COUNT(*) FILTER (WHERE NOT ($p)) AS no,
           |  COUNT(*) FILTER (WHERE ($p) IS NULL) AS unk,
           |  CAST(SUM($key) FILTER (WHERE $p) AS BIGINT) AS fsum,
           |  CAST(SUM(CASE WHEN $p THEN $key END) AS BIGINT) AS csum
           |FROM ${tb.name}""".stripMargin).head()
      assert(row.getLong(0) + row.getLong(1) + row.getLong(2) == total,
        s"FILTER 3VL partition broken for $p on ${tb.name}")
      assert((row.isNullAt(3) && row.isNullAt(4)) ||
          row.getLong(3) == row.getLong(4),
        s"FILTER vs CASE-arm sum mismatch for $p on ${tb.name}")
    }
  }
}
