package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unit coverage for scalar functions that are deliberately NOT in the
  * DuckDB oracle because their semantics differ cross-engine (SURVEY.md
  * §2.7 notes): banker's rounding, initcap, nvl2, map constructors. */
class ScalarEdgeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bround applies half-even (banker's) rounding") {
    val df = Seq(0.5, 1.5, 2.5, -0.5, 2.25).toDF("x")
      .select(bround($"x").as("b0"), bround($"x", 1).as("b1"))
    val rows = df.collect()
    rows.map(_.getDouble(0)).toSeq shouldBe Seq(0.0, 2.0, 2.0, -0.0, 2.0)
    rows.map(_.getDouble(1)).toSeq shouldBe Seq(0.5, 1.5, 2.5, -0.5, 2.2)
  }

  test("round applies half-up on the decimal string repr") {
    Seq(2.5, 1.5).toDF("x").select(round($"x")).collect()
      .map(_.getDouble(0)).toSeq shouldBe Seq(3.0, 2.0)
  }

  test("initcap capitalizes word starts") {
    Seq("hello spark world").toDF("s").select(initcap($"s")).collect()(0)
      .getString(0) shouldBe "Hello Spark World"
  }

  test("nvl2 / nvl behave as conditional null projections") {
    val df = Seq((Some("a"), 1), (None, 2)).toDF("s", "i")
      .select(expr("nvl2(s, 'has', 'missing')").as("n2"), expr("nvl(s, 'dflt')").as("n1"))
    df.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("has", "a"), ("missing", "dflt"))
  }

  test("map_from_entries + element_at + map_values round-trip") {
    val df = Seq(1).toDF("x").select(
      map_from_entries(array(struct(lit("k1"), lit(10)), struct(lit("k2"), lit(20)))).as("m"))
    val r = df.select(expr("element_at(m, 'k2')").as("v"),
      org.apache.spark.sql.functions.size(map_values($"m")).as("n")).collect()(0)
    r.getInt(0) shouldBe 20
    r.getInt(1) shouldBe 2
  }

  test("sequence/flatten/slice higher-order combinators") {
    val r = spark.range(1).select(
      flatten(array(sequence(lit(1), lit(3)), sequence(lit(4), lit(5)))).as("f"))
      .select(slice($"f", 2, 3).as("s"))
      .collect()(0).getSeq[Long](0)
    r shouldBe Seq(2L, 3L, 4L)
  }

  test("xlsx edge shapes: empty sheet, blank-rows-only, numeric headers") {
    val dir = java.nio.file.Files.createTempDirectory("edge")
    // empty sheet → zero rows, zero-column schema tolerated as no fields
    val p1 = dir.resolve("empty.xlsx").toString
    graft.xlsx.XlsxWriter.write(p1, Seq(graft.xlsx.XlsxWriter.Sheet("S", Nil, Nil)))
    spark.read.format("xlsx").load(p1).count() shouldBe 0
    // numeric header cells become stringified names, sanitized
    val p2 = dir.resolve("numhdr.xlsx").toString
    graft.xlsx.XlsxWriter.write(p2, Seq(graft.xlsx.XlsxWriter.Sheet("S",
      Nil, Seq(Seq(2024.0, "x"), Seq(1.0, "y")))))
    // first data row acts as header (2024, x) -> _2024, x
    val df = spark.read.format("xlsx").load(p2)
    df.columns.toSeq shouldBe Seq("_2024", "x")
    df.count() shouldBe 1
  }
}
