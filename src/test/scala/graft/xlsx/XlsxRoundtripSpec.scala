package graft.xlsx

import java.nio.file.Files
import java.sql.Timestamp
import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class XlsxRoundtripSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    Files.createTempDirectory("xlsx").resolve(name).toString

  private val header = Seq("Name", "Score", "Active", "When", "Weird Col!")
  private val rows: Seq[Seq[Any]] = Seq(
    Seq("alice", 1.5, true, Timestamp.valueOf("2024-01-02 03:04:05"), "x&<>\"y"),
    Seq("bob", -2.0, false, Timestamp.valueOf("1999-12-31 23:59:59"), null),
    Seq(null, 42.0, null, null, "z"))

  test("typed roundtrip with shared strings") {
    val path = tmp("t1.xlsx")
    XlsxWriter.write(path, Seq(XlsxWriter.Sheet("Sheet1", header, rows)), useSharedStrings = true)
    val df = spark.read.format("xlsx").load(path)
    df.schema.fieldNames.toSeq shouldBe Seq("name", "score", "active", "when", "weird_col")
    df.schema.fields.map(_.dataType).toSeq shouldBe
      Seq(StringType, DoubleType, BooleanType, TimestampType, StringType)
    val got = df.orderBy("score").collect()
    got.length shouldBe 3
    val alice = got.find(r => r.getAs[String]("name") == "alice").get
    alice.getAs[Double]("score") shouldBe 1.5
    alice.getAs[Boolean]("active") shouldBe true
    alice.getAs[Timestamp]("when") shouldBe Timestamp.valueOf("2024-01-02 03:04:05")
    alice.getAs[String]("weird_col") shouldBe "x&<>\"y"
    val third = got.find(r => r.getAs[Double]("score") == 42.0).get
    third.isNullAt(third.fieldIndex("name")) shouldBe true
    third.isNullAt(third.fieldIndex("when")) shouldBe true
  }

  test("inline strings variant parses identically") {
    val path = tmp("t2.xlsx")
    XlsxWriter.write(path, Seq(XlsxWriter.Sheet("S", header, rows)), useSharedStrings = false)
    val df = spark.read.format("xlsx").load(path)
    df.count() shouldBe 3
    df.filter("name = 'alice'").count() shouldBe 1
  }

  test("1904 date system shifts serials correctly") {
    val ts = Timestamp.valueOf("2020-06-15 12:00:00")
    val p1 = tmp("d1900.xlsx"); val p2 = tmp("d1904.xlsx")
    XlsxWriter.write(p1, Seq(XlsxWriter.Sheet("S", Seq("t"), Seq(Seq(ts)))), date1904 = false)
    XlsxWriter.write(p2, Seq(XlsxWriter.Sheet("S", Seq("t"), Seq(Seq(ts)))), date1904 = true)
    val v1 = spark.read.format("xlsx").load(p1).collect()(0).getTimestamp(0)
    val v2 = spark.read.format("xlsx").load(p2).collect()(0).getTimestamp(0)
    v1 shouldBe ts
    v2 shouldBe ts
  }

  test("multi-sheet selection") {
    val path = tmp("t3.xlsx")
    XlsxWriter.write(path, Seq(
      XlsxWriter.Sheet("first", Seq("a"), Seq(Seq(1.0), Seq(2.0))),
      XlsxWriter.Sheet("second", Seq("b"), Seq(Seq("x")))))
    XlsxToSheets.names(path) shouldBe Seq("first", "second")
    spark.read.format("xlsx").load(path).count() shouldBe 2
    val second = spark.read.format("xlsx").option("sheet", "second").load(path)
    second.columns.toSeq shouldBe Seq("b")
    second.collect()(0).getString(0) shouldBe "x"
  }

  test("headerRow=false and inferSchema=false yield raw string grid") {
    val path = tmp("t4.xlsx")
    XlsxWriter.write(path, Seq(XlsxWriter.Sheet("S", Seq("h1", "h2"), Seq(Seq(1.0, "x")))))
    val df = spark.read.format("xlsx")
      .option("headerRow", false).option("inferSchema", false).load(path)
    df.columns.toSeq shouldBe Seq("col_0", "col_1")
    df.count() shouldBe 2 // header row becomes data
    df.schema.fields.map(_.dataType).distinct.toSeq shouldBe Seq(StringType)
  }

  test("column pruning: count(*) with no columns still sees all rows") {
    val path = tmp("t5.xlsx")
    XlsxWriter.write(path, Seq(XlsxWriter.Sheet("S", header, rows)))
    spark.read.format("xlsx").load(path).count() shouldBe 3
    // and a single-column projection works
    spark.read.format("xlsx").load(path).select("score").collect()
      .map(_.getDouble(0)).sorted.toSeq shouldBe Seq(-2.0, 1.5, 42.0)
  }

  test("explicit schema skips inference") {
    val path = tmp("t6.xlsx")
    XlsxWriter.write(path, Seq(XlsxWriter.Sheet("S", Seq("a", "b"), Seq(Seq(1.0, 2.0)))))
    val schema = StructType(Seq(StructField("a", StringType), StructField("b", DoubleType)))
    val df = spark.read.format("xlsx").schema(schema).load(path)
    df.schema shouldBe schema
    val r = df.collect()(0)
    r.getString(0) shouldBe "1"
    r.getDouble(1) shouldBe 2.0
  }

  test("mirror of the region fixture matches parquet content") {
    val path = tmp("region.xlsx")
    val region = graft.Tables.region(spark, "/root/testdata/sf0.001")
    XlsxWriter.writeDataFrame(region, path, "region")
    val back = spark.read.format("xlsx").load(path)
    back.count() shouldBe region.count()
    val orig = region.collect().map(r => (r.getInt(0).toDouble, r.getString(1))).sortBy(_._1)
    val got = back.collect().map(r => (r.getDouble(0), r.getString(1))).sortBy(_._1)
    got.toSeq shouldBe orig.toSeq // ints become doubles (xlsx has one numeric type)
  }

  test("directory of xlsx files reads as one table, one partition per file") {
    val dir = Files.createTempDirectory("multi")
    XlsxWriter.write(dir.resolve("a.xlsx").toString,
      Seq(XlsxWriter.Sheet("S", Seq("v"), Seq(Seq(1.0), Seq(2.0)))))
    XlsxWriter.write(dir.resolve("b.xlsx").toString,
      Seq(XlsxWriter.Sheet("S", Seq("v"), Seq(Seq(3.0)))))
    val df = spark.read.format("xlsx").load(dir.toString)
    df.count() shouldBe 3
    df.rdd.getNumPartitions shouldBe 2
    df.agg(org.apache.spark.sql.functions.sum("v")).collect()(0).getDouble(0) shouldBe 6.0
  }

  test("name sanitization dedups and handles illegal identifiers") {
    TypeInference.sanitizeNames(Seq("A B", "a_b", "9lives", "", "a b")) shouldBe
      Seq("a_b", "a_b_2", "_9lives", "col", "a_b_3")
  }
}

/** Tiny helper so the spec reads naturally. */
object XlsxToSheets {
  def names(path: String): Seq[String] = graft.etl.XlsxToDatabase.sheetNames(path)
}
