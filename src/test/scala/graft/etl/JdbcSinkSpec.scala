package graft.etl

import java.nio.file.Files
import graft.TestSpark
import graft.xlsx.XlsxWriter
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The reference's end-to-end identity: xlsx workbook → DuckDB tables via
  * the JDBC sink, verified by reading back over JDBC. */
class JdbcSinkSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("xlsx workbook loads into DuckDB, one table per sheet, and reads back") {
    val dir = Files.createTempDirectory("etl")
    val xlsx = dir.resolve("book.xlsx").toString
    val db = dir.resolve("t.duckdb").toString
    XlsxWriter.write(xlsx, Seq(
      XlsxWriter.Sheet("People List", Seq("id", "name", "score"),
        Seq(Seq(1.0, "alice", 9.5), Seq(2.0, "bob", 7.25), Seq(3.0, null, 0.0))),
      XlsxWriter.Sheet("Flags", Seq("k", "ok"),
        Seq(Seq(10.0, true), Seq(20.0, false)))))

    val url = s"jdbc:duckdb:$db"
    val loaded = XlsxToDatabase.load(spark, xlsx, url, SaveMode.Overwrite)
    loaded.map(t => (t.sheet, t.table, t.rows)) shouldBe Seq(
      ("People List", "people_list", 3L), ("Flags", "flags", 2L))

    val people = XlsxToDatabase.readJdbc(spark, url, "people_list")
    people.columns.toSeq shouldBe Seq("id", "name", "score")
    val rows = people.orderBy("id").collect()
    rows.map(_.getDouble(0)).toSeq shouldBe Seq(1.0, 2.0, 3.0)
    rows.map(_.getString(1)).toSeq shouldBe Seq("alice", "bob", null)
    rows.map(_.getDouble(2)).toSeq shouldBe Seq(9.5, 7.25, 0.0)

    val flags = XlsxToDatabase.readJdbc(spark, url, "flags")
    flags.orderBy("k").collect().map(_.getBoolean(1)).toSeq shouldBe Seq(true, false)
  }

  test("append mode accumulates rows") {
    val dir = Files.createTempDirectory("etl2")
    val xlsx = dir.resolve("book.xlsx").toString
    val db = dir.resolve("t.duckdb").toString
    XlsxWriter.write(xlsx, Seq(XlsxWriter.Sheet("s", Seq("v"), Seq(Seq(1.0)))))
    val url = s"jdbc:duckdb:$db"
    XlsxToDatabase.load(spark, xlsx, url, SaveMode.Overwrite)
    XlsxToDatabase.load(spark, xlsx, url, SaveMode.Append)
    XlsxToDatabase.readJdbc(spark, url, "s").count() shouldBe 2
  }
}
