package graft.etl

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SaveMode parity of the DuckDB bulk fast path (staged parquet +
  * set-based CTAS/INSERT) with Spark's generic JDBC sink semantics —
  * the contract XlsxToDatabase.load/upsert now rides on. */
class DuckDbBulkLoadSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def freshUrl(): String =
    s"jdbc:duckdb:${Files.createTempDirectory("bulk").resolve("t.duckdb")}"

  private def df(n: Int, offset: Int = 0) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong + offset, s"v${i + offset}", i % 2 == 0))
      .toDF("id", "s", "flag")
  }

  private def tableRows(url: String, table: String): Seq[Long] = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(s"""SELECT id FROM "$table" ORDER BY id""")
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      while (rs.next()) out += rs.getLong(1)
      out.toSeq
    } finally c.close()
  }

  test("overwrite replaces; returned count is rows loaded") {
    val url = freshUrl()
    DuckDbBulkLoad.write(df(3), url, "t", SaveMode.Overwrite) shouldBe 3L
    DuckDbBulkLoad.write(df(2, 10), url, "t", SaveMode.Overwrite) shouldBe 2L
    tableRows(url, "t") shouldBe Seq(11L, 12L)
  }

  test("append creates-if-absent then accumulates") {
    val url = freshUrl()
    DuckDbBulkLoad.write(df(2), url, "t", SaveMode.Append) shouldBe 2L
    DuckDbBulkLoad.write(df(2, 5), url, "t", SaveMode.Append) shouldBe 2L
    tableRows(url, "t") shouldBe Seq(1L, 2L, 6L, 7L)
  }

  test("errorIfExists fails on present table, creates on absent") {
    val url = freshUrl()
    DuckDbBulkLoad.write(df(2), url, "t", SaveMode.ErrorIfExists) shouldBe 2L
    an[IllegalStateException] should be thrownBy
      DuckDbBulkLoad.write(df(1), url, "t", SaveMode.ErrorIfExists)
  }

  test("ignore is a no-op on present table (returns 0)") {
    val url = freshUrl()
    DuckDbBulkLoad.write(df(2), url, "t", SaveMode.Ignore) shouldBe 2L
    DuckDbBulkLoad.write(df(5, 50), url, "t", SaveMode.Ignore) shouldBe 0L
    tableRows(url, "t") shouldBe Seq(1L, 2L)
  }

  test("types survive the parquet staging: strings, booleans, nulls, timestamps") {
    import spark.implicits._
    val url = freshUrl()
    val d = Seq(
      (1L, Option("a"), Option(true), Option(java.sql.Timestamp.valueOf("2024-03-01 10:30:00"))),
      (2L, None, None, None)
    ).toDF("id", "s", "b", "ts")
    DuckDbBulkLoad.write(d, url, "t", SaveMode.Overwrite) shouldBe 2L
    val back = XlsxToDatabase.readJdbc(spark, url, "t").orderBy("id").collect()
    back(0).getString(1) shouldBe "a"
    back(0).getBoolean(2) shouldBe true
    back(0).getTimestamp(3) shouldBe java.sql.Timestamp.valueOf("2024-03-01 10:30:00")
    back(1).isNullAt(1) shouldBe true
    back(1).isNullAt(2) shouldBe true
    back(1).isNullAt(3) shouldBe true
  }

  test("staging directory is cleaned up on success and on failure") {
    val url = freshUrl()
    // a private staging parent: asserting on it (instead of a census of
    // the shared java.io.tmpdir) can't race with other tests/processes
    val parent = Files.createTempDirectory("bulk_staging_probe")
    DuckDbBulkLoad.write(df(2), url, "t", SaveMode.Overwrite, stagingParent = Some(parent))
    an[IllegalStateException] should be thrownBy
      DuckDbBulkLoad.write(df(1), url, "t", SaveMode.ErrorIfExists, stagingParent = Some(parent))
    parent.toFile.listFiles() shouldBe empty
  }

  test("append maps columns BY NAME when the table's column order differs") {
    val url = freshUrl()
    // existing table declares (s, id, flag) — different order than the df
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().execute(
      """CREATE TABLE t (s VARCHAR, id BIGINT, flag BOOLEAN)""")
    finally c.close()
    DuckDbBulkLoad.write(df(2), url, "t", SaveMode.Append) shouldBe 2L
    val c2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery("SELECT s, id FROM t ORDER BY id")
      rs.next(); rs.getString(1) shouldBe "v1"; rs.getLong(2) shouldBe 1L
      rs.next(); rs.getString(1) shouldBe "v2"; rs.getLong(2) shouldBe 2L
    } finally c2.close()
  }
}
