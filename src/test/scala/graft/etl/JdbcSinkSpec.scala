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

  test("JDBC read-back pushes filters into the database (no full-table pull)") {
    // at scale the JDBC source must ship predicates to the database —
    // pulling a full table through one connection to filter in Spark is
    // the anti-pattern. Spark's JDBC relation compiles catalyst filters
    // to dialect SQL; the plan records them as PushedFilters.
    val dir = Files.createTempDirectory("etlpush")
    val xlsx = dir.resolve("book.xlsx").toString
    val db = dir.resolve("t.duckdb").toString
    XlsxWriter.write(xlsx, Seq(XlsxWriter.Sheet("S", Seq("id", "score"),
      (1 to 50).map(i => Seq(i.toDouble, i * 1.5)))))
    val url = s"jdbc:duckdb:$db"
    XlsxToDatabase.load(spark, xlsx, url, SaveMode.Overwrite)
    val df = XlsxToDatabase.readJdbc(spark, url, "s")
      .filter(org.apache.spark.sql.functions.col("id") > 40.0)
    val plan = df.queryExecution.executedPlan.toString
    plan should include regex "PushedFilters: \\[.*id.*\\]"
    df.count() shouldBe 10L
  }

  test("CLI argument parsing covers mode, sheet selection, and errors") {
    val a = Main.parse(Seq("book.xlsx", "jdbc:duckdb:x", "--append",
      "--sheet", "s1", "--sheet", "s2"))
    a.mode shouldBe SaveMode.Append
    a.sheets shouldBe Some(Seq("s1", "s2"))
    Main.parse(Seq("b.xlsx", "url")).mode shouldBe SaveMode.Overwrite
    an[IllegalArgumentException] should be thrownBy Main.parse(Seq("only-one"))
    an[IllegalArgumentException] should be thrownBy Main.parse(Seq("a", "b", "--bogus"))
    an[IllegalArgumentException] should be thrownBy Main.parse(Seq("a", "b", "--sheet"))
  }

  test("CLI run loads only the selected sheet") {
    val dir = Files.createTempDirectory("etl3")
    val xlsx = dir.resolve("book.xlsx").toString
    val db = dir.resolve("t.duckdb").toString
    XlsxWriter.write(xlsx, Seq(
      XlsxWriter.Sheet("keep", Seq("v"), Seq(Seq(1.0), Seq(2.0))),
      XlsxWriter.Sheet("skip", Seq("v"), Seq(Seq(3.0)))))
    val loaded = Main.run(spark,
      Main.Args(xlsx, s"jdbc:duckdb:$db", SaveMode.Overwrite, Some(Seq("keep")), None, "unused"))
    loaded.map(t => (t.table, t.rows)) shouldBe Seq(("keep", 2L))
    XlsxToDatabase.readJdbc(spark, s"jdbc:duckdb:$db", "keep").count() shouldBe 2
    an[Exception] should be thrownBy XlsxToDatabase
      .readJdbc(spark, s"jdbc:duckdb:$db", "skip").count()
    an[IllegalArgumentException] should be thrownBy Main.run(spark,
      Main.Args(xlsx, s"jdbc:duckdb:$db", SaveMode.Overwrite, Some(Seq("nope")), None, "unused"))
  }

  test("CLI --export reverses the ETL: JDBC table -> workbook directory") {
    val dir = Files.createTempDirectory("etl4")
    val xlsx = dir.resolve("book.xlsx").toString
    val db = dir.resolve("t.duckdb").toString
    val url = s"jdbc:duckdb:$db"
    XlsxWriter.write(xlsx, Seq(XlsxWriter.Sheet("People", Seq("id", "name"),
      Seq(Seq(1.0, "alice"), Seq(2.0, "bob")))))
    XlsxToDatabase.load(spark, xlsx, url)
    val out = dir.resolve("export").toString
    val r = Main.run(spark,
      Main.Args(out, url, SaveMode.Overwrite, None, Some("people"), "unused"))
    r.head.rows shouldBe 2L
    val back = spark.read.format("xlsx").load(out)
    back.count() shouldBe 2
    back.columns.toSeq shouldBe Seq("id", "name")
  }

  test("upsert updates matched keys, inserts new ones, and re-runs are no-ops") {
    val dir = Files.createTempDirectory("etl5")
    val db = dir.resolve("t.duckdb").toString
    val url = s"jdbc:duckdb:$db"
    val v1 = dir.resolve("v1.xlsx").toString
    XlsxWriter.write(v1, Seq(XlsxWriter.Sheet("People", Seq("id", "name", "score"),
      Seq(Seq(1.0, "alice", 1.0), Seq(2.0, "bob", 2.0)))))
    // first load creates the table through the same upsert path
    XlsxToDatabase.load(spark, v1, url, upsertKeys = Some(Seq("id")))
    // v2 updates bob, adds carol, leaves alice untouched
    val v2 = dir.resolve("v2.xlsx").toString
    XlsxWriter.write(v2, Seq(XlsxWriter.Sheet("People", Seq("id", "name", "score"),
      Seq(Seq(2.0, "bob", 20.0), Seq(3.0, "carol", 3.0)))))
    XlsxToDatabase.load(spark, v2, url, upsertKeys = Some(Seq("id")))
    // duckdb_jdbc tears the shared file instance down when the last
    // connection closes; a read that reopens the file in that instant can
    // transiently miss the catalog (observed once under parallel-suite
    // load). One bounded retry absorbs the driver race without weakening
    // any assertion — the values themselves are still checked exactly.
    def state() = {
      def once() = XlsxToDatabase.readJdbc(spark, url, "people").orderBy("id").collect()
        .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2))).toSeq
      try once() catch {
        // schema resolution raises SQLException on the driver; task-side
        // failures surface as SparkException — retry either once
        case scala.util.control.NonFatal(_) => Thread.sleep(250); once()
      }
    }
    state() shouldBe Seq((1.0, "alice", 1.0), (2.0, "bob", 20.0), (3.0, "carol", 3.0))
    // idempotent: the same drop again changes nothing (append would duplicate)
    XlsxToDatabase.load(spark, v2, url, upsertKeys = Some(Seq("id")))
    state() shouldBe Seq((1.0, "alice", 1.0), (2.0, "bob", 20.0), (3.0, "carol", 3.0))
    // no staging leftovers (staging names are per-run UUIDs)
    XlsxToDatabase.readJdbc(spark, url,
        "(SELECT count(*) AS c FROM information_schema.tables " +
          "WHERE table_name LIKE 'people__upsert%') x")
      .collect()(0).getAs[Number](0).longValue() shouldBe 0L
    // key column must exist
    an[IllegalArgumentException] should be thrownBy
      XlsxToDatabase.load(spark, v2, url, upsertKeys = Some(Seq("nope")))
  }

  test("upsert survives DUPLICATE task attempts: doubled staging rows merge once") {
    // a speculative or retried JDBC writer task commits its partition
    // into the staging table a second time (Spark's JDBC sink transacts
    // per partition ATTEMPT; local mode can't run real speculation, so
    // the spec stages the identical rows twice — the exact state a
    // duplicate attempt produces). The DISTINCT merge must collapse
    // them: the target sees each row once, on create AND on merge.
    val dir = Files.createTempDirectory("etl7")
    val url = s"jdbc:duckdb:${dir.resolve("t.duckdb")}"
    val spk = spark
    import spk.implicits._
    val v1 = Seq((1.0, "alice", 1.0), (2.0, "bob", 2.0)).toDF("id", "name", "score")
    XlsxToDatabase.upsert(v1.union(v1), url, "people", Seq("id"))
    def state() = XlsxToDatabase.readJdbc(spark, url, "people").orderBy("id").collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2))).toSeq
    state() shouldBe Seq((1.0, "alice", 1.0), (2.0, "bob", 2.0))
    // merge branch: doubled revision batch updates bob, inserts carol — once
    val v2 = Seq((2.0, "bob", 20.0), (3.0, "carol", 3.0)).toDF("id", "name", "score")
    XlsxToDatabase.upsert(v2.union(v2), url, "people", Seq("id"))
    state() shouldBe Seq((1.0, "alice", 1.0), (2.0, "bob", 20.0), (3.0, "carol", 3.0))
  }

  test("upsert treats NULL keys as matching themselves (idempotent re-runs)") {
    val dir = Files.createTempDirectory("etl6")
    val url = s"jdbc:duckdb:${dir.resolve("t.duckdb")}"
    val book = dir.resolve("b.xlsx").toString
    // one row's key cell is empty → NULL key; plain `=` would re-insert
    // it on every run (NULL = NULL is not true)
    XlsxWriter.write(book, Seq(XlsxWriter.Sheet("T", Seq("k", "v"),
      Seq(Seq(1.0, "a"), Seq(null, "orphan")))))
    XlsxToDatabase.load(spark, book, url, upsertKeys = Some(Seq("k")))
    XlsxToDatabase.load(spark, book, url, upsertKeys = Some(Seq("k")))
    XlsxToDatabase.readJdbc(spark, url, "t").count() shouldBe 2
  }

  test("CLI --upsert parses key lists and rejects empty ones") {
    Main.parse(Seq("b.xlsx", "url", "--upsert", "id,ts")).upsertKeys shouldBe Some(Seq("id", "ts"))
    an[IllegalArgumentException] should be thrownBy Main.parse(Seq("a", "b", "--upsert"))
    an[IllegalArgumentException] should be thrownBy Main.parse(Seq("a", "b", "--upsert", " , "))
    // --export reads FROM the database; combining it with --upsert would
    // silently drop the upsert — reject instead
    an[IllegalArgumentException] should be thrownBy
      Main.parse(Seq("a", "b", "--export", "t", "--upsert", "id"))
    // --append would be silently ignored with --upsert — reject too
    an[IllegalArgumentException] should be thrownBy
      Main.parse(Seq("a", "b", "--append", "--upsert", "id"))
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
