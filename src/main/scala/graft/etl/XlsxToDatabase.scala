package graft.etl

import java.util.Properties
import java.util.zip.ZipFile
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The reference tool's end-to-end identity: load every sheet of an xlsx
  * workbook into a database, one table per sheet, with inferred schemas
  * and sanitized table/column names.
  *
  * Spark-first shape: each sheet becomes a DataFrame via the custom DSv2
  * xlsx source (schema inference + column pruning live there), and the
  * write is `df.write.jdbc` — batched inserts, per-partition connections,
  * retry/txn semantics from Spark's JDBC sink. At scale the same call
  * fans out one writer task per partition.
  */
object XlsxToDatabase {

  case class LoadedTable(sheet: String, table: String, rows: Long)

  def sheetNames(xlsxPath: String): Seq[String] = {
    val zip = new ZipFile(xlsxPath)
    try graft.xlsx.XlsxParser.parseWorkbook(zip).sheets.map(_.name)
    finally zip.close()
  }

  def readSheet(spark: SparkSession, xlsxPath: String, sheet: String,
                headerRow: Boolean = true, inferSchema: Boolean = true): DataFrame =
    spark.read.format("xlsx")
      .option("sheet", sheet)
      .option("headerRow", headerRow)
      .option("inferSchema", inferSchema)
      .load(xlsxPath)

  def sanitizeTableName(sheet: String): String =
    graft.xlsx.TypeInference.sanitizeNames(Seq(sheet)).head

  /** Load sheets → JDBC tables. `mode` matches the reference-class
    * tool's append/replace switch; `onlySheets` restricts to named
    * sheets (default: every sheet, one table each). */
  def load(spark: SparkSession, xlsxPath: String, jdbcUrl: String,
           mode: SaveMode = SaveMode.Overwrite,
           connectionProps: Properties = new Properties(),
           onlySheets: Option[Seq[String]] = None): Seq[LoadedTable] = {
    DuckDbDialect.registered
    val all = sheetNames(xlsxPath)
    val chosen = onlySheets match {
      case None => all
      case Some(w) =>
        val missing = w.filterNot(all.contains)
        require(missing.isEmpty,
          s"no such sheet(s): ${missing.mkString(", ")}; have ${all.mkString(", ")}")
        all.filter(w.contains)
    }
    chosen.map { sheet =>
      val df = readSheet(spark, xlsxPath, sheet)
      val table = sanitizeTableName(sheet)
      df.write.mode(mode).jdbc(jdbcUrl, table, connectionProps)
      LoadedTable(sheet, table, df.count())
    }
  }

  /** Read back a table over JDBC (verification path). */
  def readJdbc(spark: SparkSession, jdbcUrl: String, table: String,
               connectionProps: Properties = new Properties()): DataFrame = {
    DuckDbDialect.registered
    spark.read.jdbc(jdbcUrl, table, connectionProps)
  }
}
