package graft.xlsx

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame

/** Minimal OOXML workbook writer (JDK-only), the inverse of XlsxParser.
  * Exists for (a) round-trip testing of the reader against independently
  * constructed files and (b) exporting small result sets — xlsx is not a
  * splittable big-data format, so there is deliberately no distributed
  * write path (the scale-out sink is JDBC/parquet; see graft.etl).
  *
  * Supports: multiple sheets, header rows, shared or inline strings,
  * doubles, booleans, timestamps (as serial numbers with a date style),
  * nulls (blank cells), and the 1904 date system flag.
  */
object XlsxWriter {

  case class Sheet(name: String, header: Seq[String], rows: Seq[Seq[Any]])

  def write(path: String, sheets: Seq[Sheet], useSharedStrings: Boolean = true,
            date1904: Boolean = false): Unit = {
    val out = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try writeTo(out, sheets, useSharedStrings, date1904) finally out.close()
  }

  /** Collects a DataFrame to the driver — guarded; test/export helper. */
  def writeDataFrame(df: DataFrame, path: String, sheetName: String = "Sheet1",
                     maxRows: Int = 1000000): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows, s"refusing to write >$maxRows rows to a single xlsx")
    write(path, Seq(Sheet(sheetName, df.columns.toSeq, rows.map(_.toSeq).toSeq)))
  }

  private def writeTo(z: ZipOutputStream, sheets: Seq[Sheet],
                      shared: Boolean, date1904: Boolean): Unit = {
    val sharedPool = scala.collection.mutable.LinkedHashMap[String, Int]()
    def sharedIdx(s: String): Int = sharedPool.getOrElseUpdate(s, sharedPool.size)

    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }

    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |""".stripMargin +
        sheets.indices.map(i =>
          s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n") +
        """
          |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
          |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
          |</Types>""".stripMargin)

    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)

    val sheetTags = sheets.zipWithIndex.map { case (s, i) =>
      s"""<sheet name="${esc(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    entry("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<workbookPr date1904="${if (date1904) "1" else "0"}"/>
         |<sheets>$sheetTags</sheets>
         |</workbook>""".stripMargin)

    val relTags = sheets.indices.map(i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString
    entry("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |$relTags
         |<Relationship Id="rIdSS" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
         |<Relationship Id="rIdSt" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
         |</Relationships>""".stripMargin)

    // style 0: general; style 1: builtin date format 14 (mm/dd/yyyy)
    entry("xl/styles.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>
        |<borders count="1"><border/></borders>
        |<cellStyleXfs count="1"><xf/></cellStyleXfs>
        |<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs>
        |</styleSheet>""".stripMargin)

    sheets.zipWithIndex.foreach { case (s, i) =>
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      var rowIdx = 1
      def cellRef(c: Int, r: Int): String = {
        var n = c + 1; val letters = new StringBuilder
        while (n > 0) { val rem = (n - 1) % 26; letters.insert(0, ('A' + rem).toChar); n = (n - 1) / 26 }
        letters.append(r).toString
      }
      def writeRow(values: Seq[Any]): Unit = {
        sb.append(s"""<row r="$rowIdx">""")
        values.zipWithIndex.foreach { case (v, c) =>
          val ref = cellRef(c, rowIdx)
          v match {
            case null => // blank: omit cell entirely (sparse row)
            case s0: String =>
              if (shared) sb.append(s"""<c r="$ref" t="s"><v>${sharedIdx(s0)}</v></c>""")
              else sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${esc(s0)}</t></is></c>""")
            case b: Boolean => sb.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
            case d: Double => sb.append(s"""<c r="$ref"><v>${fmtNum(d)}</v></c>""")
            case f: Float => sb.append(s"""<c r="$ref"><v>${fmtNum(f.toDouble)}</v></c>""")
            case n: Int => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case n: Long => sb.append(s"""<c r="$ref"><v>$n</v></c>""")
            case n: java.math.BigDecimal => sb.append(s"""<c r="$ref"><v>${n.toPlainString}</v></c>""")
            case t: java.sql.Timestamp =>
              val serial = dateSerial(t.getTime / 86400000.0, date1904)
              sb.append(s"""<c r="$ref" s="1"><v>${fmtNum(serial)}</v></c>""")
            case t: java.time.Instant =>
              val micros = t.getEpochSecond * 1000000L + t.getNano / 1000
              val serial = dateSerial(micros / 86400e6, date1904)
              sb.append(s"""<c r="$ref" s="1"><v>${fmtNum(serial)}</v></c>""")
            case d: java.sql.Date =>
              val serial = dateSerial(d.toLocalDate.toEpochDay.toDouble, date1904)
              sb.append(s"""<c r="$ref" s="1"><v>${fmtNum(serial)}</v></c>""")
            case other =>
              if (shared) sb.append(s"""<c r="$ref" t="s"><v>${sharedIdx(other.toString)}</v></c>""")
              else sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>""")
          }
        }
        sb.append("</row>")
        rowIdx += 1
      }
      if (s.header.nonEmpty) writeRow(s.header)
      s.rows.foreach(writeRow)
      sb.append("</sheetData></worksheet>")
      entry(s"xl/worksheets/sheet${i + 1}.xml", sb.toString)
    }

    val ssItems = sharedPool.keysIterator.map(s => s"<si><t>${esc(s)}</t></si>").mkString
    entry("xl/sharedStrings.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedPool.size}" uniqueCount="${sharedPool.size}">$ssItems</sst>""".stripMargin)
  }

  /** Epoch days (fractional) → Excel serial, the exact inverse of
    * XlsxParser.serialToMicros: 1900 system serials below 61 use the
    * 1899-12-31 base (Lotus 1900-02-29 adjustment). */
  private def dateSerial(epochDays: Double, date1904: Boolean): Double =
    if (date1904) epochDays + 24107
    else {
      val s = epochDays + 25569
      if (s < 61) s - 1 else s
    }

  private def fmtNum(d: Double): String =
    if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def esc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\t' | '\n' | '\r' => sb.append(c)
        // XML 1.0 forbids the remaining C0 controls, U+FFFE/U+FFFF and
        // lone surrogates even as character references: strip them so the
        // workbook stays readable by any conformant parser (incl. ours).
        // Well-paired surrogates (supplementary chars) pass through.
        case _ if c < ' ' || c == '\uFFFE' || c == '\uFFFF' =>
        case _ if Character.isHighSurrogate(c) =>
          if (i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))) {
            sb.append(c).append(s.charAt(i + 1)); i += 1
          }
        case _ if Character.isLowSurrogate(c) => // lone low surrogate: strip
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
