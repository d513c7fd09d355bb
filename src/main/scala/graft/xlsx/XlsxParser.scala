package graft.xlsx

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

/** Streaming OOXML spreadsheet parser on JDK-only primitives
  * (java.util.zip + StAX) — no POI. Covers the SpreadsheetML subset that
  * xlsx→database tools consume:
  *
  *  - workbook.xml sheet list (+ 1904-date-system flag) resolved through
  *    workbook.xml.rels to worksheet parts
  *  - sharedStrings.xml including rich-text runs (all <t> under an <si>
  *    are concatenated)
  *  - styles.xml cellXfs → numFmtId, with date-format detection for both
  *    builtin ids (14–22, 45–47) and custom formats (date letters outside
  *    brackets/quotes)
  *  - worksheet cells: t ∈ {s, str, inlineStr, b, e, d, n/absent}, sparse
  *    rows (missing r attributes), A1 references, blank cells
  *
  * Cells stream row-by-row (constant memory in rows); sharedStrings is
  * the only fully materialized part, as in every streaming xlsx reader.
  */
object XlsxParser {

  sealed trait CellValue
  case class XString(s: String) extends CellValue
  /** A numeric cell; `isDate` means its style carries a date number
    * format, which is the ONLY way OOXML distinguishes dates. */
  case class XNumber(d: Double, isDate: Boolean) extends CellValue
  case class XBool(b: Boolean) extends CellValue
  /** ISO-8601 date cell (t="d", rare). */
  case class XIsoDate(iso: String) extends CellValue
  case object XBlank extends CellValue

  case class SheetInfo(name: String, partName: String)
  case class Workbook(sheets: Seq[SheetInfo], date1904: Boolean)

  /** `hasAnyCell` is true when the row had ANY valued cell BEFORE column
    * pruning — required so `count(*)` under full pruning still sees every
    * row. */
  case class Row(rowIndex: Int, cells: Array[(Int, CellValue)], hasAnyCell: Boolean)

  /** One factory PER THREAD: `XMLInputFactory` implementations are not
    * specified thread-safe for concurrent `createXMLStreamReader` (the
    * JDK's SJSXP serializes/reuses internal reader state), and a scan
    * schedules one task per workbook — a shared factory made 32-thread
    * directory scans contend on reader creation. */
  private val factories: ThreadLocal[XMLInputFactory] =
    ThreadLocal.withInitial { () =>
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
      f
    }
  private def factory: XMLInputFactory = factories.get()

  /** "B3" → 0-based column 1. */
  def colOf(ref: String): Int = {
    var c = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    c - 1
  }

  def parseWorkbook(zip: ZipFile): Workbook = {
    // rId -> target from workbook rels
    val rels = scala.collection.mutable.Map[String, String]()
    val relEntry = zip.getEntry("xl/_rels/workbook.xml.rels")
    if (relEntry != null) {
      withReader(zip.getInputStream(relEntry)) { r =>
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
            val id = r.getAttributeValue(null, "Id")
            val target = r.getAttributeValue(null, "Target")
            if (id != null && target != null)
              rels(id) = if (target.startsWith("/")) target.drop(1)
                         else if (target.startsWith("xl/")) target
                         else "xl/" + target
          }
        }
      }
    }
    val sheets = ArrayBuffer[SheetInfo]()
    var date1904 = false
    withReader(zip.getInputStream(zip.getEntry("xl/workbook.xml"))) { r =>
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT) r.getLocalName match {
          case "workbookPr" =>
            val v = r.getAttributeValue(null, "date1904")
            date1904 = v != null && (v == "1" || v.equalsIgnoreCase("true"))
          case "sheet" =>
            val name = r.getAttributeValue(null, "name")
            val rid = (0 until r.getAttributeCount)
              .find(i => r.getAttributeLocalName(i) == "id")
              .map(r.getAttributeValue)
            val part = rid.flatMap(rels.get).getOrElse(s"xl/worksheets/sheet${sheets.size + 1}.xml")
            sheets += SheetInfo(name, part)
          case _ =>
        }
      }
    }
    Workbook(sheets.toSeq, date1904)
  }

  def parseSharedStrings(zip: ZipFile): Array[String] = {
    val e = zip.getEntry("xl/sharedStrings.xml")
    if (e == null) return Array.empty
    val out = ArrayBuffer[String]()
    withReader(zip.getInputStream(e)) { r =>
      var inSi = false
      var sb: StringBuilder = null
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
            inSi = true; sb = new StringBuilder
          case XMLStreamConstants.START_ELEMENT if inSi && r.getLocalName == "t" =>
            sb.append(r.getElementText)
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
            inSi = false; out += sb.toString
          case _ =>
        }
      }
    }
    out.toArray
  }

  /** style index → is-date-format, from cellXfs numFmtIds. */
  def parseDateStyles(zip: ZipFile): Array[Boolean] = {
    val e = zip.getEntry("xl/styles.xml")
    if (e == null) return Array.empty
    val customFmts = scala.collection.mutable.Map[Int, String]()
    val xfFmtIds = ArrayBuffer[Int]()
    withReader(zip.getInputStream(e)) { r =>
      var inCellXfs = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
              val code = r.getAttributeValue(null, "formatCode")
              if (id.isDefined && code != null) customFmts(id.get) = code
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfFmtIds += Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt).getOrElse(0)
            case _ =>
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" => inCellXfs = false
          case _ =>
        }
      }
    }
    xfFmtIds.map(id => isDateFormat(id, customFmts.get(id))).toArray
  }

  private val builtinDateIds: Set[Int] = ((14 to 22) ++ (45 to 47)).toSet

  def isDateFormat(numFmtId: Int, code: Option[String]): Boolean = {
    if (builtinDateIds.contains(numFmtId)) return true
    code match {
      case None => false
      case Some(fmt) =>
        // date letters count only outside [brackets] and "quoted" runs
        var inBracket = false; var inQuote = false; var i = 0; var hit = false
        while (i < fmt.length && !hit) {
          val ch = fmt.charAt(i)
          if (inQuote) { if (ch == '"') inQuote = false }
          else if (inBracket) { if (ch == ']') inBracket = false }
          else ch match {
            case '"' => inQuote = true
            case '[' => inBracket = true
            case '\\' => i += 1
            case 'y' | 'm' | 'd' | 'h' | 's' | 'Y' | 'M' | 'D' | 'H' | 'S' => hit = true
            case _ =>
          }
          i += 1
        }
        hit
    }
  }

  /** Pull-based row iterator over one worksheet part: each `next()`
    * advances the StAX stream just far enough to complete one row, so a
    * consumer holds at most ONE row on heap regardless of sheet size (the
    * shared-strings pool is the only fully materialized part). Malformed
    * numeric text (shared-string index, style index, cell value, row
    * index) degrades to a blank cell / sequential row number instead of
    * failing the task — same PERMISSIVE convention as
    * [[TypeInference.convert]] — unless `failFast` is set, in which case
    * a malformed cell aborts the scan with row/column context (the csv
    * FAILFAST analogue). Close (or exhaust) to release the stream.
    *
    * `wantCol` gates cell VALUE materialization for column pruning
    * (pruned cells are parsed structurally but their text is skipped). */
  final class RowIterator private[xlsx] (
      zip: ZipFile, partName: String, shared: Array[String],
      dateStyle: Array[Boolean], wantCol: Int => Boolean,
      failFast: Boolean = false)
      extends Iterator[Row] with AutoCloseable {

    private def bad(what: String, value: String): CellValue =
      if (failFast)
        throw new IllegalArgumentException(
          s"malformed $what '$value' at row ${rowIdx + 1}, column ${cellCol + 1} of $partName (mode=FAILFAST)")
      else XBlank

    private val in: InputStream = {
      val entry = zip.getEntry(partName)
      require(entry != null, s"missing worksheet part $partName")
      zip.getInputStream(entry)
    }
    private val r: XMLStreamReader = factory.createXMLStreamReader(in)
    private var closed = false
    private var pending: Row = _

    // parse state carried across advance() calls
    private var cells = ArrayBuffer[(Int, CellValue)]()
    private var rowHasCell = false
    private var rowIdx = -1
    private var nextCol = 0
    private var cellCol = 0
    private var cellType: String = null
    private var cellStyled = false
    private var inV = false
    private var inIs = false
    private var text: StringBuilder = null
    private var isText: StringBuilder = null

    /** Parse until one row completes; sets `pending` (or closes at EOF). */
    private def advance(): Unit = {
      while (pending == null && !closed && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" =>
              cells = ArrayBuffer()
              rowHasCell = false
              nextCol = 0
              rowIdx = Option(r.getAttributeValue(null, "r"))
                .flatMap(_.toIntOption).map(_ - 1).getOrElse(rowIdx + 1)
            case "c" =>
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref != null) colOf(ref) else nextCol
              nextCol = cellCol + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellStyled = Option(r.getAttributeValue(null, "s"))
                .flatMap(_.toIntOption)
                .exists(si => si >= 0 && si < dateStyle.length && dateStyle(si))
            case "v" => inV = true; text = new StringBuilder
            case "is" => inIs = true; isText = new StringBuilder
            case "t" if inIs => isText.append(r.getElementText)
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inV =>
            text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" => inV = false
            case "is" => inIs = false
            case "c" =>
              if ((text != null && text.nonEmpty) || isText != null) rowHasCell = true
              if (wantCol(cellCol)) {
                val v: CellValue = cellType match {
                  case "s" =>
                    if (text == null) XBlank
                    else text.toString.trim.toIntOption match {
                      case Some(i) if i >= 0 && i < shared.length => XString(shared(i))
                      case _ => bad("shared-string reference", text.toString)
                    }
                  case "inlineStr" => if (isText == null) XBlank else XString(isText.toString)
                  case "str" => if (text == null) XBlank else XString(text.toString)
                  case "b" => if (text == null) XBlank else XBool(text.toString.trim == "1")
                  case "e" => XBlank
                  case "d" => if (text == null) XBlank else XIsoDate(text.toString.trim)
                  case _ => // numeric
                    if (text == null) XBlank
                    else text.toString.trim.toDoubleOption match {
                      case Some(d) => XNumber(d, cellStyled)
                      case None => bad("numeric cell", text.toString)
                    }
                }
                if (v != XBlank) cells += ((cellCol, v))
              }
              text = null; isText = null
            case "row" =>
              pending = Row(rowIdx, cells.toArray, rowHasCell)
            case _ =>
          }
          case _ =>
        }
      }
      if (pending == null) close()
    }

    override def hasNext: Boolean = {
      if (pending == null && !closed) advance()
      pending != null
    }
    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException(s"end of $partName")
      val out = pending; pending = null; out
    }
    override def close(): Unit = if (!closed) {
      closed = true
      try r.close() finally in.close()
    }
  }

  /** Open a pull-based iterator over one worksheet (see [[RowIterator]]). */
  def rowIterator(zip: ZipFile, partName: String, shared: Array[String],
                  dateStyle: Array[Boolean], wantCol: Int => Boolean,
                  failFast: Boolean = false): RowIterator =
    new RowIterator(zip, partName, shared, dateStyle, wantCol, failFast)

  /** Loop adapter over [[rowIterator]]: the callback sees each row once,
    * in document order. */
  def foreachRow(zip: ZipFile, partName: String, shared: Array[String],
                 dateStyle: Array[Boolean], wantCol: Int => Boolean)(f: Row => Unit): Unit = {
    val it = rowIterator(zip, partName, shared, dateStyle, wantCol)
    try while (it.hasNext) f(it.next()) finally it.close()
  }

  /** Excel serial number → epoch microseconds (UTC). 1900 system: base
    * 1899-12-30 for serials ≥ 61, base 1899-12-31 for serials < 61 — the
    * POI-style adjustment for Lotus's fictitious 1900-02-29 (serial 60),
    * so serials 1–59 map to 1900-01-01..1900-02-28 exactly as Excel
    * displays them. 1904 system: base 1904-01-01. */
  def serialToMicros(serial: Double, date1904: Boolean): Long = {
    // 25569 / 25568 / 24107 days before 1970-01-01 respectively.
    val baseDays =
      if (date1904) 24107L
      else if (serial < 61.0) 25568L
      else 25569L
    Math.round(serial * 86400e6) - baseDays * 86400000000L
  }

  private def withReader[A](in: InputStream)(f: XMLStreamReader => A): A = {
    val r = factory.createXMLStreamReader(in)
    try f(r) finally { r.close(); in.close() }
  }
}
