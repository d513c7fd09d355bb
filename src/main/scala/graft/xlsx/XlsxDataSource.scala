package graft.xlsx

import java.util
import java.util.zip.ZipFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 xlsx reader: `spark.read.format("xlsx")
  * .option("sheet", name).option("headerRow", true)
  * .option("inferSchema", true).load(path)`.
  *
  * - One `InputPartition` per FILE: a worksheet's XML is one deflate
  *   stream and is not splittable, so the parallelism unit at scale is
  *   the file (a 100 TB xlsx corpus is many files; Spark schedules one
  *   task per file and the scan stays embarrassingly parallel — same
  *   contract as gzip'd CSV/JSON).
  * - Column pruning is pushed down (`SupportsPushDownRequiredColumns`):
  *   pruned cells skip value materialization inside the StAX loop.
  * - Schema inference is a driver-side sampling pass over the first file
  *   (csv-style two-phase read); pass an explicit schema to skip it.
  *
  * Options: `sheet` (name), `sheetIndex` (0-based position, used when
  * `sheet` is absent; default = first sheet), `headerRow` (default
  * true), `inferSchema` (default true), `sampleRows` (default 10000).
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xlsx"
  override def supportsExternalMetadata(): Boolean = true

  private def files(options: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("xlsx source requires a path"))
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.getName.toLowerCase.endsWith(".xlsx")).map(_.getPath).sorted.toSeq
    else Seq(path)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XlsxDataSource.inferFromFirstFile(files(options), options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new XlsxTable(schema, files(options), options)
  }
}

object XlsxDataSource {
  case class Opts(sheet: Option[String], sheetIndex: Option[Int],
                  headerRow: Boolean, inferTypes: Boolean, sampleRows: Int)

  def opts(o: CaseInsensitiveStringMap): Opts = Opts(
    Option(o.get("sheet")),
    Option(o.get("sheetIndex")).map(_.toInt),
    o.getBoolean("headerRow", true),
    o.getBoolean("inferSchema", true),
    Option(o.get("sampleRows")).map(_.toInt).getOrElse(10000))

  /** Sheet selection: by name, else by 0-based index, else the first. */
  def resolveSheet(zip: ZipFile, o: Opts): XlsxParser.SheetInfo = {
    val wb = XlsxParser.parseWorkbook(zip)
    (o.sheet, o.sheetIndex) match {
      case (Some(n), _) => wb.sheets.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no sheet named '$n'; have ${wb.sheets.map(_.name).mkString(", ")}"))
      case (None, Some(i)) =>
        if (i >= 0 && i < wb.sheets.length) wb.sheets(i)
        else throw new IllegalArgumentException(
          s"sheetIndex $i out of range; workbook has ${wb.sheets.length} sheets")
      case (None, None) => wb.sheets.headOption.getOrElse(
        throw new IllegalArgumentException("workbook has no sheets"))
    }
  }

  def inferFromFirstFile(paths: Seq[String], options: CaseInsensitiveStringMap): TypeInference.SheetSchema = {
    val o = opts(options)
    val zip = new ZipFile(paths.head)
    try {
      val wb = XlsxParser.parseWorkbook(zip)
      val sheet = resolveSheet(zip, o)
      TypeInference.infer(zip, sheet.partName, XlsxParser.parseSharedStrings(zip),
        XlsxParser.parseDateStyles(zip), wb.date1904, o.headerRow, o.inferTypes, o.sampleRows)
    } finally zip.close()
  }
}

class XlsxTable(tblSchema: StructType, paths: Seq[String], options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"xlsx(${paths.mkString(",")})"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(tblSchema, paths, XlsxDataSource.opts(options))
}

class XlsxScanBuilder(fullSchema: StructType, paths: Seq[String], o: XlsxDataSource.Opts)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = fullSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve declaration order of the full schema
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => keep.contains(f.name)))
  }
  /** Opportunistic pushdown: rows failing a supported predicate are
    * dropped inside the scan, but EVERY filter is also returned as
    * residual so Spark re-applies it — double evaluation is semantically
    * safe and keeps unsupported corner semantics exact. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(XlsxFilterEval.supported(fullSchema, _))
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan = new XlsxScan(fullSchema, required, paths, o, pushed)
}

class XlsxScan(fullSchema: StructType, required: StructType, paths: Seq[String],
               o: XlsxDataSource.Opts,
               pushed: Array[org.apache.spark.sql.sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"XlsxScan paths=${paths.size} requiredColumns=[${required.fieldNames.mkString(",")}]" +
      s" PushedFilters=[${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => XlsxInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(fullSchema, required, o, pushed)
}

/** Serializable row-level evaluator for the pushdown-supported subset of
  * source filters (string/double/boolean equality and comparisons, null
  * tests) against the reader's converted values. */
object XlsxFilterEval {
  import org.apache.spark.sql.sources._

  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, v) => comparable(schema, a, v)
    case GreaterThan(a, v) => comparable(schema, a, v)
    case GreaterThanOrEqual(a, v) => comparable(schema, a, v)
    case LessThan(a, v) => comparable(schema, a, v)
    case LessThanOrEqual(a, v) => comparable(schema, a, v)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case And(l, r) => supported(schema, l) && supported(schema, r)
    case _ => false
  }

  private def comparable(schema: StructType, attr: String, v: Any): Boolean =
    schema.fields.exists(f => f.name == attr && (f.dataType match {
      case StringType | DoubleType | BooleanType => v != null
      case _ => false
    }))

  /** value: internal representation (UTF8String/Double/Boolean) or null. */
  private def cmp(value: Any, v: Any): Option[Int] = (value, v) match {
    case (null, _) => None
    case (s: org.apache.spark.unsafe.types.UTF8String, x: String) => Some(s.toString.compareTo(x))
    case (d: java.lang.Double, x: Number) => Some(java.lang.Double.compare(d, x.doubleValue()))
    case (b: java.lang.Boolean, x: Boolean) => Some(b.compareTo(x))
    case _ => None
  }

  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v) => cmp(get(a), v).contains(0)
    case GreaterThan(a, v) => cmp(get(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(a), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(get(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(get(a), v).exists(_ <= 0)
    case IsNull(a) => get(a) == null
    case IsNotNull(a) => get(a) != null
    case And(l, r) => eval(l, get) && eval(r, get)
    case _ => true
  }
}

case class XlsxInputPartition(path: String) extends InputPartition

class XlsxReaderFactory(fullSchema: StructType, required: StructType, o: XlsxDataSource.Opts,
                        pushed: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new XlsxPartitionReader(partition.asInstanceOf[XlsxInputPartition].path, fullSchema, required, o, pushed)
}

/** Streams one file's chosen sheet with a PULL-based parser: each
  * `next()` advances the StAX stream one row, so a task holds at most one
  * row (plus the shared-strings pool) on heap no matter how large the
  * sheet is, and limit/early-termination stop the decode mid-stream. */
class XlsxPartitionReader(path: String, fullSchema: StructType, required: StructType,
                          o: XlsxDataSource.Opts,
                          pushed: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReader[InternalRow] {

  private val requiredIdx: Array[Int] = required.fields.map(f => fullSchema.fieldIndex(f.name))
  private val wanted: Set[Int] = requiredIdx.toSet
  // only evaluate filters whose columns this scan actually reads
  private val fieldPos: Map[String, Int] = required.fieldNames.zipWithIndex.toMap
  private val applicable: Array[org.apache.spark.sql.sources.Filter] =
    pushed.filter(_.references.forall(fieldPos.contains))

  private val zip = new ZipFile(path)
  private val wb = XlsxParser.parseWorkbook(zip)
  private val rows: XlsxParser.RowIterator = {
    val sheet = XlsxDataSource.resolveSheet(zip, o)
    XlsxParser.rowIterator(zip, sheet.partName, XlsxParser.parseSharedStrings(zip),
      XlsxParser.parseDateStyles(zip), wanted.contains)
  }
  private var headerSkipped = !o.headerRow
  private var current: InternalRow = _

  /** Convert one parsed row; None when a pushed filter rejects it. */
  private def convert(row: XlsxParser.Row): Option[InternalRow] = {
    val vals = new Array[Any](requiredIdx.length)
    val m = row.cells.toMap
    var i = 0
    while (i < requiredIdx.length) {
      val col = requiredIdx(i)
      val dt = fullSchema.fields(col).dataType
      val cv = m.getOrElse(col, XlsxParser.XBlank)
      vals(i) = TypeInference.convert(cv, dt, wb.date1904) match {
        case s: String => UTF8String.fromString(s)
        case other => other
      }
      i += 1
    }
    if (applicable.isEmpty ||
        applicable.forall(XlsxFilterEval.eval(_, name => vals(fieldPos(name)))))
      Some(new GenericInternalRow(vals))
    else None
  }

  override def next(): Boolean = {
    while (rows.hasNext) {
      val row = rows.next()
      if (row.hasAnyCell) {
        if (!headerSkipped) headerSkipped = true
        else convert(row) match {
          case Some(r) => current = r; return true
          case None =>
        }
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = { try rows.close() finally zip.close() }
}
