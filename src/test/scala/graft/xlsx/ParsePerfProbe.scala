package graft.xlsx
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
object ParsePerfProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $tag n=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def iterate(): Long = {
      val zip = new ZipFile(path)
      val wb = XlsxParser.parseWorkbook(zip)
      val shared = XlsxParser.parseSharedStrings(zip)
      val it = XlsxParser.rowIterator(zip, wb.sheets.head.partName, shared,
        Array.fill(64)(false), _ => true)
      var n = 0L; while (it.hasNext) { n += it.next().cells.length }
      it.close(); zip.close(); n
    }
    iterate(); iterate() // warm
    t("raw-stax-events") {
      val zip = new ZipFile(path)
      val wb = XlsxParser.parseWorkbook(zip)
      val in = zip.getInputStream(zip.getEntry(wb.sheets.head.partName))
      val f = XMLInputFactory.newInstance()
      val r = f.createXMLStreamReader(in)
      var n = 0L
      while (r.hasNext) { if (r.next() == XMLStreamConstants.START_ELEMENT) n += 1 }
      r.close(); in.close(); zip.close(); n
    }
    t("rows-iterator") { iterate() }
    t("rows-iterator2") { iterate() }
  }
}
