package graft.xlsx

import java.nio.file.Files
import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property-based roundtrip using raw scalacheck generators (the
  * scalatest bridge artifact is not in the offline cache): arbitrary
  * rectangular grids survive write→read exactly (modulo the xlsx type
  * lattice), under a fixed deterministic seed schedule. */
class XlsxPropertySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val cellGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.chooseNum(-1e6, 1e6).map(d => math.rint(d * 100) / 100.0),
    Gen.oneOf(true, false),
    Gen.const(null))

  private val gridGen: Gen[(Int, List[List[Any]])] = for {
    nCols <- Gen.chooseNum(1, 6)
    nRows <- Gen.chooseNum(1, 25)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, cellGen))
  } yield (nCols, rows)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("arbitrary grids roundtrip through write+read (12 samples)") {
    samples(gridGen, 12).zipWithIndex.foreach { case ((nCols, rows0), k) =>
      val rows = rows0.zipWithIndex.map { case (r, i) =>
        if (r.forall(_ == null)) r.updated(0, s"row$i") else r
      }
      val header = (0 until nCols).map(i => s"c$i")
      val path = Files.createTempDirectory("xlsxprop").resolve(s"g$k.xlsx").toString
      XlsxWriter.write(path, Seq(XlsxWriter.Sheet("S", header, rows)))
      val df = spark.read.format("xlsx").option("inferSchema", false).load(path)
      val got = df.collect().map(_.toSeq.map(v => if (v == null) null else v.toString))
      val want = rows.map(_.map {
        case null => null
        case d: Double => if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
        case other => other.toString
      })
      withClue(s"sample $k (cols=$nCols rows=${rows.size}): ") {
        got.length shouldBe want.length
        got.zip(want).foreach { case (g, w) => g.toSeq shouldBe w.toSeq }
      }
    }
  }

  test("sanitizeNames is collision-free and identifier-shaped") {
    samples(Gen.listOfN(8, Gen.asciiPrintableStr.map(_.take(12))), 25).foreach { names =>
      val s1 = TypeInference.sanitizeNames(names)
      s1.distinct.size shouldBe s1.size
      s1.foreach(n => n should fullyMatch regex "[a-z_][a-z0-9_]*")
    }
  }
}
