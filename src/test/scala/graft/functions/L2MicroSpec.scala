package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class L2MicroSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** The interpreted HOF composite l2_micro replaces (q99's original
    * formulation): round-to-micro, zip, square, in-order fold. */
  private val composite =
    "aggregate(zip_with(transform(a, x -> round(cast(x as double) * 1000000.0, 0)), b, " +
      "(e, c) -> (e - c) * (e - c)), cast(0.0 as double), (acc, x) -> acc + x)"

  test("codegen expression is bit-identical to the HOF composite on fixture vectors") {
    L2Micro.register(spark)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = emb.select(col("vec_id").as("qid"), col("embedding").as("a")).filter(col("qid") < 20)
    val b = emb.select(col("vec_id").as("nid"),
      expr("transform(embedding, x -> round(cast(x as double) * 1000000.0, 0))").as("b"))
      .filter(col("nid") < 20)
    val both = a.crossJoin(b).select(
      expr("l2_micro(a, b)").as("fused"), expr(composite).as("composite"))
    both.filter(col("fused") =!= col("composite")).count() shouldBe 0
    // self-distance is exactly zero (identical micro values cancel)
    a.crossJoin(b).filter(col("qid") === col("nid"))
      .select(expr("l2_micro(a, b)").as("d"))
      .filter(col("d") =!= 0.0).count() shouldBe 0
  }

  test("property: fused == composite for arbitrary float vectors (incl. extremes)") {
    L2Micro.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(42) // seeded: deterministic across runs
    val edges = Array(0f, -0f, 0.5f, -0.5f, 1.5e-7f, 123.456f, -999.999f)
    def vec(): Array[Float] = Array.tabulate(8) { i =>
      rng.nextInt(4) match {
        case 0 => edges(rng.nextInt(edges.length))
        case 1 => (rng.nextFloat() - 0.5f) * 2f
        case _ => (rng.nextFloat() - 0.5f) * 2000f
      }
    }
    val cases = Seq.fill(40)((vec(), vec()))
    val df = cases.toDF("af", "bf")
      .select(col("af").as("a"),
        expr("transform(bf, x -> round(cast(x as double) * 1000000.0, 0))").as("b"))
      .select(expr("l2_micro(a, b)").as("fused"), expr(composite).as("composite"))
    df.filter(col("fused") =!= col("composite")).count() shouldBe 0
  }

  test("interpreted eval path matches a hand computation") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val a = Literal(ArrayData.toArrayData(Array(0.25f, -0.5f)), ArrayType(FloatType))
    val b = Literal(ArrayData.toArrayData(Array(250000.0, 0.0)), ArrayType(DoubleType))
    val got = L2Micro(a, b).eval(null).asInstanceOf[Double]
    got shouldBe (0.0 + 500000.0 * 500000.0)
  }

  test("type checking rejects mismatched array types") {
    L2Micro.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b") // both array<double>
    an[Exception] should be thrownBy df.select(expr("l2_micro(a, b)")).collect()
  }
}
