package graft.functions

import graft.TestSpark
import graft.queries.Llm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CosineSimilaritySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("codegen expression is bit-identical to the zip_with/aggregate composite") {
    CosineSimilarity.register(spark)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = emb.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .filter(col("qid") < 20)
      .crossJoin(emb.select(col("vec_id").as("nid"), col("embedding").as("ee")).filter(col("nid") < 20))
    val both = pairs.select(col("qid"), col("nid"),
      expr("cosine_sim(qe, ee)").as("fused"),
      Llm.dotCosComposite(col("qe"), col("ee")).as("composite"))
    val diff = both.filter(col("fused") =!= col("composite")).count()
    diff shouldBe 0
    // sanity: self-similarity is exactly 1 or within an ulp of it
    val self = both.filter(col("qid") === col("nid"))
      .select(abs(col("fused") - 1.0).as("e")).agg(max("e")).collect()(0).getDouble(0)
    self should be < 1e-6
  }

  test("type checking: float and double arms accepted, mixed/integer rejected") {
    CosineSimilarity.register(spark)
    import spark.implicits._
    // double arm (the SQ8 micro domain, q234) computes like the float arm
    val dd = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val got = dd.select(expr("cosine_sim(a, b)")).collect()(0).getDouble(0)
    val want = (1.0 * 3 + 2.0 * 4) / (math.sqrt(1.0 + 4) * math.sqrt(9.0 + 16))
    got shouldBe want
    // integer arrays and mixed float/double still rejected
    val ii = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    an[Exception] should be thrownBy ii.select(expr("cosine_sim(a, b)")).collect()
    val mixed = Seq((Seq(1.0f, 2.0f), Seq(3.0, 4.0))).toDF("a", "b")
    an[Exception] should be thrownBy mixed.select(expr("cosine_sim(a, b)")).collect()
  }

  test("double arm: interpreted eval matches codegen on micro-integer data") {
    CosineSimilarity.register(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val a = Literal(ArrayData.toArrayData(Array(1000000.0, -2000000.0)), ArrayType(DoubleType))
    val b = Literal(ArrayData.toArrayData(Array(3000000.0, 4000000.0)), ArrayType(DoubleType))
    val got = CosineSimilarity(a, b).eval(null).asInstanceOf[Double]
    val dot = 1000000.0 * 3000000.0 + (-2000000.0) * 4000000.0
    val want = dot / (math.sqrt(1e12 + 4e12) * math.sqrt(9e12 + 16e12))
    got shouldBe want
    // and via SQL (codegen path) on the same values
    import spark.implicits._
    val df = Seq((Seq(1000000.0, -2000000.0), Seq(3000000.0, 4000000.0))).toDF("a", "b")
    df.select(expr("cosine_sim(a, b)")).collect()(0).getDouble(0) shouldBe want
  }

  test("interpreted eval path matches codegen path") {
    // evaluate the expression directly (no codegen) on literal data
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val a = Literal(ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f)), ArrayType(FloatType))
    val b = Literal(ArrayData.toArrayData(Array(4.0f, 5.0f, 6.0f)), ArrayType(FloatType))
    val got = CosineSimilarity(a, b).eval(null).asInstanceOf[Double]
    val dot = 1.0 * 4 + 2.0 * 5 + 3.0 * 6
    val want = dot / (math.sqrt(1.0 + 4 + 9) * math.sqrt(16.0 + 25 + 36))
    got shouldBe want
  }
}
