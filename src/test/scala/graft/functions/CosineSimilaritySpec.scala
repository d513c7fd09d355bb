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

  test("type checking rejects non-float arrays") {
    CosineSimilarity.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b") // array<double>
    an[Exception] should be thrownBy df.select(expr("cosine_sim(a, b)")).collect()
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
