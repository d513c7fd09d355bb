package graft.queries

import graft.{GraftConf, SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Product-quantization invariants (q216/q217): 8 one-byte codes per
  * vector, 64-element reconstruction, a ≤8×256 codebook of integer
  * micro codewords, bit-parity of the fused PqEncodeMicro expression
  * against an independent explode+window argmin, and the certificate
  * contract (recall ≤ 1, fixture-calibrated floor; geo ≥ label). */
class PqSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("every vector gets 8 codes in [0, 255] and a 64-element reconstruction") {
    val bad = VectorQuant.pqQuantized(spark, sf)
      .filter(expr("size(codes) != 8 OR size(dv) != 64 OR " +
        "exists(codes, c -> c < 0 OR c > 255) OR " +
        "exists(dv, x -> x != cast(x as bigint))")) // codewords are micro-rounded integers
      .count()
    bad shouldBe 0L
  }

  test("fused encode matches an independent explode+window argmin bit-for-bit") {
    import spark.implicits._
    // Re-derive every (vec_id, j) code by the fan-out shape the oracle
    // uses: explode vectors × codebook entries of the same subspace,
    // rank by (dist ASC, code ASC). Any drift in the fused expression's
    // distance arithmetic, early exit, or tie order shows here.
    val q = VectorQuant.pqQuantized(spark, sf).select("vec_id", "em", "codes").cache()
    val fused = q.select(col("vec_id"), posexplode(col("codes")).as(Seq("j", "code")))
    val cb = VectorQuant.pqCodebookForTest(spark, sf)
    val indep = q.select(col("vec_id"), col("em"),
        posexplode(expr("transform(sequence(0, 7), j -> slice(em, j * 8 + 1, 8))")).as(Seq("j", "sv")))
      .join(cb, "j")
      .withColumn("dist", expr(
        "aggregate(zip_with(sv, cw, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)"))
      .groupBy("vec_id", "j")
      .agg(min(struct(col("dist"), col("code"))).as("m"))
      .select(col("vec_id"), col("j"), col("m.code").as("icode"))
    val diff = fused.join(indep, Seq("vec_id", "j"))
      .filter(col("code") =!= col("icode")).count()
    diff shouldBe 0L
    q.unpersist()
  }

  test("reconstruction never increases the distance to the vector's own codeword set") {
    // dv is the concatenation of per-subspace NEAREST codewords, so for
    // every subspace the reconstructed slice is at least as close to the
    // original subvector as any other codeword of that subspace — spot
    // check: recon subspace distance equals the minimum over the codebook.
    val q = VectorQuant.pqQuantized(spark, sf).limit(50)
    val cb = VectorQuant.pqCodebookForTest(spark, sf)
    val viol = q.select(col("vec_id"), col("em"), col("dv"),
        posexplode(expr("sequence(0, 7)")).as(Seq("x", "j")))
      .select(col("vec_id"), col("j"),
        expr("aggregate(zip_with(slice(em, j * 8 + 1, 8), slice(dv, j * 8 + 1, 8), (a, b) -> (a - b) * (a - b)), 0D, (acc, v) -> acc + v)").as("drec"),
        expr("slice(em, j * 8 + 1, 8)").as("sv"))
      .join(cb, "j")
      .withColumn("dcand", expr(
        "aggregate(zip_with(sv, cw, (a, b) -> (a - b) * (a - b)), 0D, (acc, v) -> acc + v)"))
      .filter(col("dcand") < col("drec"))
      .count()
    viol shouldBe 0L
  }

  test("certificate: PQ recall is fixture-calibrated and geo >= label recall") {
    val r = GraftConf.scoped(spark) {
      SparkEntry.queries("q217_pq_recall")(spark, sf).head()
    }
    r.getAs[Double]("recall") should be <= 1.0
    // 8 B/vector (32× compression) argmin survival on the fixture
    // geometry — measured 0.786 (sf0.001) / 0.752 (sf0.01); the exact
    // value is the oracle-graded quantity, this floor only guards
    // against a silent codebook collapse.
    r.getAs[Double]("recall") should be > 0.6
    r.getAs[Double]("geo_recall") should be >= r.getAs[Double]("recall")
  }

  test("spark.graft.pq.m knob: more subspaces -> higher recall, m=64 near-lossless") {
    // m bytes/vector trades compression for recall. The knob only
    // changes the Spark plan (Verify clears spark.graft.* before
    // grading, so the pinned m=8 oracle is never mismatched).
    def recallAt(m: Int): Double = GraftConf.scoped(spark) {
      spark.conf.set("spark.graft.pq.m", m.toString)
      SparkEntry.queries("q217_pq_recall")(spark, sf).head().getAs[Double]("recall")
    }
    val r8 = recallAt(8)
    val r16 = recallAt(16)
    val r64 = recallAt(64)
    info(s"pq recall by m: 8=$r8 16=$r16 64=$r64")
    r16 should be >= r8
    r64 should be >= r16
    r64 should be > 0.9
  }

  test("q229 graded m=16 point: knob-free, equals the knob path, dominates m=8") {
    // q229 pins m=16 STRUCTURALLY (no conf), so the graded row can't
    // drift from the knob-driven curve above
    val g16 = GraftConf.scoped(spark) {
      SparkEntry.queries("q229_pq16_recall")(spark, sf).head().getAs[Double]("recall")
    }
    val k16 = GraftConf.scoped(spark) {
      spark.conf.set("spark.graft.pq.m", "16")
      SparkEntry.queries("q217_pq_recall")(spark, sf).head().getAs[Double]("recall")
    }
    val g8 = GraftConf.scoped(spark) {
      SparkEntry.queries("q217_pq_recall")(spark, sf).head().getAs[Double]("recall")
    }
    info(s"graded m=16 recall = $g16 (knob path $k16, m=8 floor $g8)")
    g16 shouldBe k16
    g16 should be >= g8
  }

  test("codebook: at most 8×256 entries, 8-dim integer-micro codewords, deterministic rerun") {
    val cb = VectorQuant.pqCodebookForTest(spark, sf).cache()
    cb.count() should be <= (8L * 256L)
    cb.filter(expr("size(cw) != 8 OR exists(cw, x -> x != cast(x as bigint))")).count() shouldBe 0L
    val a = cb.orderBy("j", "code").collect().map(_.toString)
    val b = VectorQuant.pqCodebookForTest(spark, sf).orderBy("j", "code").collect().map(_.toString)
    a should contain theSameElementsInOrderAs b
    cb.unpersist()
  }
}
