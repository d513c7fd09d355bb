package graft.fuzz

import scala.util.Random

/** ANN-family differential fuzzer (v6 — the vector analogue of
  * [[QueryGen]]). The relational fuzzer shares ONE SQL text between
  * engines; the vector family cannot: Spark's array HOFs (`transform`,
  * `aggregate`, `zip_with`, `slice(start,len)`) and DuckDB's
  * (`list_transform`, `list_sum`, 1-based `[a:b]` slicing) have
  * disjoint spellings. Each [[AnnCase]] therefore carries a
  * (sparkSql, duckSql) PAIR generated from the SAME random parameters
  * over a SELF-CONTAINED corpus: every vector coordinate is a
  * deterministic integer function of (row, coordinate, collapse class),
  * so both engines construct bit-identical data from their own
  * `range()` and every downstream comparison is exact integer
  * arithmetic in doubles (the repo's micro-bridge discipline).
  *
  * Parameters fuzzed per case: dim (1..16), corpus size, query count,
  * k, COLLAPSE class count (c distinct base patterns → many vectors
  * exactly equal → maximal exact-distance ties, stressing the
  * (dist ASC, id ASC) tie-break discipline), jitter amplitude
  * (including 0 = pure duplicates), and for the SQ8 shape a magnitude
  * multiplier sweeping 5 decades (stressing the non-negative-dividend
  * integer-rounding identities that make Spark `div` ≡ DuckDB `//`).
  *
  * Shapes:
  *  - ann_topk:   brute-force exact top-k per query, SQL windows on
  *                both engines;
  *  - ann_assign: nearest-centroid confusion matrix — Spark runs the
  *                FUSED [[graft.functions.ArgminL2Micro]] codegen
  *                expression (the production hot path), DuckDB the
  *                relational ROW_NUMBER argmin: a differential test of
  *                the custom expression itself, per random geometry;
  *  - ann_sq8:    the SQ8 quantization identities (scale, half-away
  *                rounding, reconstruction error) as whole-corpus
  *                checksum aggregates.
  */
object AnnGen {

  final case class AnnCase(name: String, sparkSql: String, duckSql: String)

  /** base(b, j): class-b pattern coordinate, |value| ≤ 20·mult.
    * Injective in b for b < 41 (37 is a unit mod 41), so collapse
    * classes are genuinely distinct patterns. */
  private def baseExpr(bCol: String, jCol: String, mult: Long): String =
    s"((($bCol * 37 + $jCol * 13) % 41 - 20) * $mult)"

  /** jitter(i, j) ∈ [-a, a], deterministic, 0 when a = 0. */
  private def jitterExpr(iCol: String, jCol: String, a: Int): String =
    if (a == 0) "0" else s"(($iCol * 31 + $jCol * 7) % ${2 * a + 1} - $a)"

  private def sparkCorpus(n: Int, dim: Int, c: Int, a: Int, mult: Long): String =
    s"""corpus AS (
       |  SELECT id AS vec_id,
       |    transform(sequence(0, ${dim - 1}), j -> cast(
       |      ${baseExpr(s"(id % $c)", "j", mult)} + ${jitterExpr("id", "j", a)} as double)) AS em
       |  FROM range($n))""".stripMargin

  private def duckCorpus(n: Int, dim: Int, c: Int, a: Int, mult: Long): String =
    s"""corpus AS (
       |  SELECT i AS vec_id,
       |    list_transform(range($dim), j -> CAST(
       |      ${baseExpr(s"(i % $c)", "j", mult)} + ${jitterExpr("i", "j", a)} AS DOUBLE)) AS em
       |  FROM range($n) t(i))""".stripMargin

  private def shapeTopk(r: Random): (String, String) = {
    val dim = 1 + r.nextInt(16)
    val c = 1 + r.nextInt(10)
    val n = 20 + r.nextInt(181)
    val nq = 1 + r.nextInt(5)
    val k = 1 + r.nextInt(10)
    val a = r.nextInt(10)
    val spark =
      s"""WITH ${sparkCorpus(n, dim, c, a, 1000L)},
         |q AS (SELECT vec_id AS qid, em FROM corpus WHERE vec_id < $nq),
         |d AS (
         |  SELECT q.qid, c.vec_id,
         |    aggregate(zip_with(q.em, c.em, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x) AS dist
         |  FROM corpus c CROSS JOIN q),
         |r AS (
         |  SELECT qid, vec_id, dist,
         |    row_number() OVER (PARTITION BY qid ORDER BY dist ASC, vec_id ASC) AS rnk
         |  FROM d)
         |SELECT qid, rnk, vec_id, dist FROM r WHERE rnk <= $k
         |ORDER BY qid ASC, rnk ASC""".stripMargin
    val duck =
      s"""WITH ${duckCorpus(n, dim, c, a, 1000L)},
         |q AS (SELECT vec_id AS qid, em FROM corpus WHERE vec_id < $nq),
         |d AS (
         |  SELECT q.qid, c.vec_id,
         |    list_sum(list_transform(range($dim), i ->
         |      (q.em[i+1] - c.em[i+1]) * (q.em[i+1] - c.em[i+1]))) AS dist
         |  FROM corpus c CROSS JOIN q),
         |r AS (
         |  SELECT qid, vec_id, dist,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, vec_id ASC) AS rnk
         |  FROM d)
         |SELECT qid, rnk, vec_id, dist FROM r WHERE rnk <= $k
         |ORDER BY qid ASC, rnk ASC""".stripMargin
    (spark, duck)
  }

  private def shapeAssign(r: Random): (String, String) = {
    val dim = 1 + r.nextInt(16)
    val c = 2 + r.nextInt(9)
    val n = 20 + r.nextInt(181)
    val a = r.nextInt(10)
    // centroids = the c jitter-free base patterns; vectors of class b
    // sit within jitter of centroid b, and with a = 0 EXACTLY on it —
    // ties then resolve by the (dist, cand) order on both engines
    val spark =
      s"""WITH ${sparkCorpus(n, dim, c, a, 1000L)},
         |cent AS (
         |  SELECT id AS cid,
         |    transform(sequence(0, ${dim - 1}), j -> cast(${baseExpr("id", "j", 1000L)} as double)) AS cvec
         |  FROM range($c)),
         |carr AS (SELECT collect_list(struct(cast(cid as int) AS cand, cvec)) AS cands FROM cent),
         |asg AS (
         |  SELECT c.vec_id % $c AS truec,
         |    cast(argmin_l2_micro(c.em, cands) as bigint) AS assigned
         |  FROM corpus c CROSS JOIN carr)
         |SELECT truec, assigned, COUNT(*) AS n
         |FROM asg GROUP BY 1, 2
         |ORDER BY truec ASC, assigned ASC""".stripMargin
    val duck =
      s"""WITH ${duckCorpus(n, dim, c, a, 1000L)},
         |cent AS (
         |  SELECT i AS cid,
         |    list_transform(range($dim), j -> CAST(${baseExpr("i", "j", 1000L)} AS DOUBLE)) AS cvec
         |  FROM range($c) t(i)),
         |ad AS (
         |  SELECT v.vec_id, c.cid,
         |    list_sum(list_transform(range($dim), i ->
         |      (v.em[i+1] - c.cvec[i+1]) * (v.em[i+1] - c.cvec[i+1]))) AS dist
         |  FROM corpus v CROSS JOIN cent c),
         |asg AS (
         |  SELECT vec_id, cid AS assigned,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
         |  FROM ad)
         |SELECT vec_id % $c AS truec, CAST(assigned AS BIGINT) AS assigned, COUNT(*) AS n
         |FROM asg WHERE rn = 1
         |GROUP BY 1, 2
         |ORDER BY truec ASC, assigned ASC""".stripMargin
    (spark, duck)
  }

  private def shapeSq8(r: Random): (String, String) = {
    val dim = 1 + r.nextInt(16)
    val c = 1 + r.nextInt(10)
    val n = 20 + r.nextInt(181)
    val a = r.nextInt(10)
    val mult = Seq(1L, 10L, 100L, 1000L, 10000L, 100000L)(r.nextInt(6))
    val spark =
      s"""WITH ${sparkCorpus(n, dim, c, a, mult)},
         |sc AS (
         |  SELECT vec_id, em,
         |    greatest(1L, (aggregate(em, 0L, (m, x) -> greatest(m, abs(cast(x as bigint)))) + 126) div 127) AS s
         |  FROM corpus),
         |qv AS (
         |  SELECT vec_id, em, s,
         |    transform(em, x -> CASE WHEN cast(x as bigint) >= 0
         |      THEN (2 * cast(x as bigint) + s) div (2 * s)
         |      ELSE -((-2 * cast(x as bigint) + s) div (2 * s)) END) AS qs
         |  FROM sc),
         |per AS (
         |  SELECT vec_id,
         |    aggregate(qs, 0L, (m, q) -> greatest(m, abs(q))) AS mx,
         |    aggregate(qs, 0L, (acc, q) -> acc + q) AS sq,
         |    aggregate(zip_with(qs, em, (q, x) -> abs(q * s - cast(x as bigint))), 0L, (acc, e) -> acc + e) AS serr
         |  FROM qv)
         |SELECT COUNT(*) AS n_vecs,
         |  CAST(MAX(mx) AS BIGINT) AS max_absq,
         |  CAST(SUM(sq) AS BIGINT) AS sum_q,
         |  CAST(SUM(serr) AS BIGINT) AS sum_abs_err
         |FROM per""".stripMargin
    val duck =
      s"""WITH ${duckCorpus(n, dim, c, a, mult)},
         |sc AS (
         |  SELECT vec_id, em,
         |    GREATEST(1, (list_max(list_transform(em, x -> ABS(CAST(x AS BIGINT)))) + 126) // 127) AS s
         |  FROM corpus),
         |qv AS (
         |  SELECT vec_id, em, s,
         |    list_transform(em, x -> CASE WHEN CAST(x AS BIGINT) >= 0
         |      THEN (2 * CAST(x AS BIGINT) + s) // (2 * s)
         |      ELSE -((-2 * CAST(x AS BIGINT) + s) // (2 * s)) END) AS qs
         |  FROM sc),
         |per AS (
         |  SELECT vec_id,
         |    list_max(list_transform(qs, q -> ABS(q))) AS mx,
         |    CAST(list_sum(qs) AS BIGINT) AS sq,
         |    CAST(list_sum(list_transform(range($dim), i ->
         |      ABS(qs[i+1] * s - CAST(em[i+1] AS BIGINT)))) AS BIGINT) AS serr
         |  FROM qv)
         |SELECT COUNT(*) AS n_vecs,
         |  CAST(MAX(mx) AS BIGINT) AS max_absq,
         |  CAST(SUM(sq) AS BIGINT) AS sum_q,
         |  CAST(SUM(serr) AS BIGINT) AS sum_abs_err
         |FROM per""".stripMargin
    (spark, duck)
  }

  /** v7 (round-8 continuation): RESIDUAL-ALGEBRA differential. Spark
    * runs the PRODUCTION decomposition — fused argmin_l2_micro cell
    * assignment, residual = em − cvec(cell), distances computed against
    * the RECONSTRUCTION cvec + residual — while DuckDB computes the
    * plain exact distance. All coordinates are integers in doubles, so
    * reconstruction is exact and the two top-k lists must agree
    * bit-for-bit per random (dim, cells, jitter, ties) draw: any drift
    * in the residual algebra (the q223–q227 machinery), the fused
    * argmin, or either engine's tie-break surfaces as a mismatch. */
  private def shapeResidual(r: Random): (String, String) = {
    val dim = 1 + r.nextInt(16)
    val c = 2 + r.nextInt(9)
    val n = 20 + r.nextInt(181)
    val nq = 1 + r.nextInt(5)
    val k = 1 + r.nextInt(10)
    val a = r.nextInt(10)
    val spark =
      s"""WITH ${sparkCorpus(n, dim, c, a, 1000L)},
         |cent AS (
         |  SELECT id AS cid,
         |    transform(sequence(0, ${dim - 1}), j -> cast(${baseExpr("id", "j", 1000L)} as double)) AS cvec
         |  FROM range($c)),
         |carr AS (SELECT collect_list(struct(cast(cid as int) AS cand, cvec)) AS cands FROM cent),
         |asg AS (
         |  SELECT v.vec_id, v.em,
         |    cast(argmin_l2_micro(v.em, cands) as bigint) AS cell
         |  FROM corpus v CROSS JOIN carr),
         |res AS (
         |  SELECT a.vec_id, a.cell, c.cvec,
         |    zip_with(a.em, c.cvec, (x, y) -> x - y) AS resid
         |  FROM asg a JOIN cent c ON a.cell = c.cid),
         |q AS (SELECT vec_id AS qid, em FROM corpus WHERE vec_id < $nq),
         |d AS (
         |  SELECT q.qid, v.vec_id,
         |    aggregate(zip_with(q.em, zip_with(v.cvec, v.resid, (cw, rs) -> cw + rs),
         |      (x, y) -> (x - y) * (x - y)), 0D, (acc, z) -> acc + z) AS dist
         |  FROM res v CROSS JOIN q),
         |r AS (
         |  SELECT qid, vec_id, dist,
         |    row_number() OVER (PARTITION BY qid ORDER BY dist ASC, vec_id ASC) AS rnk
         |  FROM d)
         |SELECT qid, rnk, vec_id, dist FROM r WHERE rnk <= $k
         |ORDER BY qid ASC, rnk ASC""".stripMargin
    val duck =
      s"""WITH ${duckCorpus(n, dim, c, a, 1000L)},
         |q AS (SELECT vec_id AS qid, em FROM corpus WHERE vec_id < $nq),
         |d AS (
         |  SELECT q.qid, v.vec_id,
         |    list_sum(list_transform(range($dim), i ->
         |      (q.em[i+1] - v.em[i+1]) * (q.em[i+1] - v.em[i+1]))) AS dist
         |  FROM corpus v CROSS JOIN q),
         |r AS (
         |  SELECT qid, vec_id, dist,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, vec_id ASC) AS rnk
         |  FROM d)
         |SELECT qid, rnk, vec_id, dist FROM r WHERE rnk <= $k
         |ORDER BY qid ASC, rnk ASC""".stripMargin
    (spark, duck)
  }

  /** v7: TWO-STAGE RERANK differential (the q225–q227 discipline). Both
    * engines run the same algorithm from one parameter draw: stage 1
    * ranks by the SQ8-compressed distance (exact query vs dequantized
    * corpus — the ADC regime) and keeps a shortlist of k2 ≥ k; stage 2
    * re-ranks the shortlist at full precision and emits top-k. Stresses
    * shortlist-boundary ties under collapse classes (a = 0 makes whole
    * classes equidistant at BOTH stages) and the quantized/exact rank
    * interleave — per random (dim, cells, jitter, k, k2, magnitude). */
  private def shapeRerank(r: Random): (String, String) = {
    val dim = 1 + r.nextInt(16)
    val c = 1 + r.nextInt(10)
    val n = 20 + r.nextInt(181)
    val nq = 1 + r.nextInt(5)
    val k = 1 + r.nextInt(8)
    val k2 = k + 1 + r.nextInt(10)
    val a = r.nextInt(10)
    val mult = Seq(1L, 100L, 10000L)(r.nextInt(3))
    val spark =
      s"""WITH ${sparkCorpus(n, dim, c, a, mult)},
         |dq AS (
         |  SELECT vec_id, em,
         |    transform(em, x -> cast((CASE WHEN cast(x as bigint) >= 0
         |      THEN (2 * cast(x as bigint) + s) div (2 * s)
         |      ELSE -((-2 * cast(x as bigint) + s) div (2 * s)) END) * s as double)) AS deq
         |  FROM (SELECT vec_id, em,
         |    greatest(1L, (aggregate(em, 0L, (m, x) -> greatest(m, abs(cast(x as bigint)))) + 126) div 127) AS s
         |    FROM corpus)),
         |q AS (SELECT vec_id AS qid, em FROM corpus WHERE vec_id < $nq),
         |s1 AS (
         |  SELECT q.qid, v.vec_id, v.em,
         |    aggregate(zip_with(q.em, v.deq, (x, y) -> (x - y) * (x - y)), 0D, (acc, z) -> acc + z) AS qdist
         |  FROM dq v CROSS JOIN q),
         |sl AS (
         |  SELECT qid, vec_id, em,
         |    row_number() OVER (PARTITION BY qid ORDER BY qdist ASC, vec_id ASC) AS r1
         |  FROM s1),
         |s2 AS (
         |  SELECT sl.qid, sl.vec_id,
         |    aggregate(zip_with(q.em, sl.em, (x, y) -> (x - y) * (x - y)), 0D, (acc, z) -> acc + z) AS dist
         |  FROM sl JOIN q ON sl.qid = q.qid
         |  WHERE sl.r1 <= $k2),
         |r AS (
         |  SELECT qid, vec_id, dist,
         |    row_number() OVER (PARTITION BY qid ORDER BY dist ASC, vec_id ASC) AS rnk
         |  FROM s2)
         |SELECT qid, rnk, vec_id, dist FROM r WHERE rnk <= $k
         |ORDER BY qid ASC, rnk ASC""".stripMargin
    val duck =
      s"""WITH ${duckCorpus(n, dim, c, a, mult)},
         |dq AS (
         |  SELECT vec_id, em,
         |    list_transform(em, x -> CAST((CASE WHEN CAST(x AS BIGINT) >= 0
         |      THEN (2 * CAST(x AS BIGINT) + s) // (2 * s)
         |      ELSE -((-2 * CAST(x AS BIGINT) + s) // (2 * s)) END) * s AS DOUBLE)) AS deq
         |  FROM (SELECT vec_id, em,
         |    GREATEST(1, (list_max(list_transform(em, x -> ABS(CAST(x AS BIGINT)))) + 126) // 127) AS s
         |    FROM corpus)),
         |q AS (SELECT vec_id AS qid, em FROM corpus WHERE vec_id < $nq),
         |s1 AS (
         |  SELECT q.qid, v.vec_id, v.em,
         |    list_sum(list_transform(range($dim), i ->
         |      (q.em[i+1] - v.deq[i+1]) * (q.em[i+1] - v.deq[i+1]))) AS qdist
         |  FROM dq v CROSS JOIN q),
         |sl AS (
         |  SELECT qid, vec_id, em,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY qdist ASC, vec_id ASC) AS r1
         |  FROM s1),
         |s2 AS (
         |  SELECT sl.qid, sl.vec_id,
         |    list_sum(list_transform(range($dim), i ->
         |      (q.em[i+1] - sl.em[i+1]) * (q.em[i+1] - sl.em[i+1]))) AS dist
         |  FROM sl JOIN q ON sl.qid = q.qid
         |  WHERE sl.r1 <= $k2),
         |r AS (
         |  SELECT qid, vec_id, dist,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, vec_id ASC) AS rnk
         |  FROM s2)
         |SELECT qid, rnk, vec_id, dist FROM r WHERE rnk <= $k
         |ORDER BY qid ASC, rnk ASC""".stripMargin
    (spark, duck)
  }

  private val shapes: Seq[(String, Random => (String, String))] = Seq(
    "anntopk" -> shapeTopk _,
    "annassign" -> shapeAssign _,
    "annsq8" -> shapeSq8 _)

  private val shapesV7: Seq[(String, Random => (String, String))] =
    shapes ++ Seq(
      "annresid" -> shapeResidual _,
      "annrerank" -> shapeRerank _)

  def nShapes: Int = shapesV7.size

  /** FROZEN v6 corpus — graded picks (q230–q232) index into this; the
    * same never-change-a-frozen-generator rule as QueryGen.casesVN
    * (CorpusPinSpec pins the md5). */
  def casesV6(seed: Long, n: Int): Seq[AnnCase] =
    (0 until n).map { i =>
      val (shapeName, gen) = shapes(i % shapes.size)
      val r = new Random(seed * 1000003L + i)
      val (spark, duck) = gen(r)
      AnnCase(f"az$i%03d_$shapeName", spark, duck)
    }

  /** FROZEN v7 corpus (round-8 continuation): the v6 shapes plus the
    * residual-algebra and two-stage-rerank differentials. New seed
    * stream (prefix b, multiplier 1000033) so v6 cases are untouched. */
  def casesV7(seed: Long, n: Int): Seq[AnnCase] =
    (0 until n).map { i =>
      val (shapeName, gen) = shapesV7(i % shapesV7.size)
      val r = new Random(seed * 1000033L + i)
      val (spark, duck) = gen(r)
      AnnCase(f"bz$i%03d_$shapeName", spark, duck)
    }

  /** Current ANN grammar (campaign + AnnFuzzSpec default). */
  def cases(seed: Long, n: Int): Seq[AnnCase] = casesV7(seed, n)
}
