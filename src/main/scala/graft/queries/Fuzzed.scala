package graft.queries

import graft.FuzzVerify
import graft.fuzz.QueryGen

/** Graded slice of the differential-fuzz corpus (VERDICT r4 #2).
  *
  * The full campaign runs out-of-band (FuzzVerify + oracle_check.py;
  * 1,250 cases across seeds {42, 7, 123, 999} × sf0.001 and seed 42 ×
  * sf0.01 — all green, see FUZZ.md). These rows pin one generated
  * case per grammar shape into the driver's own correctness gate: the
  * Spark side executes the generated SQL text via `spark.sql`, and the
  * SAME text is the DuckDB oracle — so the graded surface now includes
  * machine-generated queries whose dialect portability is enforced by
  * the generator's mitigation catalog (QueryGen M1–M15) rather than by
  * a human author knowing the edges.
  *
  * Keys are stable; the SQL is a pure function of (seed=42, index), and
  * the generator is frozen by FuzzSpec's determinism pin. Spark and the
  * oracle always receive identical text, so a future grammar change
  * cannot desynchronize the pair — it just re-pins both sides at once.
  */
object Fuzzed extends QueryModule {
  private val corpus = QueryGen.casesV1(42L, 250).toVector
  private val corpusV3 = QueryGen.casesV3(42L, 250).toVector
  private val corpusV4 = QueryGen.casesV4(42L, 250).toVector

  /** One representative index per shape (shape = index mod 7 in the v1
    * corpus, mod 17 in the v3 corpus), chosen for non-trivial row counts
    * at BOTH sf0.001 and sf0.01 so the graded rows certify values, not
    * emptiness. */
  private val picks = Seq(
    "q189_fuzz_filter" -> 14,
    "q190_fuzz_agg"    -> 64,
    "q191_fuzz_join"   -> 79,
    "q192_fuzz_setop"  -> 24,
    "q193_fuzz_window" -> 109,
    "q194_fuzz_scalar" -> 19,
    "q195_fuzz_nested" -> 34)

  /** v3 composition shapes (round 6): 3-table join-agg, conditional
    * aggregation, window-over-join, RANGE value frames, union-agg. */
  private val picksV3 = Seq(
    "q196_fuzz_multijoin"  -> 216,
    "q197_fuzz_caseagg"    -> 81,
    "q198_fuzz_joinwindow" -> 99,
    "q199_fuzz_rangeframe" -> 83,
    "q200_fuzz_unionagg"   -> 118)

  /** v4 shapes (round 6, second batch): ANSI FILTER-clause aggregates
    * and literal-anchored INTERVAL arithmetic. */
  private val picksV4 = Seq(
    "q203_fuzz_filteragg"     -> 112,
    "q204_fuzz_intervalarith" -> 189)

  private val corpusV5 = QueryGen.casesV5(42L, 250).toVector

  /** v5 shapes (round 7): correlated LATERAL top-k, bounded ROWS
    * frames, EXISTS-under-aggregation. */
  private val picksV5 = Seq(
    "q210_fuzz_lateral"      -> 19,
    "q211_fuzz_boundedframe" -> 130,
    "q212_fuzz_existsagg"    -> 219)

  private val corpusV6 = graft.fuzz.AnnGen.casesV6(42L, 300).toVector

  /** v6 ANN shapes (round 8): self-contained vector micro-corpora,
    * Spark/DuckDB DIALECT-PAIR cases (array HOF spellings are disjoint,
    * so unlike v1–v5 the two engines each get their own text generated
    * from the same parameters — the ann_assign Spark side runs the
    * fused argmin_l2_micro codegen expression against DuckDB's
    * relational argmin). Campaign: 300 cases seed 42, all green
    * (FUZZ.md). */
  private val picksV6 = Seq(
    "q230_fuzz_ann_topk"   -> 252,
    "q231_fuzz_ann_assign" -> 286,
    "q232_fuzz_ann_sq8"    -> 299)

  private val corpusV7 = graft.fuzz.AnnGen.casesV7(42L, 300).toVector

  /** v7 ANN shapes (round-8 continuation): the residual-algebra
    * differential (Spark runs the production fused-argmin → residual →
    * reconstruct → distance decomposition, DuckDB the direct exact
    * distance — equal iff the q223+ residual algebra is exact) and the
    * two-stage rerank (SQ8-shortlist → exact re-rank, the q225–q227
    * discipline, dialect-pair). Campaigns: 600 cases seeds 42/7, all
    * green (FUZZ.md). */
  private val picksV7 = Seq(
    "q236_fuzz_ann_residual" -> 298,
    "q237_fuzz_ann_rerank"   -> 299)

  private val corpusV8 = graft.fuzz.AnnGen.casesV8(42L, 300).toVector

  /** v8 ANN shapes (round 9): each of the round's new expressions
    * fuzzed against an independent reference — dense_lut_micro +
    * pq_adc_micro vs a relational join-ADC (q246), the cov_outer_micro
    * 128-bit limb aggregate vs DuckDB's native HUGEINT sums (q247), and
    * pq_encode_shift_micro vs the relational residual argmin (q248).
    * Campaign: 600 cases seeds 42/7, all green (FUZZ.md). */
  private val picksV8 = Seq(
    "q246_fuzz_ann_lut"   -> 293,
    "q247_fuzz_ann_cov"   -> 294,
    "q248_fuzz_ann_shift" -> 295)

  private val corpusV9 = graft.fuzz.AnnGen.casesV9(42L, 300).toVector

  /** v9 ANN shape (round 10): the q250/q251 Householder reflector
    * arithmetic — sqrt-normalize, cancellation-free sign choice,
    * reflect, re-round — as a dialect-pair differential per random
    * (dim, target axis, direction class incl. the ww=0 identity and
    * pure-negative-axis guard paths). Graded picks: a dim-8
    * negative-ramp reflection (q253) and the pure-negative-axis sign
    * path (q254). Campaign: 900 cases seeds 42/7 (sf0.001) +
    * 123 (sf0.01), all green (FUZZ.md §v9). */
  private val picksV9 = Seq(
    "q253_fuzz_ann_householder"      -> 260,
    "q254_fuzz_ann_householder_axis" -> 287)

  private def rows(cs: Vector[QueryGen.FuzzCase], ps: Seq[(String, Int)]): Seq[(String, Q)] =
    ps.map { case (key, i) =>
      val sql = cs(i).sql
      key -> Q(sql) { (s, d) =>
        FuzzVerify.registerViews(s, d)
        s.sql(sql)
      }
    }

  private def annRows(cs: Vector[graft.fuzz.AnnGen.AnnCase], ps: Seq[(String, Int)]): Seq[(String, Q)] =
    ps.map { case (key, i) =>
      val c = cs(i)
      key -> Q(c.duckSql) { (s, _) =>
        graft.functions.ArgminL2Micro.register(s)
        graft.functions.PqAdcMicro.register(s)
        graft.functions.PqEncodeMicro.register(s)
        graft.functions.CovOuterMicro.register(s)
        s.sql(c.sparkSql)
      }
    }

  override def queries: Seq[(String, Q)] =
    rows(corpus, picks) ++ rows(corpusV3, picksV3) ++ rows(corpusV4, picksV4) ++
      rows(corpusV5, picksV5) ++ annRows(corpusV6, picksV6) ++ annRows(corpusV7, picksV7) ++
      annRows(corpusV8, picksV8) ++ annRows(corpusV9, picksV9)
}
