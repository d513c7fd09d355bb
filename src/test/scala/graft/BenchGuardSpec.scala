package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Reusable stage-isolation probe (the round-9 diagnosis method, made a
  * helper per the round-9 verdict's ask): the O(width²) LUT build hid
  * under a BroadcastExchange for two rounds because scan time masked
  * build time in every end-to-end measurement. `buildCost` times a
  * LIMIT-1 read THROUGH a query's full join graph — every broadcast
  * build (codebook trains, LUT scatters, probe relations) must run, but
  * ~no corpus rows flow — so a hidden superlinear build constant
  * surfaces isolated from the scan it normally hides under. */
object StageProbe {
  def wall[T](f: => T): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Seconds to read ONE row through the DataFrame's full build graph. */
  def buildCost(df: DataFrame): Double = wall(df.limit(1).collect())
}

/** Bench-regression tripwires (round-9 verdict ask #4). Ceilings are
  * DELIBERATELY generous — 3-4× the measured walls on a loaded local[4]
  * test JVM, because host-level CPU allocation on this box swings
  * identical-code bench totals by ~40% and a flaking guard teaches
  * people to ignore it — while a reintroduced quadratic constant (the
  * round-8/9 class of bug is 30×+) still trips loudly. Measured
  * baselines are recorded per test via info(). */
class BenchGuardSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Wall-clock ceilings are HOST-LOAD sensitive even at 3-4x headroom
    * (a saturated CI box can flake them, and a flaking guard teaches
    * people to ignore it — the round-10 ADVICE finding). The ceilings
    * therefore only ASSERT when SPARK_GRAFT_BENCH_GUARD=1 (the
    * bench-host profile); everywhere else the probes still RUN and
    * record their measurement via info(), so the numbers stay visible
    * in every CI log without the flake risk. Structural assertions
    * (no query errored, probe shapes) stay on unconditionally. */
  private val assertCeilings = sys.env.get("SPARK_GRAFT_BENCH_GUARD").contains("1")

  private def ceiling(measured: Double, limit: Double, what: String): Unit =
    if (assertCeilings) assert(measured < limit, f"$what: $measured%.2f s >= ceiling $limit%.1f s")
    else info(f"$what: $measured%.2f s (ceiling $limit%.1f s not asserted; set SPARK_GRAFT_BENCH_GUARD=1)")

  private def familyWall(prefixes: Seq[String]): Seq[(String, Double)] = {
    val qs = QueryRegistry.all.filter { case (n, _) => prefixes.exists(n.startsWith) }
    qs.map(_._1) should not be empty
    Bench.timeQueries(spark, sf, qs, iters = 1)
  }

  test("dense-LUT scatter is one-pass: 2000 LUT rows at m=16 width stay far under the quadratic floor") {
    // the EXACT regression class of round 8/9: the map-fill LUT densify
    // was O(width²) boxed element_at probes per row. Measured on this
    // host: the old `transform(sequence(w), i -> element_at(map, i))`
    // shape needs 67 s for just 50 rows at this width (≈2 700 s for the
    // 2 000 rows timed here); the one-pass dense_lut_micro scatter does
    // all 2 000 in ~2 s idle / ~7 s under full-verify load. Ceiling
    // 30 s = ~4× loaded headroom, >100× below the quadratic shape — a
    // reintroduction trips here without waiting for a full-bench diff.
    graft.functions.DenseLutMicro.register(spark)
    val width = 16 * 256
    val t = StageProbe.wall {
      spark.range(2000)
        .selectExpr(
          s"transform(sequence(0, ${width - 1}), p -> named_struct('pos', cast(p as int), 'd', cast(p + id as double))) AS pd")
        .selectExpr(s"dense_lut_micro(pd, $width) AS lut")
        .selectExpr("size(lut) AS n")
        .agg(org.apache.spark.sql.functions.sum("n")).collect()
    }
    info(f"2000 dense LUT rows at width $width: $t%.2f s")
    ceiling(t, 30.0, "dense LUT scatter")
  }

  test("stage-isolation probe: ADC top-k build cost (books + LUTs, no scan) stays bounded") {
    // q218's broadcast side builds the PQ book (2 Lloyd iterations) and
    // the per-query dense LUTs; the corpus scan is the other 99% of the
    // plan. LIMIT 1 runs the builds and ~skips the scan. The round-9
    // regression would have shown here as ~5.5 s of build alone.
    val q218 = QueryRegistry.all.collectFirst { case ("q218_adc_topk", q) => q }.get
    val t = GraftConf.scoped(spark)(StageProbe.buildCost(q218.build(spark, sf)))
    info(f"q218 build-side cost via limit(1): $t%.2f s")
    ceiling(t, 15.0, "q218 build side")
  }

  test("per-family wall ceiling: ADC/IVFADC/rerank/ingest family at sf0.001") {
    val res = familyWall(Seq("q214", "q215", "q216", "q217", "q218", "q219",
      "q220", "q221", "q222", "q223", "q224", "q225", "q226", "q227",
      "q228", "q229", "q240", "q241", "q249", "q255", "q256", "q258"))
    val total = res.filter(_._2 >= 0).map(_._2).sum
    info(f"ANN family total at sf0.001: $total%.1f s (${res.size} queries)")
    res.filter(_._2 < 0) shouldBe empty
    ceiling(total, 200.0, "ANN family total")
  }

  test("per-family wall ceiling: table-format family (deletion vectors, corpus, schema) at sf0.001") {
    // round 12's merge-on-read/corpus/schema rows: each stages its tree
    // on the first build (publish + appends + DV commits), then the
    // timed min-of-1 measures the manifest-planned read. The ceiling
    // catches a reintroduced O(table) cost in the resolve/DV/schema
    // read path (e.g. a per-read footer sweep or a DV fan-out).
    val res = familyWall(Seq("q259", "q260", "q261", "q262", "q263", "q264", "q265"))
    val total = res.filter(_._2 >= 0).map(_._2).sum
    info(f"table-format family total at sf0.001: $total%.1f s (${res.size} queries)")
    res.filter(_._2 < 0) shouldBe empty
    ceiling(total, 60.0, "table-format family total")
  }

  test("per-family wall ceiling: transform/rotation family (aniso + fixture) at sf0.001") {
    val res = familyWall(Seq("q238", "q239", "q242", "q243", "q244", "q245",
      "q250", "q251", "q252", "q257"))
    val total = res.filter(_._2 >= 0).map(_._2).sum
    info(f"transform family total at sf0.001: $total%.1f s (${res.size} queries)")
    res.filter(_._2 < 0) shouldBe empty
    ceiling(total, 250.0, "transform family total")
  }
}
