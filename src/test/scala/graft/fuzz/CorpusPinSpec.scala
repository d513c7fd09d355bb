package graft.fuzz

import org.scalatest.funsuite.AnyFunSuite

/** Byte-stability pin for the FROZEN fuzz corpora. The graded picks
  * (q189–q195 ← casesV1, q196–q200 ← casesV3, q203/q204 ← casesV4,
  * q210–q212 ← casesV5)
  * address SQL by (seed, index): ANY change to a frozen generator's RNG
  * consumption silently rewrites graded queries AND their oracles in
  * lockstep — the driver gate would stay green while the graded surface
  * quietly became different SQL. This pin turns that silent rewrite
  * into a loud test failure: the md5 of each frozen corpus's
  * concatenated SQL must never change. (Campaign grammar growth is
  * fine — it appends new shapes and a NEW casesVN.)
  */
class CorpusPinSpec extends AnyFunSuite {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def corpusHash(cases: Seq[QueryGen.FuzzCase]): String =
    md5(cases.map(c => c.name + "\u0000" + c.sql).mkString("\u0001"))

  test("frozen corpora are byte-stable (print actuals on mismatch)") {
    val v1 = corpusHash(QueryGen.casesV1(42L, 250))
    val v3 = corpusHash(QueryGen.casesV3(42L, 250))
    val v4 = corpusHash(QueryGen.casesV4(42L, 250))
    val v5 = corpusHash(QueryGen.casesV5(42L, 250))
    info(s"v1=$v1 v3=$v3 v4=$v4 v5=$v5")
    assert(v1 == "8ef00a59e9dc3558806e970cbec14d92", s"casesV1 drifted: $v1")
    assert(v3 == "bb4db4cc26829ac1750b47b76c738782", s"casesV3 drifted: $v3")
    assert(v4 == "73d605ff8d12ef4072f2f750d71d11af", s"casesV4 drifted: $v4")
    assert(v5 == "146d935d212054ecebca1acef1566527", s"casesV5 drifted: $v5")
  }
}
