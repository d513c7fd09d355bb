package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Coverage claims must be code, not prose: every key the §2 mapping
  * cites exists in the registry, every row carries evidence (queries or
  * an explicit test-only note), and the committed COVERAGE.md is
  * byte-identical to what the code generates — drift fails the build. */
class CoverageSpec extends AnyFunSuite with Matchers {

  test("every §2 row key exists in the registry") {
    val keys = QueryRegistry.all.map(_._1).toSet
    val missing = Coverage.rows.flatMap(r => r.keys.filterNot(keys).map(r.id -> _))
    withClue(s"rows citing unknown keys: $missing ") { missing shouldBe empty }
  }

  test("every §2 row has evidence: query keys or an explicit test-only note") {
    val bare = Coverage.rows.filter(r => r.keys.isEmpty && r.note.isEmpty)
    withClue(s"rows with no evidence: ${bare.map(_.id)} ") { bare shouldBe empty }
    // test-only rows must say so, not just be empty
    Coverage.rows.filter(_.keys.isEmpty).foreach(r =>
      r.note should include("test-only"))
  }

  test("every registry key appears in the artifact (mapped or extension)") {
    val inDoc = Coverage.rows.flatMap(_.keys).toSet ++ Coverage.extensionKeys
    QueryRegistry.all.map(_._1).filterNot(inDoc) shouldBe empty
  }

  test("committed COVERAGE.md matches the generated content exactly") {
    val path = java.nio.file.Paths.get("COVERAGE.md")
    withClue("COVERAGE.md missing — run `sbt \"runMain graft.CoverageMain\"` ") {
      java.nio.file.Files.exists(path) shouldBe true
    }
    val onDisk = java.nio.file.Files.readString(path)
    withClue("COVERAGE.md is stale — regenerate with `sbt \"runMain graft.CoverageMain\"` ") {
      onDisk shouldBe Coverage.render
    }
  }
}
