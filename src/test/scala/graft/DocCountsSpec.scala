package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the README's claimed gate counts to the sources the same way
  * RegistrySpec pins query coverage both directions: when a spec or a
  * plan assertion is added without updating the README (the "103 specs"
  * drift the round-5 verdict flagged), this goes red instead of the doc
  * silently going stale.
  *
  * Counting conventions (deliberately simple, source-text based so the
  * spec needs no runtime discovery):
  *   - tests  = `test` registration call sites across src/test/scala/graft
  *     (the counted token is spelled via regex below so this comment
  *     doesn't count itself)
  *   - suites = FunSuite class declarations (files may hold more than
  *     one suite)
  *   - plan assertions = `check("` call sites + `locally {` blocks in
  *     ExplainCheck.scala (each locally block prints exactly one
  *     PLAN_OK/PLAN_BAD line)
  */
class DocCountsSpec extends AnyFunSuite {

  private def read(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")

  private def count(hay: String, pat: scala.util.matching.Regex): Int =
    pat.findAllMatchIn(hay).length

  test("README gate counts match source discovery") {
    val readme = read(java.nio.file.Paths.get("README.md"))

    val testDir = new java.io.File("src/test/scala/graft")
    val specSrc = testDir.listFiles().filter(_.getName.endsWith(".scala"))
      .map(f => read(f.toPath)).mkString("\n")
    val nTests = count(specSrc, """test\("""".r)
    val nSuites = count(specSrc, """class \w+ extends AnyFunSuite""".r)

    val explain = read(java.nio.file.Paths.get(
      "src/main/scala/graft/ExplainCheck.scala"))
    val nPlan = count(explain, """check\("""".r) + count(explain, """locally \{""".r)

    val claimed = """# (\d+) tests across (\d+) suites""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README gates block no longer states the test count"))
    assert(claimed.group(1).toInt == nTests,
      s"README claims ${claimed.group(1)} tests, sources have $nTests")
    assert(claimed.group(2).toInt == nSuites,
      s"README claims ${claimed.group(2)} suites, sources have $nSuites")

    val claimedPlan = """# (\d+) physical-plan assertions""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README gates block no longer states the plan-assertion count"))
    assert(claimedPlan.group(1).toInt == nPlan,
      s"README claims ${claimedPlan.group(1)} plan assertions, ExplainCheck has $nPlan")
  }
}
