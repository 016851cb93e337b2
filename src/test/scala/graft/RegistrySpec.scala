package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene at ~100-query scale: the README coverage tables and
  * `SparkEntry.registry` must agree, so coverage claims can't drift from
  * the graded surface.
  */
class RegistrySpec extends AnyFunSuite {

  private val names = SparkEntry.registry.map(_.name)

  test("registry ids are unique and every query has a runnable fn") {
    assert(names.distinct.size == names.size,
      s"duplicate ids: ${names.diff(names.distinct).distinct.mkString(", ")}")
  }

  test("oracleSql keys are a subset of queries and non-empty") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only ids: ${(o -- q).mkString(", ")}")
    assert(o.nonEmpty)
  }

  // query-id-shaped backticked tokens: lowercase snake_case, optional
  // trailing `*` wildcard (`dd_*` claims the whole prefix family)
  private val idToken = "`([a-z][a-z0-9]*(?:_[a-z0-9*]+)+)`".r

  private lazy val mentions: Set[String] = {
    val readme = java.nio.file.Files.readString(java.nio.file.Path.of("README.md"))
    idToken.findAllMatchIn(readme).map(_.group(1)).toSet
  }

  test("every registered query id is claimed in README coverage") {
    val missing = names.filterNot { n =>
      mentions.contains(n) ||
        mentions.exists(m => m.endsWith("*") && n.startsWith(m.dropRight(1)))
    }
    assert(missing.isEmpty,
      s"queries not mentioned in README.md: ${missing.mkString(", ")}")
  }

  test("README claims no query id that the registry lacks") {
    val nameSet = names.toSet
    val bogus = mentions.filter { m =>
      val claimsFamily = m.endsWith("*")
      if (claimsFamily) !nameSet.exists(_.startsWith(m.dropRight(1)))
      else !nameSet.contains(m)
    }
    assert(bogus.isEmpty,
      s"README mentions unknown query ids: ${bogus.mkString(", ")}")
  }
}
