package graft.server

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: the dialect shim must NEVER alter SQL that uses no DuckDB
  * construct — /query applies it to EVERY request, so a rewrite of
  * previously-valid Spark SQL is a regression for existing callers.
  * The generator composes random SQL-ish texts from fragments that are
  * individually rewrite-free, including the adversarial ones: `::`
  * inside string literals, quoted identifiers, and comments; `''`
  * doubling; nested parens. (Dialect constructs themselves are pinned
  * by the example-based DuckDialectSpec.) */
class DuckDialectPropertySpec extends AnyFunSuite {

  private val fragment: Gen[String] = Gen.oneOf(
    Gen.oneOf("SELECT", "FROM", "WHERE", "AND", "OR", "AS", "ON", "JOIN"),
    Gen.oneOf("foo", "bar_baz", "t1", "colA", "x"),
    Gen.oneOf("42", "3.14", "0", "'2025-01-01'"),
    Gen.oneOf(",", "(", ")", "=", "<", ">", "+", "-", "*", "."),
    // strings/identifiers/comments carrying would-be dialect syntax
    Gen.oneOf("'a::b'", "'it''s::ok'", "'read_parquet(''x'')'",
      "\"weird::col\"", "`tick::ed`", "'{a,b};c'"),
    Gen.oneOf("-- cast me not y::INT\n", "/* x::INT; LOAD z */"),
    Gen.oneOf(" ", "  ", "\n", "\t"))

  private val sqlish: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, fragment)).map(_.mkString)
      // a select-less text whose FIRST token is FROM is itself DuckDB
      // dialect (the FROM-first shorthand rewrites to SELECT * …), so
      // it does not belong to the identity universe
      .map(s => if (s.stripLeading().toLowerCase(java.util.Locale.ROOT)
        .startsWith("from")) "SELECT * " + s else s)

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  test("rewrite is the identity on dialect-free SQL (300 random texts)") {
    check(Prop.forAll(sqlish) { s => DuckDialect.rewrite(s) == s })
  }

  test("rewrite emits confs/urls only when the dialect is actually used") {
    check(Prop.forAll(sqlish) { s =>
      val r = DuckDialect.rewriteInfo(s, fetchRemote = false)
      r.confs.isEmpty && r.remoteUrls.isEmpty
    })
  }

  test("splitStatements yields trimmed nonempty statements, stable under re-split") {
    // joining random fragments with raw ';' separators: each returned
    // statement must be a nonempty trimmed substring, and re-splitting
    // a single returned statement is the identity (idempotence)
    val withSemis = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n + 1, sqlish)).map(_.mkString(";"))
    check(Prop.forAll(withSemis) { s =>
      val parts = DuckDialect.splitStatements(s)
      parts.forall(p => p.nonEmpty && p == p.trim) &&
        parts.forall(p => DuckDialect.splitStatements(p) == Seq(p))
    })
  }
}
