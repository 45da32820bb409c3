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
    // 0-based Spark subscripts as ATOMS (the bracket always directly
    // follows its own identifier/paren, the subscript position the r12
    // list-literal rule must never claim)
    Gen.oneOf("foo[0]", "t1.colA[1]", "f(x)[2]", "\"q col\"[3]"),
    // date-shift NON-shapes as atoms (r14): a column literally named
    // dateSub, Spark's own 2-arg forms, DuckDB's quoted-part count —
    // all must pass through byte-identical
    Gen.oneOf("dateSub", "date_add(colA, 3)", "date_sub(colA, 3)",
      "date_sub('month', colA, x)", "dateAdd(colA, 3, x)"),
    Gen.oneOf("-- cast me not y::INT\n", "/* x::INT; LOAD z */"),
    Gen.oneOf(" ", "  ", "\n", "\t"))

  // a select-less text whose FIRST token is FROM is itself DuckDB
  // dialect (the FROM-first shorthand rewrites to SELECT * …), so it
  // does not belong to the identity universe. The first TOKEN — the
  // lexer skips comments, so leading comments must be stripped before
  // the check (a comment-led FROM is still FROM-first).
  private def fromFirst(s0: String): Boolean = {
    var s = s0
    var prev: String = null
    while (s != prev) {
      prev = s
      s = s.stripLeading()
      if (s.startsWith("--")) {
        val nl = s.indexOf('\n')
        s = if (nl < 0) "" else s.substring(nl + 1)
      } else if (s.startsWith("/*")) {
        val end = s.indexOf("*/")
        s = if (end < 0) "" else s.substring(end + 2)
      }
    }
    s.toLowerCase(java.util.Locale.ROOT).startsWith("from")
  }

  private val sqlish: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, fragment)).map(_.mkString)
      .map(s => if (fromFirst(s)) "SELECT * " + s else s)

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  // forAllNoShrink everywhere: shrinking synthesizes strings OUTSIDE
  // the generator's mapped universe (a bare "FROM" that the fromFirst
  // guard would have prefixed), so a shrunk "counterexample" can be a
  // false alarm
  test("rewrite is the identity on dialect-free SQL (300 random texts)") {
    check(Prop.forAllNoShrink(sqlish) { s => DuckDialect.rewrite(s) == s })
  }

  test("rewrite emits confs/urls only when the dialect is actually used") {
    check(Prop.forAllNoShrink(sqlish) { s =>
      val r = DuckDialect.rewriteInfo(s, fetchRemote = false)
      r.confs.isEmpty && r.remoteUrls.isEmpty
    })
  }

  test("rewrite never throws and is idempotent over chaotic dialect soup") {
    // random compositions of RAW dialect tokens — unbalanced brackets,
    // stray `:=`, half-formed struct_pack/read_csv calls, QUALIFY
    // shards. The shim sits in front of EVERY /query request: whatever
    // arrives, it must terminate without throwing, and its output must
    // be a fixed point (the fixpoint loop already ran to exhaustion —
    // a second pass changing the text would mean order-dependent
    // rewriting).
    val chaotic: Gen[String] = {
      val dialectFrag = Gen.oneOf(
        "[", "]", "[1, 2]", "ARRAY", "ARRAY[3]", "struct_pack(",
        "a := 1", ":=", "struct_pack(a := 1)", "read_csv('t.csv')",
        "read_csv(", "generate_series(1, 3)", "unnest", "unnest(",
        "QUALIFY", "EXCLUDE", "count()", "::INT", "x::VARCHAR",
        "dateSub(", "dateAdd(DAY, 3, x)", "dateSub(year, 1, ts)",
        "read_parquet('p.parquet')", "read_parquet([",
        "row_number() OVER (ORDER BY x)", ";")
      Gen.chooseNum(0, 24).flatMap(n =>
        Gen.listOfN(n, Gen.frequency(2 -> dialectFrag, 3 -> fragment)))
        .map(_.mkString(" "))
    }
    check(Prop.forAll(chaotic) { s =>
      val out = DuckDialect.rewriteInfo(s, fetchRemote = false).sql
      DuckDialect.rewriteInfo(out, fetchRemote = false).sql == out
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
