package graft

import org.scalatest.funsuite.AnyFunSuite

class SqlBootstrapSpec extends AnyFunSuite {
  test("splitStatements honors quotes and trims empties") {
    assert(SqlBootstrap.splitStatements("SELECT 1; SELECT 2;") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(SqlBootstrap.splitStatements("SELECT 'a;b' AS s; SELECT \";\" AS t") ==
      Seq("SELECT 'a;b' AS s", "SELECT \";\" AS t"))
    assert(SqlBootstrap.splitStatements("  ;;  ") == Nil)
    // backslash-escaped quote inside a literal must not close it
    assert(SqlBootstrap.splitStatements("SELECT 'a\\';b' AS s; SELECT 1") ==
      Seq("SELECT 'a\\';b' AS s", "SELECT 1"))
  }
}
