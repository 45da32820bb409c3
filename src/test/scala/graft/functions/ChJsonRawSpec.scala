package graft.functions

import graft.SparkSpec

/** The raw-preserving JSON trio (r14, VERDICT r13 #4). The doc-example
  * pins come from ClickHouse's published json-functions reference:
  * JSONExtractRaw('{"a": "hello", "b": [-100, 200.0, 300]}', 'b') =
  * '[-100, 200.0, 300]' (spacing intact), JSONExtractArrayRaw of the
  * same = ['-100', '200.0', '300'], JSONType = 'Object' / 'String' /
  * 'Array' at the documented paths. Everything else pins the CONTRACT:
  * byte-fidelity of the slice (whitespace, quoting, number spellings),
  * 1-based/negative indexing, and the ''/[]/'Null' defaults for
  * missing paths and malformed documents. */
class ChJsonRawSpec extends SparkSpec {

  private val Doc = """{"a": "hello", "b": [-100, 200.0, 300]}"""
  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect().head.get(0)
  // Spark's single-quoted literals honor backslash escapes, so a JSON
  // document carrying \" must double its backslashes to arrive intact
  private def lit(json: String): String =
    "'" + json.replace("\\", "\\\\").replace("'", "''") + "'"
  private def raw(json: String, path: String = ""): Any =
    one(s"JSONExtractRaw(${lit(json)}$path)")
  private def arr(sql: String): Seq[Any] =
    spark.sql(s"SELECT $sql AS v").collect().head.getSeq[Any](0)

  test("JSONExtractRaw: the CH doc example, spacing preserved") {
    assert(raw(Doc, ", 'b'") == "[-100, 200.0, 300]")
    assert(raw(Doc, ", 'a'") == "\"hello\"")
    // whole-document form trims only surrounding whitespace
    assert(raw("  " + Doc + " ") == Doc)
  }

  test("JSONExtractRaw: byte-fidelity of nested slices") {
    val doc = """{ "x" : { "y" : [ 1 ,  "t\"w\"o" , null ] , "z":1e2 } }"""
    assert(raw(doc, ", 'x'") == """{ "y" : [ 1 ,  "t\"w\"o" , null ] , "z":1e2 }""")
    assert(raw(doc, ", 'x', 'y'") == """[ 1 ,  "t\"w\"o" , null ]""")
    // escaped quotes inside strings survive verbatim; number spellings
    // are never normalized (1e2 stays 1e2, 200.0 stays 200.0)
    assert(raw(doc, ", 'x', 'y', 2") == "\"t\\\"w\\\"o\"")
    assert(raw(doc, ", 'x', 'z'") == "1e2")
  }

  test("JSONExtractRaw: 1-based and negative indices, objects by position") {
    assert(raw(Doc, ", 'b', 1") == "-100")
    assert(raw(Doc, ", 'b', -1") == "300")
    assert(raw(Doc, ", 'b', -3") == "-100")
    // an integer step on an OBJECT addresses the n-th member's value
    assert(raw(Doc, ", 2") == "[-100, 200.0, 300]")
    assert(raw(Doc, ", -2") == "\"hello\"")
    // out of range / absent key / wrong container → ''
    assert(raw(Doc, ", 'b', 4") == "")
    assert(raw(Doc, ", 'b', 0") == "")
    assert(raw(Doc, ", 'nope'") == "")
    assert(raw(Doc, ", 'a', 'deeper'") == "")
  }

  test("JSONExtractRaw: escaped keys match their unescaped argument") {
    val doc = """{"key": 1, "a\"b": [2], "tab\there": 3}"""
    assert(raw(doc, ", 'key'") == "1")
    assert(raw(doc, ", 'a\"b'") == "[2]")
    assert(raw(doc, ", 'tab\\there'") == "3") // SQL '\t' is a real tab
  }

  test("JSONExtractRaw: malformed documents yield '', never a partial slice") {
    assert(raw("""{"a": [1, 2}""") == "")
    assert(raw("""{"a" 1}""") == "")
    assert(raw("""{"a": 1} trailing""") == "")
    assert(raw("") == "")
    assert(raw("""{"a": [1, }""", ", 'a'") == "")
    // null document → null (not '')
    assert(one("JSONExtractRaw(CAST(NULL AS STRING), 'a')") == null)
  }

  test("JSONExtractArrayRaw: CH doc example + defaults") {
    assert(arr(s"JSONExtractArrayRaw('$Doc', 'b')") ==
      Seq("-100", "200.0", "300"))
    // element slices keep their own raw text
    assert(arr("""JSONExtractArrayRaw('[ {"k" : 1} , "s" , 2.50 ]')""") ==
      Seq("""{"k" : 1}""", "\"s\"", "2.50"))
    // not an array / missing / malformed → []
    assert(arr(s"JSONExtractArrayRaw('$Doc', 'a')") == Seq())
    assert(arr(s"JSONExtractArrayRaw('$Doc', 'nope')") == Seq())
    assert(arr("JSONExtractArrayRaw('{bad')") == Seq())
    assert(arr("JSONExtractArrayRaw('[]')") == Seq())
  }

  test("JSONType: the CH names at every leaf kind") {
    def ty(json: String, path: String = ""): Any =
      one(s"JSONType(${lit(json)}$path)")
    assert(ty(Doc) == "Object")
    assert(ty(Doc, ", 'a'") == "String")
    assert(ty(Doc, ", 'b'") == "Array")
    assert(ty(Doc, ", 'b', 1") == "Int64")   // -100: negative integer
    assert(ty(Doc, ", 'b', 2") == "Double")  // 200.0
    assert(ty(Doc, ", 'b', 3") == "UInt64")  // 300: non-negative integer
    assert(ty("""{"t": true, "n": null}""", ", 't'") == "Bool")
    assert(ty("""{"t": true, "n": null}""", ", 'n'") == "Null")
    // 2^64 exceeds UInt64 → Double, as in CH's parsed classification
    assert(ty("""{"big": 18446744073709551616}""", ", 'big'") == "Double")
    assert(ty("""{"max": 18446744073709551615}""", ", 'max'") == "UInt64")
    // missing path / malformed doc → 'Null' (the CH Enum default)
    assert(ty(Doc, ", 'nope'") == "Null")
    assert(ty("{bad") == "Null")
  }

  test("JSONExtractRaw: adversarial shapes — array roots, unicode keys, deep paths") {
    // array at the root, positive and negative indices
    assert(raw("[1, 2, 3]", ", 1") == "1")
    assert(raw("[1, 2, 3]", ", -1") == "3")
    // mixed-step deep path: key → index → key
    assert(raw("""{"a": [{"b": 2}, {"b": 3}]}""", ", 'a', 2, 'b'") == "3")
    // a \u-escaped KEY matches its unescaped argument (built by string
    // concat so Scala's own source-level \u processing stays out of it)
    val uniKeyDoc = "{\"" + "\\" + "u0061\": 1, \"b\": 2}"
    assert(raw(uniKeyDoc, ", 'a'") == "1")
    // a string-typed KEY argument is a key even on an array → miss
    assert(raw("[1, 2]", ", '1'") == "")
    // an index step on a scalar → miss
    assert(raw("""{"a": 5}""", ", 'a', 1") == "")
    // duplicate keys: first match wins (simdjson on-demand order)
    assert(raw("""{"k": 1, "k": 2}""", ", 'k'") == "1")
    // whitespace-only document is not a value
    assert(raw("   ") == "")
    // deep nesting survives the recursive validator
    val deep = "[" * 50 + "1" + "]" * 50
    assert(raw(deep, ", 1, 1, 1") == "[" * 47 + "1" + "]" * 47)
    // empty containers
    assert(raw("{}") == "{}")
    assert(raw("[]", ", 1") == "")
    assert(one("JSONType('{}')") == "Object")
  }

  test("the trio stays inside whole-stage codegen (no UDF boundary)") {
    // a non-constant document (id-dependent) so constant folding can't
    // evaluate the trio at optimization time — the * (codegen) marker
    // on the Project must come from the expressions' own doGenCode
    val df = spark.range(2).selectExpr(
      """concat('{"a": "hello", "b": [-100, 200.0, ', CAST(300 + id AS STRING), ']}') AS j""")
      .selectExpr("JSONType(j) AS t", "JSONExtractRaw(j, 'b', -1) AS r",
        "size(JSONExtractArrayRaw(j, 'b')) AS n")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val row = df.collect().head
    assert(row.getString(0) == "Object" && row.getString(1) == "300" &&
      row.getInt(2) == 3)
  }
}
