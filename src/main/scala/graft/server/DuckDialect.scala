package graft.server

/** DuckDB-dialect acceptance shim for /query (VERDICT r7 #2).
  *
  * The reference promises arbitrary DuckDB SQL on its query route
  * (reference README.md:115-133), and its canonical first example uses
  * the `expr::TYPE` postfix cast — which Spark's parser rejects. This
  * shim rewrites the *syntax* gap before `spark.sql` sees the text:
  *
  *   - `expr::TYPE` → `CAST(expr AS TYPE)`, with DuckDB-only type names
  *     mapped to their Spark equivalents (VARCHAR→STRING, HUGEINT→
  *     DECIMAL(38,0), …). The primary expression is recovered by a real
  *     tokenizer — string literals (with `''` doubling), quoted
  *     identifiers, `()`/`[]` balancing, dotted chains and chained
  *     casts all survive — so `'a::b'` inside a literal is never touched.
  *
  * Function-NAME compatibility lives in
  * [[graft.functions.GraftFunctions]] (the DuckDB-compat section):
  * names like `len`, `string_split`, `strftime`, `epoch_ms` are
  * registered as native Catalyst builders on every session, so they
  * need no text rewriting and work from Scala `expr()` too. The shim is
  * applied by the /query route and the stdin SQL bootstrap — the two
  * surfaces a reference user's existing DuckDB SQL arrives through.
  */
object DuckDialect {

  /** Rewrite every `::TYPE` postfix cast and `read_parquet`/`read_json`
    * table function outside string literals / quoted identifiers /
    * comments. Fixpoint loop: each pass rewrites the first occurrence
    * (chains like `x::INT::VARCHAR` resolve inner-out). */
  def rewrite(sql: String): String = {
    var s = sql
    var guard = 0
    while (guard < 256) { // a query with >256 casts is not a query
      rewriteFirst(s).orElse(rewriteFirstTableFn(s))
        .orElse(rewriteFirstZeroArgCount(s)) match {
        case Some(n) => s = n; guard += 1
        case None => return s
      }
    }
    s
  }

  /** DuckDB file-reading table function → Spark's direct-path form:
    * `read_parquet('p')` → `parquet.\`p\``, list form
    * `read_parquet(['a','b'])` / `read_parquet(ARRAY['a','b'])` →
    * a `{a,b}` Hadoop glob. The reference promises DuckDB SQL on its
    * query route and its own merge SQL uses exactly these spellings
    * (reference merge_service_fs.go:214-217, 265-268). Calls with
    * extra option arguments (hive_partitioning=..., union_by_name=...)
    * are left untouched — rewriting while dropping options would
    * silently change semantics. */
  private val TableFns = Map(
    "read_parquet" -> "parquet", "parquet_scan" -> "parquet",
    "read_json" -> "json", "read_json_auto" -> "json",
    "read_ndjson_auto" -> "json")

  /** DuckDB range-reads http(s) URLs natively (reference
    * BENCHMARK.md:11 scans `read_parquet('https://…')`); Hadoop has no
    * https FileSystem, so remote paths route through the
    * download-through cache ([[graft.sources.HttpParquet]]) — fetched
    * once, content-addressed, scanned as a normal local pruned
    * columnar read. Local paths pass through untouched. */
  private def localize(p: String): String =
    if (p.startsWith("http://") || p.startsWith("https://"))
      graft.sources.HttpParquet.fetch(p).toString
    else p

  private def rewriteFirstTableFn(s: String): Option[String] = {
    val ts = lex(s)
    def strVal(t: Tok): String = // strip quotes, undo '' doubling
      s.substring(t.start + 1, math.max(t.start + 1, t.end - 1))
        .replace("''", "'")
    var k = 0
    while (k < ts.length) {
      val isFn = ts(k).kind == Word && TableFns.contains(
        s.substring(ts(k).start, ts(k).end).toLowerCase(java.util.Locale.ROOT))
      if (isFn && k + 1 < ts.length && ts(k + 1).kind == Punct('(')) {
        val source = TableFns(
          s.substring(ts(k).start, ts(k).end).toLowerCase(java.util.Locale.ROOT))
        // single-path form: fn ( 'p' )
        if (k + 3 < ts.length && ts(k + 2).kind == Str &&
            ts(k + 3).kind == Punct(')')) {
          return Some(s.substring(0, ts(k).start) +
            s"$source.`${localize(strVal(ts(k + 2))).replace("`", "``")}`" +
            s.substring(ts(k + 3).end))
        }
        // list form: fn ( [ARRAY] [ 'a' , 'b' ... ] )
        var i = k + 2
        if (i < ts.length && ts(i).kind == Word &&
            s.substring(ts(i).start, ts(i).end)
              .equalsIgnoreCase("ARRAY")) i += 1
        if (i < ts.length && ts(i).kind == Punct('[')) {
          val paths = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = i + 1
          var ok = true
          var done = false
          while (ok && !done && j + 1 < ts.length) {
            (ts(j).kind, ts(j + 1).kind) match {
              case (Str, Punct(',')) => paths += strVal(ts(j)); j += 2
              case (Str, Punct(']')) => paths += strVal(ts(j)); j += 1; done = true
              case _ => ok = false
            }
          }
          if (ok && done && paths.nonEmpty && j + 1 < ts.length &&
              ts(j + 1).kind == Punct(')')) {
            val local = paths.map(localize)
            val glob = if (local.size == 1) local.head
              else local.mkString("{", ",", "}")
            return Some(s.substring(0, ts(k).start) +
              s"$source.`${glob.replace("`", "``")}`" +
              s.substring(ts(j + 1).end))
          }
        }
      }
      k += 1
    }
    None
  }

  /** DuckDB allows zero-argument `count()` (= `count(*)` — the
    * reference's published benchmark query, BENCHMARK.md:11, uses it);
    * Spark's parser requires an argument. Rewrite `count()` →
    * `count(*)` outside strings/comments. */
  private def rewriteFirstZeroArgCount(s: String): Option[String] = {
    val ts = lex(s)
    var k = 0
    while (k + 2 < ts.length) {
      if (ts(k).kind == Word &&
          s.substring(ts(k).start, ts(k).end)
            .equalsIgnoreCase("count") &&
          ts(k + 1).kind == Punct('(') && ts(k + 2).kind == Punct(')') &&
          ts(k).end == ts(k + 1).start) // fn-head needs char adjacency
        return Some(s.substring(0, ts(k + 1).end) + "*" +
          s.substring(ts(k + 2).start))
      k += 1
    }
    None
  }

  /** DuckDB type name → Spark type name. Unlisted names pass through
    * (INT, BIGINT, DOUBLE, DATE, TIMESTAMP, DECIMAL(p,s) are shared). */
  private val TypeMap: Map[String, String] = Map(
    "VARCHAR" -> "STRING", "TEXT" -> "STRING", "CHAR" -> "STRING",
    "BPCHAR" -> "STRING",
    "BLOB" -> "BINARY", "BYTEA" -> "BINARY", "VARBINARY" -> "BINARY",
    "REAL" -> "FLOAT", "FLOAT4" -> "FLOAT", "FLOAT8" -> "DOUBLE",
    "INT1" -> "TINYINT", "INT2" -> "SMALLINT", "INT4" -> "INT",
    "INT8" -> "BIGINT", "SIGNED" -> "BIGINT",
    "HUGEINT" -> "DECIMAL(38,0)", "UHUGEINT" -> "DECIMAL(38,0)",
    "UTINYINT" -> "SMALLINT", "USMALLINT" -> "INT",
    "UINTEGER" -> "BIGINT", "UBIGINT" -> "DECIMAL(20,0)",
    "TIMESTAMPTZ" -> "TIMESTAMP", "DATETIME" -> "TIMESTAMP",
    "TIMESTAMP_S" -> "TIMESTAMP", "TIMESTAMP_MS" -> "TIMESTAMP",
    "TIMESTAMP_NS" -> "TIMESTAMP",
    "BOOL" -> "BOOLEAN", "LOGICAL" -> "BOOLEAN")

  private sealed trait Kind
  private case object Str extends Kind      // '...' literal
  private case object QIdent extends Kind   // "..." identifier
  private case object Word extends Kind     // identifier / number chunk
  private case class Punct(c: Char) extends Kind
  private case class Tok(kind: Kind, start: Int, end: Int)

  /** Lex into coarse tokens; comments are skipped entirely (a `::`
    * inside one must not rewrite). Whitespace is not tokenized, so
    * `x :: INT` works through token adjacency, not char adjacency. */
  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') {
        val st = i; i += 1
        var done = false
        while (i < n && !done) {
          // Spark's default parser honors backslash escapes inside
          // string literals (escapedStringLiterals=false), and this
          // shim runs on EVERY /query — skipping \x is what keeps
          // previously-valid Spark SQL like 'it\'s::ok' unmangled.
          // DuckDB strings have no backslash escapes, so a DuckDB
          // query is only affected if it contains a literal
          // backslash-quote pair — which Spark would reject anyway.
          if (s.charAt(i) == '\\' && i + 1 < n) i += 2
          else if (s.charAt(i) == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') i += 2 // '' escape
            else { i += 1; done = true }
          } else i += 1
        }
        out += Tok(Str, st, i)
      } else if (c == '"' || c == '`') {
        // double-quoted (DuckDB) or backtick (Spark) identifier
        val q = c
        val st = i; i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == q) {
            if (i + 1 < n && s.charAt(i + 1) == q) i += 2
            else { i += 1; done = true }
          } else i += 1
        }
        out += Tok(QIdent, st, i)
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        val e = s.indexOf("*/", i + 2)
        i = if (e < 0) n else e + 2
      } else if (Character.isLetterOrDigit(c) || c == '_' || c == '$') {
        val st = i
        while (i < n && (Character.isLetterOrDigit(s.charAt(i)) ||
          s.charAt(i) == '_' || s.charAt(i) == '$')) i += 1
        out += Tok(Word, st, i)
      } else if (Character.isWhitespace(c)) {
        i += 1
      } else {
        out += Tok(Punct(c), i, i + 1)
        i += 1
      }
    }
    out.result()
  }

  /** Rewrite the first `::TYPE` cast, or None if the text has none. */
  private def rewriteFirst(s: String): Option[String] = {
    val ts = lex(s)
    var k = 0
    while (k + 1 < ts.length) {
      (ts(k).kind, ts(k + 1).kind) match {
        case (Punct(':'), Punct(':')) if ts(k).end == ts(k + 1).start
            && k > 0 && k + 2 < ts.length =>
          val prim = primarySpan(ts, k - 1)
          val typ = typeSpan(s, ts, k + 2)
          // `CASE … END::T`: the bare END word is not the primary — a
          // naive rewrite would mangle the CASE; leave it to the parser
          val caseEnd = prim.contains(k - 1) && ts(k - 1).kind == Word &&
            s.substring(ts(k - 1).start, ts(k - 1).end)
              .equalsIgnoreCase("end")
          (prim, typ) match {
            case (Some(pStart), Some((tEnd, sparkType))) if !caseEnd =>
              val primary = s.substring(ts(pStart).start, ts(k - 1).end)
              return Some(s.substring(0, ts(pStart).start) +
                s"CAST($primary AS $sparkType)" + s.substring(tEnd))
            case _ => // unrecognized shape: leave this `::` alone
          }
        case _ =>
      }
      k += 1
    }
    None
  }

  /** Walk left from token `p` over one postfix-cast primary: a balanced
    * `(...)`/`[...]` tail, then dotted word/quoted-ident chains, with an
    * optional function-name head before an open paren. Returns the
    * first token index of the primary. */
  private def primarySpan(ts: Vector[Tok], p0: Int): Option[Int] = {
    var p = p0
    ts(p).kind match {
      case Punct(')') | Punct(']') =>
        var depth = 0
        var i = p
        while (i >= 0) {
          ts(i).kind match {
            case Punct(')') | Punct(']') => depth += 1
            case Punct('(') | Punct('[') =>
              depth -= 1
              if (depth == 0) {
                // include a function-name / dotted head (f(...), a.b[...])
                // ONLY when char-adjacent to the paren — `SELECT (x)::T`
                // must not swallow the keyword as a call head
                var h = i - 1
                var start = i
                var expectWord = true
                var adjacentTo = ts(i).start
                while (h >= 0 && ts(h).end == adjacentTo && (
                  (expectWord && (ts(h).kind == Word || ts(h).kind == QIdent)) ||
                  (!expectWord && ts(h).kind == Punct('.')))) {
                  start = if (expectWord) h else start
                  expectWord = !expectWord
                  adjacentTo = ts(h).start
                  h -= 1
                }
                return Some(start)
              }
            case _ =>
          }
          i -= 1
        }
        None // unbalanced
      case Word | QIdent | Str =>
        var start = p
        var h = p - 1
        var expectDot = true
        while (h >= 0 && (
          (expectDot && ts(h).kind == Punct('.')) ||
          (!expectDot && (ts(h).kind == Word || ts(h).kind == QIdent)))) {
          start = if (!expectDot) h else start
          expectDot = !expectDot
          h -= 1
        }
        Some(start)
      case _ => None
    }
  }

  /** Parse the type after `::` starting at token `t`: a word, plus an
    * optional immediate `(args)` (DECIMAL(10,2)). Returns (end char
    * offset, Spark-mapped type text). Array-suffix types (`INT[]`) are
    * left unrewritten — Spark casts arrays with ARRAY<...> syntax only. */
  private def typeSpan(s: String, ts: Vector[Tok], t: Int): Option[(Int, String)] = {
    if (t >= ts.length || ts(t).kind != Word) return None
    val base = s.substring(ts(t).start, ts(t).end)
    if (base.headOption.exists(Character.isDigit)) return None // 1::2 nonsense
    var end = ts(t).end
    var endTok = t
    var args = ""
    if (t + 1 < ts.length && ts(t + 1).kind == Punct('(')) {
      var depth = 0
      var i = t + 1
      while (i < ts.length) {
        ts(i).kind match {
          case Punct('(') => depth += 1
          case Punct(')') =>
            depth -= 1
            if (depth == 0) {
              args = s.substring(ts(t + 1).start, ts(i).end)
              end = ts(i).end
              endTok = i
              i = ts.length
            }
          case _ =>
        }
        i += 1
      }
      if (args.isEmpty) return None // unbalanced
    }
    if (endTok + 1 < ts.length && ts(endTok + 1).kind == Punct('['))
      return None // INT[] — array cast syntax differs; don't guess
    val up = base.toUpperCase(java.util.Locale.ROOT)
    val mapped =
      if (args.nonEmpty && (up == "VARCHAR" || up == "CHAR" || up == "BPCHAR"))
        "STRING" // VARCHAR(20) → STRING: DuckDB ignores the bound too
      else TypeMap.getOrElse(up, base + args)
    Some((end, if (TypeMap.contains(up)) mapped else base + args))
  }
}
