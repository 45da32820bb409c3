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

  /** One statement's rewrite result: the Spark SQL text, session confs
    * the rewrite requires (`union_by_name=true` → parquet mergeSchema),
    * every remote http(s) URL the emitted text references, and the
    * global-temp csv views the text expects (`read_csv` rewrites to
    * `global_temp.__graft_csv_<h>`; the caller materializes them via
    * [[graft.sources.CsvReads.ensure]] before executing). */
  final case class Rewritten(sql: String, confs: Map[String, String],
                             remoteUrls: Seq[String],
                             csvViews: Seq[graft.sources.CsvReads.CsvView] = Nil)

  /** Rewrite every `::TYPE` postfix cast and `read_parquet`/`read_json`
    * table function outside string literals / quoted identifiers /
    * comments. Fixpoint loop: each pass rewrites the first occurrence
    * (chains like `x::INT::VARCHAR` resolve inner-out). Fetches any
    * remote parquet immediately — callers that must not fetch before
    * validating (ADVICE r8: /query) use [[rewriteInfo]] twice. */
  def rewrite(sql: String): String = rewriteInfo(sql, fetchRemote = true).sql

  /** [[rewrite]], with the fetch deferred: `fetchRemote = false` leaves
    * http(s) paths in place (listing them in `remoteUrls`) so the caller
    * can parse-validate the text BEFORE any outbound download — a query
    * that fails to parse must not trigger network I/O. A second call
    * with `fetchRemote = true` produces the runnable text. */
  def rewriteInfo(sql: String, fetchRemote: Boolean): Rewritten = {
    val confs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val urls = scala.collection.mutable.LinkedHashSet.empty[String]
    val loc: String => String = p => {
      if (p.startsWith("http://") || p.startsWith("https://")) {
        urls += p
        // the cache path is DETERMINISTIC (content-addressed by url), so
        // the dry pass emits the same text the fetching pass will —
        // parse-validation sees the final SQL without any download
        if (fetchRemote) localize(p)
        else graft.sources.HttpParquet.defaultCacheDir
          .resolve(graft.sources.HttpParquet.cacheKey(p)).toString
      } else p
    }
    val csvViews =
      scala.collection.mutable.LinkedHashMap.empty[String, graft.sources.CsvReads.CsvView]
    var s = sql
    var guard = 0
    var done = false
    while (!done && guard < 256) { // a query with >256 casts is not a query
      rewriteFirst(s).orElse(rewriteFirstMergeTree(s, loc))
        .orElse(rewriteFirstTableFn(s, loc, confs))
        .orElse(rewriteFirstCsv(s, loc, csvViews))
        .orElse(rewriteFirstFromGenerator(s))
        .orElse(rewriteFirstStructPack(s))
        .orElse(rewriteFirstDateShift(s))
        .orElse(rewriteFirstZeroArgCount(s))
        .orElse(rewriteFirstExclude(s))
        .orElse(rewriteFirstQualify(s))
        .orElse(rewriteFromFirst(s))
        // LAST: the bracket-consuming rules above (mergetree, table fns,
        // csv) must claim their own `['a','b']` list arguments first
        .orElse(rewriteFirstListLiteral(s)) match {
        case Some(n) => s = n; guard += 1
        case None => done = true
      }
    }
    Rewritten(s, confs.toMap, urls.toSeq, csvViews.values.toSeq)
  }

  /** DuckDB FROM-first shorthand — a bare `FROM t [WHERE …] [LIMIT …]`
    * is `SELECT * FROM …` (the first exploratory query a DuckDB user
    * types: `FROM tbl LIMIT 5`). Only the select-less form rewrites:
    * a statement that contains its own top-level SELECT later
    * (`FROM t SELECT a, b` — DuckDB reorders clauses) stays untouched
    * for a loud parse error rather than a guessed clause reordering. */
  private def rewriteFromFirst(s: String): Option[String] = {
    val ts = lex(s)
    def word(t: Tok): String =
      s.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    if (ts.isEmpty || ts.head.kind != Word || word(ts.head) != "from")
      return None
    var d = 0
    var i = 0
    while (i < ts.length) {
      ts(i).kind match {
        case Punct('(') => d += 1
        case Punct(')') => d = math.max(0, d - 1)
        case Word if d == 0 && word(ts(i)) == "select" => return None
        case _ =>
      }
      i += 1
    }
    Some("SELECT * " + s)
  }

  /** DuckDB `* EXCLUDE (a, b)` / `* EXCLUDE a` → Spark's native
    * `* EXCEPT (a, b)` (VERDICT r9 #4 — among the first DuckDB idioms
    * a migrating user types). Only a star-expression position rewrites:
    * the token before `*` must be SELECT/DISTINCT/`,`/`(`/`.` so that
    * `a * exclude` (multiplication by a column named exclude) is never
    * touched. DuckDB's parenthesis-less form takes exactly one column;
    * Spark's EXCEPT always takes the parenthesized list, so the single
    * bare column gains parens. */
  private def rewriteFirstExclude(s: String): Option[String] = {
    // cheap pre-screen: the overwhelming majority of statements contain
    // neither keyword — don't pay a lex pass per fixpoint iteration
    if (!s.toLowerCase(java.util.Locale.ROOT).contains("exclude")) return None
    val ts = lex(s)
    def word(t: Tok): String =
      s.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    var k = 1
    while (k + 1 < ts.length) {
      val starPos = ts(k).kind == Punct('*') && (ts(k - 1).kind match {
        case Punct(',') | Punct('(') | Punct('.') => true
        case Word => Set("select", "distinct")(word(ts(k - 1)))
        case _ => false
      })
      if (starPos && ts(k + 1).kind == Word && word(ts(k + 1)) == "exclude") {
        val ex = ts(k + 1)
        if (k + 2 < ts.length && ts(k + 2).kind == Punct('(')) {
          // parenthesized list: EXCLUDE -> EXCEPT, list survives verbatim
          return Some(s.substring(0, ex.start) + "EXCEPT" + s.substring(ex.end))
        } else if (k + 2 < ts.length &&
            (ts(k + 2).kind == Word || ts(k + 2).kind == QIdent)) {
          val c = ts(k + 2)
          return Some(s.substring(0, ex.start) + "EXCEPT (" +
            s.substring(c.start, c.end) + ")" + s.substring(c.end))
        }
      }
      k += 1
    }
    None
  }

  /** DuckDB `QUALIFY <pred>` → ranked-subquery form (VERDICT r9 #4):
    * the predicate (usually a window comparison — `QUALIFY row_number()
    * OVER (…) <= 3`) is injected into the SELECT list as a boolean
    * column, the query wrapped, and the outer filter applied where
    * window results ARE filterable:
    *
    *   SELECT … FROM … QUALIFY p [ORDER BY …] →
    *   SELECT * EXCEPT (__graft_qualify) FROM
    *     (SELECT …, (p) AS __graft_qualify FROM …) __graft_qualified
    *   WHERE __graft_qualify [ORDER BY …]
    *
    * The ORDER BY/LIMIT tail stays on the OUTER query (QUALIFY applies
    * before both, exactly DuckDB's evaluation order). Bounded on
    * purpose: a leading WITH survives (the wrap starts at the main
    * SELECT), but DISTINCT (the injected column would change distinct
    * semantics) and set operations on either side of the QUALIFY
    * (which branch owns it) stay unrewritten — Spark's parser then
    * rejects the raw QUALIFY loudly rather than this shim guessing
    * semantics — and an identifier merely NAMED `qualify` (alias
    * position, detected by its follower token) is never touched.
    * Known limit: a tail `ORDER BY` referencing a column the SELECT
    * list does not project (DuckDB allows it) fails with Spark's own
    * UNRESOLVED_COLUMN naming that column — loud, attributable, and
    * unfixable here without schema knowledge. */
  private def rewriteFirstQualify(s: String): Option[String] = {
    if (!s.toLowerCase(java.util.Locale.ROOT).contains("qualify")) return None
    val ts = lex(s)
    def word(t: Tok): String =
      s.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    // one pass records token depths (lex emits no whitespace, so depth
    // changes ride the Punct tokens themselves)
    val depth = new Array[Int](ts.length)
    var d = 0
    var i = 0
    while (i < ts.length) {
      ts(i).kind match {
        case Punct('(') => depth(i) = d; d += 1
        case Punct(')') => d = math.max(0, d - 1); depth(i) = d
        case _ => depth(i) = d
      }
      i += 1
    }
    def topWord(name: String, from: Int, until: Int): Int = {
      var j = from
      while (j < until) {
        if (depth(j) == 0 && ts(j).kind == Word && word(ts(j)) == name) return j
        j += 1
      }
      -1
    }
    val q = topWord("qualify", 0, ts.length)
    if (q < 0) return None
    // `qualify` is NOT reserved in Spark — a table alias of that name
    // ("FROM t qualify WHERE …", "FROM t qualify JOIN u …") is valid SQL
    // that ran before this rewrite existed. In clause position the next
    // token starts a predicate expression; in alias position it starts
    // another clause / join / list — bail on those so previously-valid
    // statements stay untouched (review r10)
    val aliasFollower = Set("where", "group", "having", "window", "order",
      "limit", "offset", "union", "intersect", "except", "minus",
      "join", "inner", "left", "right", "full", "cross", "natural",
      "on", "using", "as")
    if (q + 1 < ts.length && ((ts(q + 1).kind match {
      case Punct(',') | Punct(')') => true
      case Word => aliasFollower(word(ts(q + 1)))
      case _ => false
    }))) return None
    val sel = topWord("select", 0, q)
    if (sel < 0) return None
    // bail-outs: DISTINCT select, set operations, a second top-level
    // QUALIFY (malformed anyway) — leave the text for the parser
    if (sel + 1 < ts.length && ts(sel + 1).kind == Word &&
        word(ts(sel + 1)) == "distinct") return None
    if (topWord("qualify", q + 1, ts.length) >= 0) return None
    val setOp = (sel until q).exists { j =>
      depth(j) == 0 && ts(j).kind == Word &&
        (word(ts(j)) match {
          case "union" | "intersect" | "minus" => true
          // set-op EXCEPT vs star-EXCEPT: the star form is always
          // immediately preceded by `*`
          case "except" => j == 0 || ts(j - 1).kind != Punct('*')
          case _ => false
        })
    }
    if (setOp) return None
    val from = topWord("from", sel + 1, q)
    if (from < 0) return None // QUALIFY without FROM is not a query
    // predicate runs to the start of the top-level ORDER/LIMIT/OFFSET
    // tail (an ORDER BY inside OVER (…) sits at depth >= 1)
    var tail = ts.length
    var j = q + 1
    while (j < ts.length && tail == ts.length) {
      if (depth(j) == 0 && ts(j).kind == Word &&
        Set("order", "limit", "offset")(word(ts(j)))) tail = j
      j += 1
    }
    // a depth-0 set-op or SELECT inside the would-be predicate means the
    // QUALIFY belongs to a non-last branch ("… QUALIFY p UNION ALL
    // SELECT …") — the set-op bail-out above only covers operators
    // BEFORE the QUALIFY; swallow-into-predicate would emit mangled SQL
    // blaming generated text (review r10). Leave it for the parser.
    val predHasBranch = (q + 1 until tail).exists { j =>
      depth(j) == 0 && ts(j).kind == Word &&
        Set("union", "intersect", "except", "minus", "select")(word(ts(j)))
    }
    if (predHasBranch) return None
    val pred = s.substring(ts(q).end, if (tail < ts.length) ts(tail).start
      else s.length).trim
    if (pred.isEmpty) return None
    val prefix = s.substring(0, ts(sel).start) // WITH clause, if any
    val selectList = s.substring(ts(sel).end, ts(from).start)
    val body = s.substring(ts(from).start, ts(q).start)
    val tailTxt = if (tail < ts.length) " " + s.substring(ts(tail).start) else ""
    Some(prefix + "SELECT * EXCEPT (__graft_qualify) FROM (SELECT " +
      selectList.trim + ", (" + pred + ") AS __graft_qualify " + body.trim +
      ") __graft_qualified WHERE __graft_qualify" + tailTxt)
  }

  /** `read_parquet_mergetree(ARRAY['a','b'], 'k1,k2')` — the ONE chsql
    * symbol the reference's own code calls (its L≥2 k-way merge of
    * sorted runs, merge_service_fs.go:265-268 / merge_service_s3.go:
    * 122-126). A k-way merge of sorted runs is relationally the sorted
    * union, and Spark's sort IS an external merge sort that exploits
    * presorted runs, so the honest Spark spelling is
    * `(SELECT * FROM parquet.\`{a,b}\` ORDER BY k1, k2)` — same rows,
    * same order, no custom operator (SURVEY N17). */
  private def rewriteFirstMergeTree(
      s: String, localizer: String => String): Option[String] = {
    val ts = lex(s)
    def strVal(t: Tok): String =
      s.substring(t.start + 1, math.max(t.start + 1, t.end - 1))
        .replace("''", "'")
    def word(t: Tok): String =
      s.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    var k = 0
    while (k < ts.length) {
      if (ts(k).kind == Word && word(ts(k)) == "read_parquet_mergetree" &&
          k + 1 < ts.length && ts(k + 1).kind == Punct('(')) {
        val paths = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = k + 2
        var ok = true
        if (i < ts.length && ts(i).kind == Str) { paths += strVal(ts(i)); i += 1 }
        else {
          if (i < ts.length && ts(i).kind == Word && word(ts(i)) == "array") i += 1
          if (i < ts.length && ts(i).kind == Punct('[')) {
            var done = false
            i += 1
            while (ok && !done && i + 1 < ts.length) {
              (ts(i).kind, ts(i + 1).kind) match {
                case (Str, Punct(',')) => paths += strVal(ts(i)); i += 2
                case (Str, Punct(']')) => paths += strVal(ts(i)); i += 2; done = true
                case _ => ok = false
              }
            }
            ok = ok && done && paths.nonEmpty
          } else ok = false
        }
        // second argument: the comma-joined ORDER BY column list
        val order =
          if (ok && i + 2 < ts.length && ts(i).kind == Punct(',') &&
              ts(i + 1).kind == Str && ts(i + 2).kind == Punct(')')) {
            val cols = strVal(ts(i + 1)).split(",").map(_.trim).filter(_.nonEmpty)
            i += 2
            if (cols.nonEmpty) Some(cols) else None
          } else None
        if (ok && order.nonEmpty &&
            !(paths.size > 1 && paths.exists(p => p.exists("{},".contains(_))))) {
          joinGlob(paths.map(localizer).toSeq).foreach { glob =>
            val ob = order.get.map(c => s"`${c.replace("`", "``")}`").mkString(", ")
            return Some(s.substring(0, ts(k).start) +
              s"(SELECT * FROM parquet.`${glob.replace("`", "``")}` ORDER BY $ob)" +
              s.substring(ts(i).end))
          }
        }
      }
      k += 1
    }
    None
  }

  /** DuckDB file-reading table function → Spark's direct-path form:
    * `read_parquet('p')` → `parquet.\`p\``, list form
    * `read_parquet(['a','b'])` / `read_parquet(ARRAY['a','b'])` →
    * a `{a,b}` Hadoop glob. The reference promises DuckDB SQL on its
    * query route and its own merge SQL uses exactly these spellings
    * (reference merge_service_fs.go:214-217, 265-268), WITH the option
    * arguments `hive_partitioning = false, union_by_name = true`
    * (VERDICT r8 #3): `hive_partitioning=false` is Spark's direct-path
    * behavior for explicit file lists already (no directory-derived
    * partition columns) and is dropped; `union_by_name=true` maps to
    * the parquet mergeSchema session conf, surfaced via
    * [[Rewritten]].confs. Options whose semantics Spark's direct path
    * can NOT honor (`hive_partitioning=true`, `filename=true`, anything
    * unrecognized) leave the whole call untouched — a loud parse error
    * beats silently changed semantics. */
  private val TableFns = Map(
    "read_parquet" -> "parquet", "parquet_scan" -> "parquet",
    "read_json" -> "json", "read_json_auto" -> "json",
    "read_ndjson" -> "json", "read_ndjson_auto" -> "json")

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

  /** Join localized paths into ONE Hadoop-readable path expression.
    * `{a,b}` alone is a RELATIVE path (Hadoop resolves it against the
    * cwd — the r9 spec caught exactly that), so multi-path lists emit
    * `/{a,b}` with the per-path leading slash folded into the brace
    * alternatives; Hadoop's GlobExpander expands alternatives
    * containing slashes before component matching. Lists that are not
    * all absolute local paths return None → the call stays unrewritten
    * and the parser complains loudly. */
  private def joinGlob(paths: Seq[String]): Option[String] =
    if (paths.size == 1) Some(paths.head)
    else if (paths.forall(_.startsWith("/")))
      Some(paths.map(_.stripPrefix("/")).mkString("/{", ",", "}"))
    else None

  private def rewriteFirstTableFn(
      s: String, localizer: String => String,
      confs: scala.collection.mutable.Map[String, String]): Option[String] = {
    val ts = lex(s)
    def strVal(t: Tok): String = // strip quotes, undo '' doubling
      s.substring(t.start + 1, math.max(t.start + 1, t.end - 1))
        .replace("''", "'")
    def word(t: Tok): String =
      s.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    var k = 0
    while (k < ts.length) {
      val isFn = ts(k).kind == Word && TableFns.contains(word(ts(k)))
      if (isFn && k + 1 < ts.length && ts(k + 1).kind == Punct('(')) {
        val source = TableFns(word(ts(k)))
        // path argument: fn ( 'p' …  |  fn ( [ARRAY] [ 'a' , 'b' … ] …
        val paths = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = k + 2
        var ok = true
        var isList = false
        if (i < ts.length && ts(i).kind == Str) { paths += strVal(ts(i)); i += 1 }
        else {
          isList = true
          if (i < ts.length && ts(i).kind == Word &&
              word(ts(i)) == "array") i += 1
          if (i < ts.length && ts(i).kind == Punct('[')) {
            var done = false
            i += 1
            while (ok && !done && i + 1 < ts.length) {
              (ts(i).kind, ts(i + 1).kind) match {
                case (Str, Punct(',')) => paths += strVal(ts(i)); i += 2
                case (Str, Punct(']')) => paths += strVal(ts(i)); i += 2; done = true
                case _ => ok = false
              }
            }
            ok = ok && done && paths.nonEmpty
          } else ok = false
        }
        // option tail: ( , name = value )* — honor-or-bail per option
        val pending = scala.collection.mutable.LinkedHashMap.empty[String, String]
        while (ok && i + 3 < ts.length && ts(i).kind == Punct(',')) {
          (ts(i + 1).kind, ts(i + 2).kind, ts(i + 3).kind) match {
            case (Word, Punct('='), Word | Str) =>
              val v = if (ts(i + 3).kind == Str) strVal(ts(i + 3))
                else word(ts(i + 3))
              (word(ts(i + 1)), v.toLowerCase(java.util.Locale.ROOT)) match {
                case ("hive_partitioning", "false" | "0") => // direct-path default
                case ("union_by_name", "false" | "0") => // Spark's default
                case ("union_by_name", "true" | "1") if source == "parquet" =>
                  pending += ("spark.sql.parquet.mergeSchema" -> "true")
                case _ => ok = false // can't honor: leave the call alone
              }
              i += 4
            case _ => ok = false
          }
        }
        // a path containing glob metacharacters would corrupt the {a,b}
        // join in the LIST form (ADVICE r8); single-path globs pass
        // through verbatim — DuckDB and Hadoop agree on * ? globbing
        if (isList && paths.size > 1 &&
            paths.exists(p => p.exists("{},".contains(_)))) ok = false
        if (ok && i < ts.length && ts(i).kind == Punct(')')) {
          joinGlob(paths.map(localizer).toSeq) match {
            case Some(glob) =>
              confs ++= pending
              return Some(s.substring(0, ts(k).start) +
                s"$source.`${glob.replace("`", "``")}`" +
                s.substring(ts(i).end))
            case None => // not an absolute-local list: leave untouched
          }
        }
      }
      k += 1
    }
    None
  }

  /** DuckDB `read_csv('p'[, opt = val, …])` / `read_csv_auto` →
    * a content-addressed GLOBAL temp view (VERDICT r10 #5). The direct
    * path (`csv.\`p\``) can't carry options or header/type sniffing, so
    * unlike read_parquet this one maps to a view the caller
    * materializes via [[graft.sources.CsvReads.ensure]] with
    * `spark.read.options(…).csv(paths)` — global-temp because /query
    * executes on snapshot/child sessions that don't share the outer
    * session's temp catalog. Options translate honor-or-bail, the
    * TableFns discipline: anything Spark's csv reader can't express
    * (`skip=`, `columns={…}`, `filename=true`, …) leaves the call
    * untouched for a loud parse error rather than silently changed
    * semantics. Types are inferred (DuckDB's auto-sniff) unless
    * `all_varchar=true`; the header is sniffed from the first line
    * unless `header=` says otherwise. */
  private val CsvFns = Set("read_csv", "read_csv_auto")

  private def rewriteFirstCsv(
      s: String, localizer: String => String,
      views: scala.collection.mutable.Map[String, graft.sources.CsvReads.CsvView])
      : Option[String] = {
    val ts = lex(s)
    def strVal(t: Tok): String =
      s.substring(t.start + 1, math.max(t.start + 1, t.end - 1))
        .replace("''", "'")
    def word(t: Tok): String =
      s.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    var k = 0
    while (k < ts.length) {
      if (ts(k).kind == Word && CsvFns.contains(word(ts(k))) &&
          k + 1 < ts.length && ts(k + 1).kind == Punct('(')) {
        // path argument: same grammar as rewriteFirstTableFn
        val paths = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = k + 2
        var ok = true
        if (i < ts.length && ts(i).kind == Str) { paths += strVal(ts(i)); i += 1 }
        else {
          if (i < ts.length && ts(i).kind == Word && word(ts(i)) == "array") i += 1
          if (i < ts.length && ts(i).kind == Punct('[')) {
            var done = false
            i += 1
            while (ok && !done && i + 1 < ts.length) {
              (ts(i).kind, ts(i + 1).kind) match {
                case (Str, Punct(',')) => paths += strVal(ts(i)); i += 2
                case (Str, Punct(']')) => paths += strVal(ts(i)); i += 2; done = true
                case _ => ok = false
              }
            }
            ok = ok && done && paths.nonEmpty
          } else ok = false
        }
        // option tail: ( , name = value )* — honor-or-bail per option
        val opts = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var headerGiven = false
        var inferSchema = true
        def boolOf(v: String): Option[Boolean] = v match {
          case "true" | "1" => Some(true)
          case "false" | "0" => Some(false)
          case _ => None
        }
        while (ok && i + 3 < ts.length && ts(i).kind == Punct(',')) {
          (ts(i + 1).kind, ts(i + 2).kind, ts(i + 3).kind) match {
            case (Word, Punct('='), Word | Str) =>
              val v = if (ts(i + 3).kind == Str) strVal(ts(i + 3))
                else word(ts(i + 3))
              val vl = v.toLowerCase(java.util.Locale.ROOT)
              word(ts(i + 1)) match {
                case "header" => boolOf(vl) match {
                  case Some(b) => opts += ("header" -> b.toString); headerGiven = true
                  case None => ok = false
                }
                case "delim" | "sep" | "delimiter" => opts += ("sep" -> v)
                case "quote" => opts += ("quote" -> v)
                case "escape" => opts += ("escape" -> v)
                case "nullstr" => opts += ("nullValue" -> v)
                case "dateformat" => opts += ("dateFormat" -> v)
                case "timestampformat" => opts += ("timestampFormat" -> v)
                case "ignore_errors" => boolOf(vl) match {
                  case Some(true) => opts += ("mode" -> "DROPMALFORMED")
                  case Some(false) =>
                  case None => ok = false
                }
                case "all_varchar" => boolOf(vl) match {
                  case Some(b) => inferSchema = !b
                  case None => ok = false
                }
                case "auto_detect" => // true is the default; false needs
                  // a columns={} spec Spark can't take here — bail
                  if (!vl.startsWith("t") && vl != "1") ok = false
                case "sample_size" => // Spark infers from the full file
                case "compression" => if (vl != "auto") ok = false
                case "hive_partitioning" => if (boolOf(vl) != Some(false)) ok = false
                case _ => ok = false // can't honor: leave the call alone
              }
              i += 4
            case _ => ok = false
          }
        }
        if (ok && i < ts.length && ts(i).kind == Punct(')') &&
            !(paths.size > 1 && paths.exists(_.isEmpty))) {
          val localized = paths.map(localizer).toSeq
          opts += ("inferSchema" -> inferSchema.toString)
          val name = graft.sources.CsvReads.viewName(
            localized, opts.toMap, sniffHeader = !headerGiven)
          views(name) = graft.sources.CsvReads.CsvView(
            name, localized, opts.toMap, sniffHeader = !headerGiven)
          return Some(s.substring(0, ts(k).start) +
            s"global_temp.`$name`" + s.substring(ts(i).end))
        }
      }
      k += 1
    }
    None
  }

  /** DuckDB bracket LIST LITERALS — `[1, 2, 3]` → `array(1, 2, 3)`,
    * `ARRAY[1, 2]` → `array(1, 2)` — the first syntax a migrating
    * DuckDB user types inside an expression. Safety by construction:
    * the rewrite fires ONLY where a bare `[` cannot be valid Spark SQL
    * today — at statement start, after `(`/`,`/an operator punct, or
    * after an expression-context keyword — so previously-valid Spark
    * queries (0-based subscripts `arr[0]`, `f(x)[1]`) are never
    * touched. Subscript positions (after an identifier, quoted
    * identifier, string, `)`, or `]`) stay verbatim; note the
    * documented deviation that Spark's bracket subscript is 0-based
    * where DuckDB's is 1-based — `element_at` is the 1-based spelling.
    * Nested literals resolve across fixpoint iterations (outermost
    * first; inner brackets sit after `(`/`,` in the emitted text). */
  private val ExprKeywords = Set(
    "select", "where", "when", "then", "else", "and", "or", "not", "in",
    "like", "ilike", "rlike", "between", "on", "by", "case", "having",
    "values", "limit", "offset", "union", "intersect", "except", "minus",
    "all", "distinct", "is", "exists", "any", "some", "escape", "return",
    "returning", "if", "coalesce", "symmetric")

  private def rewriteFirstListLiteral(s: String): Option[String] = {
    if (!s.contains('[')) return None
    val ts = lex(s)
    def word(t: Tok): String =
      s.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    // a bracket list ANYWHERE inside a bracket-consuming table
    // function's call span is THAT rule's to claim — even when the
    // call bailed on an unhonorable option, the pinned contract is
    // that the whole call stays byte-identical for a loud parse error.
    // Ownership is the full parenthesized span, not just the path
    // position (ADVICE r12): `read_csv('f.csv', names=['a'])` bails,
    // and rewriting the later-argument bracket to array('a') would
    // mutate the echoed text of a call the contract says stays intact.
    val bracketFns = TableFns.keySet ++ CsvFns + "read_parquet_mergetree"
    val ownedSpans: Seq[(Int, Int)] = {
      val buf = Seq.newBuilder[(Int, Int)]
      var i = 0
      while (i < ts.length - 1) {
        if (ts(i).kind == Word && ts(i + 1).kind == Punct('(') &&
            bracketFns(word(ts(i)))) {
          var depth = 0
          var j = i + 1
          var close = -1
          while (close < 0 && j < ts.length) {
            ts(j).kind match {
              case Punct('(') => depth += 1
              case Punct(')') => depth -= 1; if (depth == 0) close = j
              case _ =>
            }
            j += 1
          }
          if (close > 0) buf += ((i + 1, close))
        }
        i += 1
      }
      buf.result()
    }
    def ownedByBracketFn(idx: Int): Boolean =
      ownedSpans.exists { case (open, close) => idx > open && idx < close }
    var k = 0
    while (k < ts.length) {
      if (ts(k).kind == Punct('[')) {
        val prev = if (k == 0) None else Some(ts(k - 1))
        val isArrayKw = prev.exists(p => p.kind == Word && word(p) == "array")
        val literalPos = prev match {
          case None => true
          case Some(p) => p.kind match {
            case Punct('(') | Punct(',') | Punct('=') | Punct('<') |
                 Punct('>') | Punct('+') | Punct('-') | Punct('*') |
                 Punct('/') | Punct('%') | Punct('|') | Punct('&') |
                 Punct('!') | Punct(';') => true
            case Word => isArrayKw || ExprKeywords(word(p))
            case _ => false
          }
        }
        val owned = ownedByBracketFn(k) // span-based: covers every position
        if (literalPos && !owned) {
          // matching close bracket at depth 0 (contents may nest)
          var depth = 0
          var j = k
          var close = -1
          while (close < 0 && j < ts.length) {
            ts(j).kind match {
              case Punct('[') => depth += 1
              case Punct(']') => depth -= 1; if (depth == 0) close = j
              case _ =>
            }
            j += 1
          }
          if (close > 0) {
            val inner = s.substring(ts(k).end, ts(close).start).trim
            // `ARRAY[...]`: the keyword is part of the literal — consume it
            val from = if (isArrayKw) ts(k - 1).start else ts(k).start
            return Some(s.substring(0, from) +
              s"array($inner)" + s.substring(ts(close).end))
          }
        }
      }
      k += 1
    }
    None
  }

  /** DuckDB `struct_pack(a := 1, b := 'x')` → `named_struct('a', 1,
    * 'b', 'x')`: the `:=` named-argument syntax doesn't parse in Spark,
    * but the mapping is purely syntactic — names become string
    * literals, value expressions are copied verbatim (balanced-paren
    * spans up to the next top-level comma). Nested struct_packs resolve
    * across fixpoint iterations (outer first; the inner call rides the
    * copied expression text into the next pass). Malformed shapes
    * (missing `:=`, empty value) leave the call untouched for Spark's
    * own loud parse error. */
  private def rewriteFirstStructPack(s: String): Option[String] = {
    if (!s.toLowerCase(java.util.Locale.ROOT).contains("struct_pack")) return None
    val ts = lex(s)
    def word(t: Tok): String =
      s.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    var k = 0
    while (k + 1 < ts.length) {
      if (ts(k).kind == Word && word(ts(k)) == "struct_pack" &&
          ts(k + 1).kind == Punct('(')) {
        val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var i = k + 2
        var ok = true
        var done = false
        while (ok && !done && i < ts.length) {
          // name := expr
          val nameTok = ts(i)
          val name = nameTok.kind match {
            case Word => s.substring(nameTok.start, nameTok.end)
            case QIdent => s.substring(nameTok.start + 1,
              math.max(nameTok.start + 1, nameTok.end - 1))
              .replace("\"\"", "\"").replace("``", "`")
            case _ => ""
          }
          if (name.isEmpty ||
              i + 2 >= ts.length ||
              ts(i + 1).kind != Punct(':') || ts(i + 2).kind != Punct('=') ||
              ts(i + 1).end != ts(i + 2).start) ok = false
          else {
            // value expression: tokens to the next top-level ',' or ')'
            var depth = 0
            var j = i + 3
            var end = -1
            var close = false
            while (end < 0 && j < ts.length) {
              ts(j).kind match {
                case Punct('(') | Punct('[') => depth += 1
                case Punct(')') if depth == 0 => end = j; close = true
                case Punct(')') | Punct(']') => depth -= 1
                case Punct(',') if depth == 0 => end = j
                case _ =>
              }
              j += 1
            }
            if (end < 0 || end == i + 3) ok = false
            else {
              pairs += ((name, s.substring(ts(i + 3).start, ts(end).start).trim))
              i = end + (if (close) 0 else 1)
              done = close
            }
          }
        }
        if (ok && done && pairs.nonEmpty) {
          val args = pairs.map { case (n, v) =>
            "'" + n.replace("'", "''") + "', " + v }.mkString(", ")
          return Some(s.substring(0, ts(k).start) +
            s"named_struct($args)" + s.substring(ts(i).end))
        }
      }
      k += 1
    }
    None
  }

  /** Units the CH 3-arg date-shift forms accept that Spark's
    * `timestampadd` also takes as a bare keyword. (nanosecond is CH-only
    * — a call with it stays untouched for a loud error.) */
  private val DateShiftUnits = Set("second", "minute", "hour", "day",
    "week", "month", "quarter", "year", "millisecond", "microsecond")

  /** CH 3-arg `dateAdd(unit, n, x)` / `dateSub(unit, n, x)` (VERDICT
    * r13 #2) → Spark's `timestampadd(UNIT, n, x)`, negating n for the
    * sub direction. A pre-parse token rewrite on the struct_pack layer:
    * the bare unit-keyword first ARGUMENT doesn't survive Spark's
    * expression parser, but `timestampadd` is exactly the parser rule
    * built to accept it. Only the unambiguous CH shape rewrites — the
    * name (dateAdd/date_add/dateSub/date_sub, not member-accessed),
    * directly followed by `(`, whose first argument is a single BARE
    * unit keyword from [[DateShiftUnits]] and which has exactly three
    * top-level arguments. Everything else stays byte-identical for the
    * existing loud paths: Spark's own 2-arg date_add/date_sub
    * (day-count shift — two arguments), DuckDB's QUOTED-part
    * `date_sub('month', a, b)` (a completed-partitions COUNT between
    * two dates — a different function; Str token, not Word), and any
    * column literally named dateSub (no following paren). Result is
    * TimestampType — the date tier's documented deviation (the
    * engine's time model is epoch-ns int64, so Date-ness is not
    * preserved; same contract as addYears/subtractDays). */
  private def rewriteFirstDateShift(s: String): Option[String] = {
    val low = s.toLowerCase(java.util.Locale.ROOT)
    if (!low.contains("dateadd") && !low.contains("date_add") &&
        !low.contains("datesub") && !low.contains("date_sub")) return None
    val ts = lex(s)
    def word(t: Tok): String =
      s.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    var k = 0
    while (k + 4 < ts.length) {
      val name = if (ts(k).kind == Word) word(ts(k)) else ""
      val isAdd = name == "dateadd" || name == "date_add"
      val isSub = name == "datesub" || name == "date_sub"
      val bareName = k == 0 || ts(k - 1).kind != Punct('.')
      if ((isAdd || isSub) && bareName && ts(k + 1).kind == Punct('(') &&
          ts(k + 2).kind == Word && DateShiftUnits(word(ts(k + 2))) &&
          ts(k + 3).kind == Punct(',')) {
        // spans of the 2nd and 3rd arguments: balanced scan to the ONE
        // further top-level comma, then the closing paren; any other
        // shape (4+ args, unbalanced) leaves the call untouched
        var depth = 0
        var j = k + 4
        var comma = -1
        var close = -1
        var extra = false
        while (close < 0 && j < ts.length) {
          ts(j).kind match {
            case Punct('(') | Punct('[') => depth += 1
            case Punct(')') if depth == 0 => close = j
            case Punct(')') | Punct(']') => depth -= 1
            case Punct(',') if depth == 0 =>
              if (comma < 0) comma = j else extra = true
            case _ =>
          }
          j += 1
        }
        if (close > 0 && !extra && comma > k + 4 && close > comma + 1) {
          val unit = word(ts(k + 2)).toUpperCase(java.util.Locale.ROOT)
          val n = s.substring(ts(k + 4).start, ts(comma).start).trim
          val x = s.substring(ts(comma + 1).start, ts(close).start).trim
          val shifted =
            if (isSub) s"timestampadd($unit, -($n), $x)"
            else s"timestampadd($unit, $n, $x)"
          return Some(s.substring(0, ts(k).start) + shifted +
            s.substring(ts(close).end))
        }
      }
      k += 1
    }
    None
  }

  /** DuckDB FROM-position `generate_series(…)` / `unnest(…)` (VERDICT
    * r10 #5): table-function position resolves from Spark's
    * TableFunctionRegistry, where neither name exists, so the shim
    * rewrites the call to the equivalent generator subquery —
    * `FROM generate_series(a, b[, s])` →
    * `FROM (SELECT explode(sequence(a, b[, s])) AS generate_series)`
    * (inclusive bounds: sequence IS generate_series; DuckDB's exclusive
    * `range` stays unmapped — Spark's own range TVF resolves first) and
    * `FROM unnest(expr)` → `FROM (SELECT explode(expr) AS unnest)`.
    * Only the unambiguous table positions rewrite — the token before
    * the call must be FROM or JOIN; the SELECT-position scalar forms
    * are native builders (GraftFunctions duckCompat) and need no text
    * rewrite. A trailing alias (`FROM generate_series(1,3) t(x)`)
    * survives verbatim after the emitted subquery. */
  private def rewriteFirstFromGenerator(s: String): Option[String] = {
    val low = s.toLowerCase(java.util.Locale.ROOT)
    if (!low.contains("generate_series") && !low.contains("unnest") &&
        !low.contains("generate_subscripts")) return None
    val ts = lex(s)
    def word(t: Tok): String =
      s.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    val names = Set("generate_series", "unnest", "generate_subscripts")
    var k = 1
    while (k + 1 < ts.length) {
      val name = if (ts(k).kind == Word) word(ts(k)) else ""
      if (names(name) &&
          ts(k + 1).kind == Punct('(') &&
          ts(k - 1).kind == Word && Set("from", "join")(word(ts(k - 1)))) {
        var depth = 0
        var i = k + 1
        var close = -1
        while (i < ts.length && close < 0) {
          ts(i).kind match {
            case Punct('(') => depth += 1
            case Punct(')') => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        if (close > 0) {
          val args = s.substring(ts(k + 1).end, ts(close).start).trim
          val inner = name match {
            case _ if args.isEmpty => None
            case "generate_series" => Some(s"sequence($args)")
            case "unnest" => Some(args)
            case "generate_subscripts" =>
              // generate_subscripts(arr, dim): 1-based positions 1..len.
              // Only dim = 1 maps (DuckDB lists are one-dimensional);
              // other dims leave the call for a loud error. The dim is
              // the LAST top-level comma-separated argument.
              val cut = lastTopLevelComma(args)
              if (cut < 0) None
              else {
                val (arr, dim) = (args.substring(0, cut).trim,
                  args.substring(cut + 1).trim)
                if (dim == "1" && arr.nonEmpty)
                  Some(s"sequence(1, size($arr))")
                else None
              }
          }
          inner.foreach { in =>
            return Some(s.substring(0, ts(k).start) +
              s"(SELECT explode($in) AS $name)" + s.substring(ts(close).end))
          }
        }
      }
      k += 1
    }
    None
  }

  /** Offset of the last top-level (paren/bracket-depth-0) comma in an
    * expression-list text, or -1. Quotes/comments are already gone from
    * table-function argument spans this is applied to — the surrounding
    * rewrite captured the span via the lexer — but strings may remain;
    * scan with a minimal quote skip. */
  private def lastTopLevelComma(t: String): Int = {
    var depth = 0
    var i = 0
    var last = -1
    while (i < t.length) {
      t.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < t.length && t.charAt(i) != '\'') i += 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth = math.max(0, depth - 1)
        case ',' if depth == 0 => last = i
        case _ =>
      }
      i += 1
    }
    last
  }

  /** Split SQL text on top-level `;` — outside string literals, quoted
    * identifiers and comments (the lexer already skips all three). The
    * reference's published benchmark text is a statement LIST
    * (`LOAD parquet; SELECT …`, reference BENCHMARK.md:11) and its
    * stdin bootstrap splits on `;` the same way. */
  def splitStatements(sql: String): Seq[String] = {
    val cuts = lex(sql).collect { case Tok(Punct(';'), st, _) => st }
    val bounds = (-1 +: cuts) :+ sql.length
    bounds.lazyZip(bounds.drop(1)).map((a, b) => sql.substring(a + 1, b))
      .map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** DuckDB extension/session management with no Spark counterpart —
    * `LOAD x`, `INSTALL x`, `PRAGMA …` (reference init.go installs
    * chsql this way; BENCHMARK.md:11 leads with `LOAD parquet`).
    * Accepted and ignored: the capability they request (parquet scan,
    * the chsql function surface) is built in here. `SET` is NOT
    * no-opped — Spark has its own SET semantics. */
  def isExtensionNoOp(stmt: String): Boolean = {
    val ts = lex(stmt)
    ts.headOption.exists { t =>
      t.kind == Word && (stmt.substring(t.start, t.end)
        .toLowerCase(java.util.Locale.ROOT) match {
        // `LOAD <ext>` / `LOAD 'path/ext'` / `LOAD "ext"` only — Spark's
        // own `LOAD DATA INPATH …` must NOT silently no-op (it should
        // fail loudly like any unsupported statement, not read as success)
        case "load" => ts.length == 2 &&
          (ts(1).kind == Word || ts(1).kind == Str || ts(1).kind == QIdent)
        case "install" | "pragma" | "force" => true
        case _ => false
      })
    }
  }

  /** `CREATE SECRET` (DuckDB's in-dialect S3 credential statement —
    * the reference's S3 merge path issues exactly this,
    * merge_service_s3.go:94-118) → the equivalent Hadoop `fs.s3a.*`
    * configuration, returned as a key→value map for the caller to
    * apply. `SCOPE 's3://bucket[/…]'` narrows to DuckDB's secret
    * scoping; here it maps to Hadoop's per-bucket override namespace
    * (`fs.s3a.bucket.<bucket>.…`). Returns None when the statement is
    * not a CREATE SECRET; throws on a CREATE SECRET it cannot map
    * (unknown TYPE) so misconfiguration fails loudly, not silently. */
  def parseSecret(stmt: String): Option[Map[String, String]] = {
    val ts = lex(stmt)
    def word(t: Tok): String =
      stmt.substring(t.start, t.end).toLowerCase(java.util.Locale.ROOT)
    def strVal(t: Tok): String =
      stmt.substring(t.start + 1, math.max(t.start + 1, t.end - 1))
        .replace("''", "'")
    if (ts.isEmpty || ts.head.kind != Word || word(ts.head) != "create") return None
    // CREATE [OR REPLACE] [PERSISTENT|TEMPORARY] SECRET [name] ( … )
    var i = 1
    while (i < ts.length && ts(i).kind == Word &&
      Set("or", "replace", "persistent", "temporary")(word(ts(i)))) i += 1
    if (i >= ts.length || ts(i).kind != Word || word(ts(i)) != "secret") return None
    i += 1
    if (i < ts.length && ts(i).kind == Word) i += 1 // optional secret name
    if (i >= ts.length || ts(i).kind != Punct('(')) return None
    i += 1
    // key value [, key value]* ) — DuckDB accepts `KEY 'v'`, `KEY v`,
    // and booleans/numbers as bare words. Only the KEY is lowercased:
    // a bare-word VALUE keeps its case (credentials are case-sensitive
    // — lowercasing AKIA… would corrupt it with no hint why auth fails)
    def rawWord(t: Tok): String = stmt.substring(t.start, t.end)
    val kv = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var ok = true
    var done = false
    while (ok && !done && i < ts.length) {
      if (ts(i).kind == Punct(')')) done = true
      else (ts(i).kind, if (i + 1 < ts.length) ts(i + 1).kind else Punct(0)) match {
        case (Word, Str) => kv += (word(ts(i)) -> strVal(ts(i + 1))); i += 2
        case (Word, Word) => kv += (word(ts(i)) -> rawWord(ts(i + 1))); i += 2
        case _ => ok = false
      }
      if (!done && ok) {
        if (i < ts.length && ts(i).kind == Punct(',')) i += 1
        else if (i < ts.length && ts(i).kind == Punct(')')) done = true
        else ok = false
      }
    }
    if (!ok || !done) return None
    val typ = kv.getOrElse("type", "s3").toLowerCase(java.util.Locale.ROOT)
    require(Set("s3", "r2", "gcs")(typ),
      s"CREATE SECRET TYPE '$typ' has no s3a mapping")
    val scopeBucket = kv.get("scope").flatMap { sc =>
      val p = sc.stripPrefix("s3://").stripPrefix("s3a://").stripPrefix("r2://")
        .stripPrefix("gcs://")
      p.takeWhile(_ != '/') match { case "" => None; case b => Some(b) }
    }
    val prefix = scopeBucket match {
      case Some(b) => s"fs.s3a.bucket.$b."
      case None => "fs.s3a."
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    kv.foreach {
      case ("key_id", v) => out += (prefix + "access.key" -> v)
      case ("secret", v) => out += (prefix + "secret.key" -> v)
      case ("session_token", v) => out += (prefix + "session.token" -> v)
      case ("region", v) => out += (prefix + "endpoint.region" -> v)
      case ("endpoint", v) => out += (prefix + "endpoint" -> v)
      case ("use_ssl", v) =>
        out += (prefix + "connection.ssl.enabled" ->
          Set("true", "1")(v.toLowerCase(java.util.Locale.ROOT)).toString)
      case ("url_style", v) =>
        out += (prefix + "path.style.access" ->
          (v.toLowerCase(java.util.Locale.ROOT) == "path").toString)
      case ("type", _) | ("scope", _) | ("provider", _) => // structural
      case (k, _) => require(false, s"CREATE SECRET key '$k' has no s3a mapping")
    }
    Some(out.toMap)
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

  /** Known chsql/ClickHouse/DuckDB function names NOT yet mapped to a
    * Catalyst builder (VERDICT r9 #5). The /query route consults this
    * when Spark reports UNRESOLVED_ROUTINE so the caller gets "this is
    * a dialect-surface gap — report it" instead of a generic analyzer
    * error that reads like a typo. Names whose ClickHouse semantics
    * DIFFER from a same-named Spark builtin (any, dateDiff, topK) can't
    * appear here — Spark resolves them case-insensitively first; the
    * deviation list in SURVEY §2.3 covers those. Curated from the chsql
    * extension surface + ClickHouse function reference + DuckDB
    * functions the shim doesn't rewrite. */
  private val KnownUnmappedFns: Map[String, String] = {
    // (the r12 tiers — GraftFunctions duckCompat/chsqlCompat +
    // DialectExtras + the table-fn rewrites here — mapped most of the
    // former list; what remains is names whose semantics CANNOT map
    // onto a Catalyst expression without silent deviation)
    val ch = Seq(
      // age: CH's calendar-complete-units rules differ from
      // timestampdiff on edge dates — same-named different answers
      "age",
      // hashes: the common family (cityHash64/sipHash64/halfMD5/
      // intHash32/intHash64/URLHash — since r15 sipHash128/
      // sipHash128Reference as lowercase hex, and farmFingerprint64
      // pinned to Guava's independent golden) is implemented
      // BIT-EXACTLY in functions/ChHashes.scala. farmHash64 alone
      // stays: it calls farmhash::Hash64, which DISPATCHES per CPU
      // (farmhashte on SSE4.1 x86-64, farmhashxo elsewhere) — the
      // same name answers differently across ClickHouse hosts, so
      // there is no single bit pattern to be exact against;
      // farmFingerprint64 is farmhash's own documented stable variant
      "farmHash64",
      // block-order-positional scalars: no well-defined distributed
      // meaning — Spark window functions are the honest spelling
      "runningDifference", "neighbor",
      // (r13/r14 sweep leftovers all closed: dateSub/dateAdd via the
      // rewriteFirstDateShift token rewrite, bar/roundToExp2/intExp10
      // as native builders, and erf in r15 late — the ChErf kernel is
      // CORRECTLY ROUNDED, so the "silently differ from std::erf in
      // the last ulp" hold reason is dissolved rather than waived)
      )
    val duck = Seq(
      // dim = 1 rewrites in FROM position (rewriteFirstFromGenerator);
      // only the dim != 1 bail path — multi-dimensional arrays DuckDB
      // itself rarely has — reaches the analyzer and this 400
      "generate_subscripts")
    (ch.map(_ -> "chsql/ClickHouse") ++ duck.map(_ -> "DuckDB")).map {
      case (n, s) => n.toLowerCase(java.util.Locale.ROOT) -> s }.toMap
  }

  /** The dialect surface owning an unresolved function name, if known —
    * `Some("chsql/ClickHouse")` / `Some("DuckDB")` for a name on the
    * reference's /query surface that graft has not mapped yet. */
  def dialectGap(fnName: String): Option[String] =
    KnownUnmappedFns.get(
      fnName.stripPrefix("`").stripSuffix("`")
        .toLowerCase(java.util.Locale.ROOT))

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
