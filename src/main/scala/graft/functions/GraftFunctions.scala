package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Average, Count, HistogramNumeric, HyperLogLogPlusPlus, Max, MaxBy, Min, MinBy, Percentile, Sum}
import org.apache.spark.sql.types._

/** ClickHouse-compat function surface (reference aliases.sql:1-36) plus
  * `epoch_ns`.
  *
  * Every function is a thin builder over existing Catalyst expressions
  * (Cast / try-Cast / Coalesce / Like), so all of them resolve to
  * codegen'd, pushdown-friendly plans — no UDF boundary anywhere.
  *
  * Deliberate reference-following deviations from ClickHouse proper:
  *  - `toInt8` casts to a 64-bit int (DuckDB INT8 == BIGINT, aliases.sql:2).
  *  - `intDiv` is plain division, not integer division (aliases.sql:35).
  *  - `match` is SQL LIKE, not re2 (aliases.sql:36). `rlike` is available
  *    as the regex form via Spark built-ins.
  * Unsigned targets map to the next wider signed type (Spark has no
  * unsigned); UInt64 → Decimal(20,0) for full range (the reference's own
  * UBIGINT arrow path is broken — SURVEY §2.1 quirks).
  */
object GraftFunctions {
  private def cast(e: Expression, t: DataType): Expression = Cast(e, t)

  /** ParseUrl with failOnError pinned FALSE (try_parse_url): the
    * default tracks the ANSI flag (ON in Spark 4), under which a
    * malformed URL throws — but this compat surface's contract is CH's
    * permissive one (null on junk). Shared by every URL-part builder
    * here and in [[DialectExtras]]. */
  private[functions] def tryParseUrl(args: Expression*): Expression =
    new ParseUrl(args.toSeq, false)

  /** A SUPERSET of every string Spark's cast can parse as a number (or
    * bool-as-number): anything failing this regex is a guaranteed
    * try_cast null. The guard matters because a FAILING try_cast
    * throws-and-catches a JVM exception per row (~13 µs measured, 7×
    * the whole projection) — a ClickHouse-style toInt64OrNull over a
    * non-numeric column would dominate the query. False positives
    * (regex passes, cast still fails) just pay the exception; false
    * negatives cannot exist, so `when(guard, try_cast) else null` is
    * row-for-row identical to bare try_cast. */
  // includes Java parseDouble's trailing d/D/f/F suffix, hex-float forms,
  // and its whitespace definition (anything <= \x20, wider than \s) — the
  // superset property is what makes the guard sound
  private val NumericishRe = Literal(
    "(?i)^[\\x00-\\x20]*[+-]?((\\d+\\.?\\d*|\\.\\d+)(e[+-]?\\d+)?[df]?" +
      "|0x[0-9a-f]*\\.?[0-9a-f]*(p[+-]?\\d+)?[df]?" +
      "|inf(inity)?|nan|true|false)[\\x00-\\x20]*$")

  /** try_cast with the regex prefilter applied ONLY to string inputs.
    * The guard exists to skip the per-row throw/catch on non-numeric
    * STRINGS; for any other input type (timestamp, numeric, bool) the
    * cast-to-string-then-regex detour would change SEMANTICS — e.g.
    * toInt64OrNull(ts) rendered '2026-08-13 ...', failed the regex, and
    * returned all NULLs where bare try_cast yields epoch seconds. The
    * child's type is unknown at registration (builders get unresolved
    * expressions), so the branch happens at analysis via
    * RuntimeReplaceable. */
  private case class GuardedTryCast(child: Expression, target: DataType)
    extends Expression with RuntimeReplaceable
      with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
    override lazy val replacement: Expression = child.dataType match {
      case StringType =>
        // With = ONE child evaluation shared by guard and cast: the
        // conditional CaseWhen branch defeats subexpression elimination,
        // so a bare repeat would pay an expensive child twice per row
        // (and test a DIFFERENT value than it casts for a
        // non-deterministic child)
        With(child) { refs =>
          CaseWhen(
            Seq((new RLike(refs.head, NumericishRe),
              Cast(refs.head, target, None, EvalMode.TRY))),
            Some(Literal.create(null, target)))
        }
      case _ => Cast(child, target, None, EvalMode.TRY)
    }
    override protected def withNewChildInternal(newChild: Expression): GuardedTryCast =
      copy(child = newChild)
  }

  private def tryCast(e: Expression, t: DataType): Expression =
    GuardedTryCast(e, t)
  private def tryCastOrZero(e: Expression, t: DataType): Expression =
    Coalesce(Seq(tryCast(e, t), Cast(Literal(0), t)))

  private val intTargets: Seq[(String, DataType)] = Seq(
    "toInt8"   -> LongType, // DuckDB INT8 = BIGINT; follow the reference
    "toInt16"  -> ShortType,
    "toInt32"  -> IntegerType,
    "toInt64"  -> LongType,
    "toInt128" -> DecimalType(38, 0),
    "toInt256" -> DecimalType(38, 0),
  )
  private val uintTargets: Seq[(String, DataType)] = Seq(
    "toUInt8"  -> ShortType,
    "toUInt16" -> IntegerType,
    "toUInt32" -> LongType,
    "toUInt64" -> DecimalType(20, 0),
  )

  /** The whole surface as (name, builder) pairs — session-independent,
    * consumed both by the imperative `registerAll` and by
    * [[graft.GraftSparkExtensions]] (the `spark.sql.extensions` plug-in
    * path, so a stock Spark session enables graft by config alone). */
  lazy val builders: Seq[(String, Seq[Expression] => Expression)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Expression] => Expression)]
    // builders index es(0)/es(1) for their declared shape; a wrong-arity
    // SQL call would surface the raw IndexOutOfBounds with no function
    // name — rethrow as the clear analysis-time message instead (the
    // literalIntArg/hll_distinct guard, generalized to the whole surface)
    def reg(name: String)(b: Seq[Expression] => Expression): Unit =
      out += ((name, (es: Seq[Expression]) =>
        try b(es)
        catch {
          case _: IndexOutOfBoundsException | _: NoSuchElementException =>
            throw new IllegalArgumentException(
              s"$name: wrong or missing arguments (got ${es.size})")
        }))

    reg("epoch_ns")(es => EpochNs(Cast(es.head, TimestampType)))
    reg("toString")(es => cast(es.head, StringType))
    intTargets.foreach { case (n, t) =>
      reg(n)(es => cast(es.head, t))
      reg(n + "OrZero")(es => tryCastOrZero(es.head, t))
      reg(n + "OrNull")(es => tryCast(es.head, t))
    }
    uintTargets.foreach { case (n, t) =>
      reg(n)(es => cast(es.head, t))
      // reference naming quirk: toUInt8rZero / toUInt8rNull (aliases.sql:24-31)
      reg(n + "rZero")(es => tryCastOrZero(es.head, t))
      reg(n + "rNull")(es => tryCast(es.head, t))
    }
    reg("toFloat")(es => cast(es.head, DoubleType))
    reg("toFloatOrNull")(es => tryCast(es.head, DoubleType))
    reg("toFloatOrZero")(es => tryCastOrZero(es.head, DoubleType))
    reg("intDiv")(es => new Divide(es(0), es(1)))
    reg("match")(es => new Like(es(0), es(1)))
    // graft-native kernels (not in aliases.sql): codegen'd dot product
    // and word n-grams — `ngrams(words, n)` needs a literal int n
    reg("dotf")(es => DotProduct(es(0), es(1)))
    reg("dotl")(es => DotProductLong(es(0), es(1)))
    reg("quant8")(es => Quantize8(es(0)))
    reg("letter_counts")(es => LetterCounts(es(0)))
    // CH-compat AGGREGATES: window_funnel(window_ns, t, cond1, ...) and
    // retention(cond1, ..., condK)
    reg("window_funnel")(es => WindowFunnelAgg(es(0), es(1), es.drop(2))
      .toAggregateExpression())
    reg("retention")(es => RetentionAgg(es).toAggregateExpression())
    // CH-compat AGGREGATE: top_k(k, expr) — space-saving heavy hitters
    reg("top_k")(es => TopKAgg(es(0), es(1)).toAggregateExpression())
    // deterministic HLL cardinality (uniq-family; SketchOps, p89/p90)
    reg("hll_distinct") { es =>
      if (es.length != 1) throw new IllegalArgumentException(
        s"hll_distinct(expr): expected 1 argument, got ${es.length}")
      HllAgg(es.head).toAggregateExpression()
    }
    // CH -If aggregate combinators (countIf/sumIf/…): the condition gates
    // the input to null, which every Spark aggregate already ignores —
    // so each combinator partial-aggregates map-side like its base
    // aggregate, no extra pass. CH argument order: xxxIf(column, cond).
    def gated(value: Expression, cond: Expression): Expression =
      If(cond, value, Literal.create(null, NullType))
    reg("countIf")(es => Count(gated(Literal(1), es(0))).toAggregateExpression())
    reg("sumIf")(es => Sum(gated(es(0), es(1))).toAggregateExpression())
    reg("avgIf")(es => Average(gated(es(0), es(1))).toAggregateExpression())
    reg("minIf")(es => Min(gated(es(0), es(1))).toAggregateExpression())
    reg("maxIf")(es => Max(gated(es(0), es(1))).toAggregateExpression())
    // CH argMax(arg, val)/argMin: value of `arg` at the max/min of `val`
    // (the "latest value" idiom). Ties on `val` pick an arbitrary row,
    // exactly like ClickHouse — pass a unique `val` for determinism.
    reg("argMax")(es => MaxBy(es(0), es(1)).toAggregateExpression())
    reg("argMin")(es => MinBy(es(0), es(1)).toAggregateExpression())
    // CH groupArray/groupUniqArray: Spark's collect_list/collect_set
    // ARE the same aggregates (order within a group is arrival order —
    // non-deterministic distributed, in both engines). anyLast = last
    // non-null encountered (CH aggregates skip NULLs).
    reg("groupArray")(es =>
      aggregate.CollectList(es.head).toAggregateExpression())
    reg("groupUniqArray")(es =>
      aggregate.CollectSet(es.head).toAggregateExpression())
    reg("anyLast")(es =>
      aggregate.Last(es.head, ignoreNulls = true).toAggregateExpression())
    // CH uniq / uniqExact: HLL++ sketch (mergeable, fixed memory — the
    // 100 TB path) vs exact distinct count (expands the shuffle key)
    reg("uniq")(es => HyperLogLogPlusPlus(es.head).toAggregateExpression())
    reg("uniqExact")(es => Count(es).toAggregateExpression(isDistinct = true))
    // CH quantile family, same approx/exact split as uniq/uniqExact.
    // CH's parametric syntax quantile(0.5)(x) doesn't parse in Spark SQL,
    // so parameters lead the argument list like window_funnel/top_k:
    // quantile(level, x). `quantile` is the sketch (mergeable fixed-size
    // summary — the 100 TB path, like CH's own sampling estimator);
    // `quantileExact` is exact percentile_cont interpolation (CH
    // quantileExact picks a nearest element instead of interpolating —
    // documented deviation, matching q17's oracle-proven semantics).
    // CH `median` needs no alias: Spark's built-in exact median stands.
    reg("quantile")(es => new ApproximatePercentile(es(1), es(0)).toAggregateExpression())
    reg("quantileExact")(es => new Percentile(es(1), es(0)).toAggregateExpression())
    // CH histogram(bins)(x) → histogram(bins, x): adaptive-bin numeric
    // histogram, array of (x, y) centroids (Spark's HistogramNumeric is
    // the same streaming-merge algorithm family CH uses)
    reg("histogram")(es => new HistogramNumeric(es(1), es(0)).toAggregateExpression())
    // training-pipeline text ops on the SQL surface: the same Column
    // expressions the p-series dataflows use, resolved through the
    // Column bridge — /query users get scrubbing/scoring in plain SQL
    // ("SELECT redact_pii(text), quality_score(text) FROM docs"), and
    // every one stays a codegen'd column expression (no UDF boundary)
    locally {
      import org.apache.spark.sql.GraftColumnBridge.{column => c, toExpression => x}
      reg("redact_pii")(es => x(graft.ops.PiiOps.redact(c(es.head))))
      reg("quality_score")(es => x(graft.ops.TextOps.qualityScore(c(es.head))))
      reg("lang_id")(es => x(graft.ops.TextOps.langId(c(es.head))))
      reg("token_count")(es => x(graft.ops.TextOps.tokenCount(c(es.head))))
      reg("set_fingerprint")(es => x(graft.ops.TextOps.setFingerprint(c(es.head))))
      reg("rolling_fingerprint")(es =>
        x(graft.ops.TextOps.rollingFingerprint(c(es.head))))
      reg("clean_lines")(es => x(graft.ops.TextOps.cleanLines(c(es.head))))
      // content-defined chunk hashes + periodicity: the p73/p76 kernels
      // as /query scalars — ad-hoc chunk joins and loop screening in SQL
      reg("cdc_chunks")(es => x(graft.ops.DedupOps.cdcChunkHashes(c(es.head))))
      reg("rep_milli")(es => x(graft.ops.TextOps.periodicityMilli(c(es.head))))
      // distinct word n-gram shingles — the dedup/decontamination unit
      // as a /query scalar (explode(shingles(text, 8)) IS the
      // DedupOps.shingles frame); n literal like ngrams
      reg("shingles") { es =>
        val n = literalIntArg("shingles(text, n)", es, 2, 1)
        x(graft.ops.DedupOps.shingleArr(c(es.head), n))
      }
      // Morton z-value (LayoutOps, p88): lets /query users cluster a
      // CTAS/INSERT by two dimensions — "… ORDER BY zorder_key(ts DIV
      // 3600000000000, user_id)" — the OPTIMIZE ZORDER analog in SQL
      reg("zorder_key") { es =>
        if (es.length != 2) throw new IllegalArgumentException(
          s"zorder_key(x, y): expected 2 arguments, got ${es.length}")
        x(graft.ops.LayoutOps.zorder2(c(es(0)), c(es(1))))
      }
    }
    // Unicode NFC normalization (codegen; DuckDB nfc_normalize parity)
    reg("nfc")(es => NfcNormalize(es.head))
    reg("ngrams") { es =>
      val n = literalIntArg("ngrams(words, n)", es, 2, 1)
      WordNGrams(es(0), n)
    }
    duckCompat(reg)
    chsqlCompat(reg)
    DialectExtras.register(reg) // the r12 second tier (same builder shape)
    out.toSeq
  }

  /** Validate-and-extract a literal INTEGRAL argument (ADVICE r7: the
    * old inline version indexed es(1) unguarded — a one-argument call
    * from /query SQL surfaced as an opaque IndexOutOfBounds 500 — and
    * Number.intValue silently truncated fractional literals like 2.5). */
  private def literalIntArg(usage: String, es: Seq[Expression],
                            arity: Int, idx: Int): Int = {
    if (es.length != arity) throw new IllegalArgumentException(
      s"$usage: expected $arity arguments, got ${es.length}")
    es(idx) match {
      case e if e.foldable => e.eval() match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long =>
          if (l.longValue() != l.intValue()) throw new IllegalArgumentException(
            s"$usage: n out of int range: $l")
          l.intValue()
        case s: java.lang.Short => s.intValue()
        case b: java.lang.Byte => b.intValue()
        case other => throw new IllegalArgumentException(
          s"$usage: n must be a literal integer, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"$usage: n must be a literal integer, not a column")
    }
  }

  /** `len(x)`: DuckDB's len works on strings AND lists and returns
    * BIGINT; the dispatch needs the child's resolved type, hence
    * RuntimeReplaceable (same pattern as GuardedTryCast). */
  private case class DuckLen(child: Expression)
    extends Expression with RuntimeReplaceable
      with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
    override lazy val replacement: Expression = child.dataType match {
      case _: ArrayType | _: MapType => Cast(Size(child), LongType)
      case _ => Cast(Length(Cast(child, StringType)), LongType)
    }
    override protected def withNewChildInternal(newChild: Expression): DuckLen =
      copy(child = newChild)
  }

  /** DuckDB strftime/strptime C-style format → Java DateTimeFormatter
    * pattern. Literal text letters are quoted ('T' in ISO stamps),
    * unknown %X specifiers fail loudly rather than silently mangling. */
  private[functions] def cFormatToJava(fmt: String): String = {
    val b = new StringBuilder
    var i = 0
    // literal characters BUFFER into runs and flush as ONE quoted
    // segment: per-character quoting produced '' between adjacent
    // letters ("%d on %Y" → "dd 'o''n' yyyy"), which DateTimeFormatter
    // reads as an embedded apostrophe — output corrupted, strptime of
    // valid input failing
    val run = new StringBuilder
    def lit(seg: String): Unit = run.append(seg)
    def flushLit(): Unit = if (run.nonEmpty) {
      val seg = run.toString; run.clear()
      if (seg.exists(ch => Character.isLetter(ch) || ch == '\''))
        b.append("'").append(seg.replace("'", "''")).append("'")
      else b.append(seg)
    }
    val map = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'e' -> "d",
      'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss", 'f' -> "SSSSSS",
      'g' -> "SSS", 'p' -> "a", 'j' -> "DDD", 'b' -> "MMM", 'B' -> "MMMM",
      'a' -> "EEE", 'A' -> "EEEE", 'Z' -> "zz", 'z' -> "xxx")
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val (spec, skip) = fmt.charAt(i + 1) match {
          case '-' if i + 2 < fmt.length => (fmt.charAt(i + 2), 3) // %-d: no pad
          case s => (s, 2)
        }
        if (spec == '%') { lit("%"); i += skip }
        else map.get(spec) match {
          case Some(j) =>
            flushLit()
            b.append(if (skip == 3) j.substring(0, 1) else j); i += skip
          case None => throw new IllegalArgumentException(
            s"strftime/strptime: unsupported format specifier %$spec in '$fmt'")
        }
      } else { lit(c.toString); i += 1 }
    }
    flushLit()
    b.toString
  }

  /** Shared foldable-literal-string extraction — also the server's
    * artifact-bound function arguments (match_bm25's query text). */
  private[graft] def literalString(usage: String, e: Expression): String =
    if (e.foldable) e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$usage: expected a string literal, got $other")
    } else throw new IllegalArgumentException(
      s"$usage: the argument must be a string literal, not a column")

  /** `empty`/`notEmpty`/`length` work on strings AND arrays in
    * ClickHouse; dispatch needs the resolved child type. */
  private case class ChEmpty(child: Expression, negate: Boolean)
    extends Expression with RuntimeReplaceable
      with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
    override lazy val replacement: Expression = {
      val len = child.dataType match {
        case _: ArrayType | _: MapType => Size(child)
        case _ => Length(Cast(child, StringType))
      }
      if (negate) GreaterThan(len, Literal(0)) else EqualTo(len, Literal(0))
    }
    override protected def withNewChildInternal(newChild: Expression): ChEmpty =
      copy(child = newChild)
  }

  /** ClickHouse-compat surface BEYOND the reference's aliases.sql: the
    * reference image installs the community `chsql` extension
    * (reference merge/service/merge_service_fs.go:147-152,
    * Dockerfile:11), so any chsql macro works through its /query even
    * though nothing in its own code calls one. This covers the
    * commonly-used families (date parts/truncation, string tests, URL
    * parts, IPv4, JSON extraction, array membership, multiIf) — every
    * one a thin builder over existing Catalyst expressions, codegen'd,
    * no UDF boundary. ClickHouse semantics notes inline. */
  private def chsqlCompat(reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    def ts(e: Expression) = Cast(e, TimestampType)
    def dt(e: Expression) = Cast(e, DateType)
    // date parts (CH returns small ints; Spark's are int — fine upcast)
    reg("toYear")(es => Year(dt(es.head)))
    reg("toMonth")(es => Month(dt(es.head)))
    reg("toDayOfMonth")(es => DayOfMonth(dt(es.head)))
    // CH toDayOfWeek is ISO Monday=1..Sunday=7
    reg("toDayOfWeek")(es => Add(WeekDay(dt(es.head)), Literal(1)))
    reg("toDayOfYear")(es => DayOfYear(dt(es.head)))
    reg("toHour")(es => Hour(ts(es.head)))
    reg("toMinute")(es => Minute(ts(es.head)))
    reg("toSecond")(es => Second(ts(es.head)))
    reg("toDate")(es => dt(es.head))
    reg("toDateTime")(es => ts(es.head))
    reg("toUnixTimestamp")(es => UnixSeconds(ts(es.head)))
    reg("toYYYYMM")(es =>
      Add(Multiply(Year(dt(es.head)), Literal(100)), Month(dt(es.head))))
    reg("toYYYYMMDD")(es =>
      Add(Add(Multiply(Year(dt(es.head)), Literal(10000)),
        Multiply(Month(dt(es.head)), Literal(100))), DayOfMonth(dt(es.head))))
    reg("toStartOfYear")(es => TruncDate(dt(es.head), Literal("year")))
    reg("toStartOfMonth")(es => TruncDate(dt(es.head), Literal("month")))
    // CH default mode 0 weeks start SUNDAY (trunc('week') is Monday):
    // date - (dayofweek - 1), Spark DayOfWeek being 1=Sunday..7
    reg("toStartOfWeek")(es =>
      DateSub(dt(es.head), Subtract(DayOfWeek(dt(es.head)), Literal(1))))
    reg("toStartOfDay")(es => TruncTimestamp(Literal("day"), ts(es.head)))
    reg("toStartOfHour")(es => TruncTimestamp(Literal("hour"), ts(es.head)))
    reg("toStartOfMinute")(es => TruncTimestamp(Literal("minute"), ts(es.head)))
    reg("today")(_ => CurrentDate())
    reg("yesterday")(_ => DateSub(CurrentDate(), Literal(1)))
    // string tests / transforms (UTF8-suffixed CH names are the
    // character-wise forms — Spark strings are character-wise already)
    reg("empty")(es => ChEmpty(es.head, negate = false))
    reg("notEmpty")(es => ChEmpty(es.head, negate = true))
    reg("lengthUTF8")(es => Length(Cast(es.head, StringType)))
    reg("lowerUTF8")(es => Lower(es.head))
    reg("upperUTF8")(es => Upper(es.head))
    reg("substringUTF8")(es => Substring(es(0), es(1), es(2)))
    reg("leftPad")(es => StringLPad(es(0), es(1),
      if (es.length > 2) es(2) else Literal(" ")))
    reg("rightPad")(es => StringRPad(es(0), es(1),
      if (es.length > 2) es(2) else Literal(" ")))
    reg("startsWith")(es => StartsWith(es(0), es(1)))
    reg("endsWith")(es => EndsWith(es(0), es(1)))
    reg("splitByChar")(es => StringSplit(es(1),
      Literal(java.util.regex.Pattern.quote(
        literalString("splitByChar(sep, s)", es(0)))), Literal(-1)))
    // URL parts via Catalyst ParseUrl in TRY mode (null on non-URLs,
    // like CH's permissive parsers return ''). Try mode is EXPLICIT:
    // the default tracks spark.sql.ansi.enabled, which is ON in Spark 4
    // — bare ParseUrl THREW on any malformed URL, contradicting this
    // family's documented contract (caught by the r12 URL-tier specs)
    reg("protocol")(es => tryParseUrl(es.head, Literal("PROTOCOL")))
    reg("domain")(es => tryParseUrl(es.head, Literal("HOST")))
    reg("path")(es => tryParseUrl(es.head, Literal("PATH")))
    reg("queryString")(es => tryParseUrl(es.head, Literal("QUERY")))
    // IPv4 dotted-quad <-> UInt32
    reg("IPv4NumToString") { es =>
      val n = Cast(es.head, LongType)
      def oct(shift: Int) = Cast(
        BitwiseAnd(ShiftRight(n, Literal(shift)), Literal(255L)), StringType)
      Concat(Seq(oct(24), Literal("."), oct(16), Literal("."),
        oct(8), Literal("."), Cast(BitwiseAnd(n, Literal(255L)), StringType)))
    }
    reg("IPv4StringToNum")(es => ipv4StringToNum(es.head))
    // JSON extraction (CH simple-key form; nested paths pass through
    // as $.a.b via the same spelling)
    def jpath(es: Seq[Expression]): Expression =
      Concat(Seq(Literal("$."), Cast(es(1), StringType)))
    reg("JSONExtractString")(es => GetJsonObject(es(0), jpath(es)))
    reg("JSONExtractInt")(es =>
      Cast(GetJsonObject(es(0), jpath(es)), LongType, None, EvalMode.TRY))
    reg("JSONExtractFloat")(es =>
      Cast(GetJsonObject(es(0), jpath(es)), DoubleType, None, EvalMode.TRY))
    reg("JSONExtractBool")(es =>
      Cast(GetJsonObject(es(0), jpath(es)), BooleanType, None, EvalMode.TRY))
    reg("JSONHas")(es => IsNotNull(GetJsonObject(es(0), jpath(es))))
    // arrays
    reg("has")(es => ArrayContains(es(0), es(1)))
    reg("indexOf")(es => ArrayPosition(es(0), es(1)))
    reg("arrayDistinct")(es => ArrayDistinct(es.head))
    reg("arrayReverse")(es => Reverse(es.head))
    // omitted length = to the end: the array's own size is always an
    // upper bound (a huge literal overflows Slice's start+length math)
    reg("arraySlice")(es => Slice(es(0), es(1),
      if (es.length > 2) es(2) else Size(es(0))))
    // conditionals / arithmetic names
    reg("multiIf") { es =>
      require(es.length >= 3 && es.length % 2 == 1,
        s"multiIf(cond1, v1, ..., else): odd arity >= 3, got ${es.length}")
      val branches = es.dropRight(1).grouped(2).map(p => (p(0), p(1))).toSeq
      CaseWhen(branches, Some(es.last))
    }
    reg("plus")(es => Add(es(0), es(1)))
    reg("minus")(es => Subtract(es(0), es(1)))
    reg("multiply")(es => Multiply(es(0), es(1)))
    reg("modulo")(es => Remainder(es(0), es(1)))
    reg("negate")(es => UnaryMinus(es.head))
    reg("bitCount")(es => BitwiseCount(es.head))
    // ---- next-used tier (VERDICT r9 #5's "closes it properly" half):
    //      every one still a thin builder over existing Catalyst
    //      expressions. Names with CH-DIVERGENT same-named Spark
    //      builtins (any, dateDiff, topK) cannot be mapped — Spark
    //      resolves them case-insensitively first; they stay on the
    //      SURVEY §2.3 deviation list. ----
    reg("toQuarter")(es => Quarter(dt(es.head)))
    reg("toStartOfQuarter")(es => TruncDate(dt(es.head), Literal("quarter")))
    reg("toYYYYMMDDhhmmss") { es =>
      val t = ts(es.head)
      Seq(Multiply(Cast(Year(dt(es.head)), LongType), Literal(10000000000L)),
        Multiply(Cast(Month(dt(es.head)), LongType), Literal(100000000L)),
        Multiply(Cast(DayOfMonth(dt(es.head)), LongType), Literal(1000000L)),
        Multiply(Cast(Hour(t), LongType), Literal(10000L)),
        Multiply(Cast(Minute(t), LongType), Literal(100L)),
        Cast(Second(t), LongType)).reduce[Expression](Add(_, _))
    }
    reg("fragment")(es => tryParseUrl(es.head, Literal("REF")))
    reg("extractURLParameter")(es =>
      tryParseUrl(es(0), Literal("QUERY"), es(1)))
    reg("domainWithoutWWW")(es => RegExpReplace(
      tryParseUrl(es.head, Literal("HOST")), Literal("^www\\."), Literal("")))
    // '' when the host has no dot — CH's permissive convention; null
    // propagates for non-URLs like the rest of this URL family
    reg("topLevelDomain")(es => RegExpExtract(
      tryParseUrl(es.head, Literal("HOST")), Literal("\\.([^.]+)$"), Literal(1)))
    reg("splitByString")(es => StringSplit(es(1),
      Literal(java.util.regex.Pattern.quote(
        literalString("splitByString(sep, s)", es(0)))), Literal(-1)))
    reg("arrayStringConcat")(es => ArrayJoin(es(0),
      if (es.length > 1) es(1) else Literal(""), None))
    reg("arrayFlatten")(es => Flatten(es.head))
    // the OrZero division forms follow the documented intDiv deviation
    // (plain division, aliases.sql:35)
    reg("intDivOrZero")(es => CaseWhen(
      Seq((EqualTo(es(1), Literal(0)), Literal(0))),
      Some(new Divide(es(0), es(1)))))
    reg("moduloOrZero")(es => CaseWhen(
      Seq((EqualTo(es(1), Literal(0)), Literal(0))),
      Some(Remainder(es(0), es(1)))))
    reg("isIPv4String")(es => IsNotNull(ipv4StringToNum(es.head)))
    reg("leftPadUTF8")(es => StringLPad(es(0), es(1),
      if (es.length > 2) es(2) else Literal(" ")))
    reg("rightPadUTF8")(es => StringRPad(es(0), es(1),
      if (es.length > 2) es(2) else Literal(" ")))
    // DateTime64 epoch forms: CH's 64-bit sub-second epoch family
    reg("toUnixTimestamp64Milli")(es => UnixMillis(ts(es.head)))
    reg("toUnixTimestamp64Micro")(es => UnixMicros(ts(es.head)))
    reg("toUnixTimestamp64Nano")(es =>
      Multiply(UnixMicros(ts(es.head)), Literal(1000L)))
    reg("fromUnixTimestamp64Milli")(es =>
      MillisToTimestamp(Cast(es.head, LongType)))
    reg("fromUnixTimestamp64Micro")(es =>
      MicrosToTimestamp(Cast(es.head, LongType)))
    reg("fromUnixTimestamp64Nano")(es => MicrosToTimestamp(
      new IntegralDivide(Cast(es.head, LongType), Literal(1000L))))
    // ---- r12 tier (VERDICT r10 #6 / r11 #5): the next-used chsql
    //      names. Semantics follow ClickHouse docs like the rest of
    //      this section (toDayOfWeek/toStartOfWeek precedent). ----
    // formatDateTime(Time, Format): CH's specifiers are C-strftime
    // compatible in modern CH (%M = minute), plus MySQL-style %i =
    // minute — preprocess %i and reuse the shared strftime translation
    reg("formatDateTime") { es =>
      if (es.length != 2) throw new IllegalArgumentException(
        s"formatDateTime(ts, fmt): expected 2 arguments, got ${es.length}" +
          (if (es.length == 3) " (timezone argument not supported)" else ""))
      val fmt = literalString("formatDateTime(ts, fmt)", es(1))
        .replaceAll("(?<!%)%i", "%M") // %%i is a literal, not the specifier
      new DateFormatClass(ts(es.head), Literal(cFormatToJava(fmt)))
    }
    // toStartOfInterval(t, INTERVAL n unit): floor to the n-unit grid
    // anchored at the epoch (CH's anchor for months and for day-time
    // units alike). Day-time intervals floor epoch-micros; year-month
    // intervals floor months-since-1970-01 and return a DATE (CH
    // returns Date for month-granularity). `x - pmod(x, n)` is floor
    // division even for pre-1970 instants.
    reg("toStartOfInterval") { es =>
      if (es.length != 2) throw new IllegalArgumentException(
        s"toStartOfInterval(t, INTERVAL): expected 2 arguments, got ${es.length}")
      val iv = es(1)
      if (!iv.foldable) throw new IllegalArgumentException(
        "toStartOfInterval: the interval must be a literal")
      iv.dataType match {
        case _: DayTimeIntervalType =>
          val micros = iv.eval() match {
            case l: java.lang.Long => l.longValue()
            case other => throw new IllegalArgumentException(
              s"toStartOfInterval: unsupported interval value $other")
          }
          if (micros <= 0) throw new IllegalArgumentException(
            "toStartOfInterval: the interval must be positive")
          val us = UnixMicros(ts(es.head))
          MicrosToTimestamp(Subtract(us, Pmod(us, Literal(micros))))
        case _: YearMonthIntervalType =>
          val months = iv.eval() match {
            case i: java.lang.Integer => i.intValue()
            case other => throw new IllegalArgumentException(
              s"toStartOfInterval: unsupported interval value $other")
          }
          if (months <= 0) throw new IllegalArgumentException(
            "toStartOfInterval: the interval must be positive")
          val d = dt(es.head)
          val monthsSinceEpoch = Add(
            Multiply(Subtract(Year(d), Literal(1970)), Literal(12)),
            Subtract(Month(d), Literal(1)))
          AddMonths(Literal.create(0, DateType), // 1970-01-01
            Subtract(monthsSinceEpoch, Pmod(monthsSinceEpoch, Literal(months))))
        case other => throw new IllegalArgumentException(
          s"toStartOfInterval: INTERVAL literal expected, got ${other.simpleString}")
      }
    }
    // toWeek(d[, mode]): CH default mode 0 = MySQL WEEK() mode 0 —
    // weeks start Sunday, week 1 is the first week containing a Sunday
    // of this year, earlier days are week 0. Computed from the year's
    // first-Sunday offset; mode 3 (ISO) maps to Spark's weekofyear.
    // Other CH modes stay unmapped (loud error, not a silent guess).
    reg("toWeek") { es =>
      if (es.isEmpty || es.length > 2) throw new IllegalArgumentException(
        s"toWeek(date[, mode]): expected 1-2 arguments, got ${es.length}")
      val mode = if (es.length > 1)
        literalIntArg("toWeek(date, mode)", es, 2, 1) else 0
      val d = dt(es.head)
      mode match {
        case 0 =>
          val jan1 = MakeDate(Year(d), Literal(1), Literal(1))
          // days from Jan 1 to the year's first Sunday (Spark DayOfWeek:
          // 1=Sunday..7=Saturday)
          val toFirstSunday = Pmod(Subtract(Literal(8), DayOfWeek(jan1)), Literal(7))
          Cast(new IntegralDivide(
            Subtract(Add(DayOfYear(d), Literal(6)), toFirstSunday),
            Literal(7)), IntegerType)
        case 3 => WeekOfYear(d)
        case other => throw new IllegalArgumentException(
          s"toWeek: mode $other not supported (0 = CH default, 3 = ISO)")
      }
    }
    reg("toISOWeek")(es => WeekOfYear(dt(es.head)))
    // CH toMonday: round DOWN to the nearest Monday, returns Date —
    // Spark's trunc(date, 'week') is exactly Monday-anchored
    reg("toMonday")(es => TruncDate(dt(es.head), Literal("week")))
  }

  /** Dotted-quad → UInt32, malformed → NULL deterministically (shared
    * by IPv4StringToNum and isIPv4String). Validated: the old unguarded
    * form returned silently-wrong values for out-of-range octets
    * ('300.1.2.3' → a >2^32 number that round-trips through
    * IPv4NumToString as '44.1.2.3') and its failure mode for missing
    * octets flipped with the ANSI setting. Octet checks nest INSIDE
    * the shape guard so ElementAt(4) never evaluates unless four
    * octets exist. */
  private[functions] def ipv4StringToNum(e: Expression): Expression = {
    val str = Cast(e, StringType)
    val parts = StringSplit(str, Literal("\\."), Literal(-1))
    def oc(i: Int) = Cast(ElementAt(parts, Literal(i)), LongType)
    val shapeOk = new RLike(str, Literal("^\\d{1,3}(\\.\\d{1,3}){3}$"))
    val octetsOk = (1 to 4).map(i => LessThanOrEqual(oc(i), Literal(255L)))
      .reduce[Expression](And(_, _))
    val value = Add(Add(Add(Multiply(oc(1), Literal(16777216L)),
      Multiply(oc(2), Literal(65536L))), Multiply(oc(3), Literal(256L))), oc(4))
    val nul = Literal.create(null, LongType)
    CaseWhen(Seq((shapeOk, CaseWhen(Seq((octetsOk, value)), Some(nul)))), Some(nul))
  }

  /** DuckDB-compat function names (VERDICT r7 #2, the alias-map half of
    * the dialect shim): a reference user's DuckDB SQL calls these
    * through /query. Every one is a thin builder over existing Catalyst
    * expressions — codegen'd, no UDF boundary, registered on every
    * session (imperative + extensions path) like the CH macros above. */
  private def duckCompat(reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    reg("len")(es => DuckLen(es.head))
    reg("list_contains")(es => ArrayContains(es(0), es(1)))
    reg("list_has")(es => ArrayContains(es(0), es(1)))
    reg("list_distinct")(es => ArrayDistinct(es.head))
    // DuckDB string_split splits on a PLAIN separator (regex form is
    // string_split_regex); Spark's split takes a regex, so quote it
    reg("string_split")(es => StringSplit(es(0),
      Literal(java.util.regex.Pattern.quote(
        literalString("string_split(s, sep)", es(1)))), Literal(-1)))
    reg("string_split_regex")(es => StringSplit(es(0), es(1), Literal(-1)))
    reg("regexp_matches")(es => new RLike(es(0), es(1)))
    reg("nfc_normalize")(es => NfcNormalize(es.head))
    reg("strftime")(es => new DateFormatClass(Cast(es(0), TimestampType),
      Literal(cFormatToJava(literalString("strftime(ts, fmt)", es(1))))))
    reg("strptime")(es => new ParseToTimestamp(es(0),
      Literal(cFormatToJava(literalString("strptime(s, fmt)", es(1))))))
    // epoch family: seconds/millis/micros since epoch as BIGINT
    // (epoch_ns is graft-native above, reference README.md:121)
    reg("epoch")(es => UnixSeconds(Cast(es.head, TimestampType)))
    reg("epoch_ms")(es => UnixMillis(Cast(es.head, TimestampType)))
    reg("epoch_us")(es => UnixMicros(Cast(es.head, TimestampType)))
    // ---- r12 tier (VERDICT r10 #5 / r11 #4): the everyday-DuckDB
    //      names that still answered 400. Semantics pinned against
    //      DuckDB itself (null ordering, default separators, inclusive
    //      series bounds); every one still a thin Catalyst builder. ----
    // arg_min/arg_max(arg, val): DuckDB's value-at-extremum — exactly
    // Spark's min_by/max_by (ties pick an arbitrary row in both)
    reg("arg_min")(es => MinBy(es(0), es(1)).toAggregateExpression())
    reg("arg_max")(es => MaxBy(es(0), es(1)).toAggregateExpression())
    // string_agg(s[, sep]) / group_concat: DuckDB's default separator is
    // ','. Group-internal order is arrival order — non-deterministic
    // distributed, in both engines (DuckDB documents string_agg order
    // as arbitrary without ORDER BY).
    def listAgg(es: Seq[Expression]): Expression =
      new aggregate.ListAgg(es(0),
        if (es.length > 1) es(1) else Literal(",")).toAggregateExpression()
    reg("string_agg")(listAgg)
    reg("group_concat")(listAgg)
    // list_sort: DuckDB default is ASC NULLS LAST = Spark array_sort's
    // default comparator; list_reverse_sort is DESC NULLS LAST =
    // sort_array(x, false). The optional DuckDB order/null-order string
    // arguments select among the four combos (DESC NULLS FIRST is the
    // reverse of ASC NULLS LAST).
    def listSort(usage: String, defaultDesc: Boolean)(es: Seq[Expression]): Expression = {
      val ord = if (es.length > 1)
        literalString(usage, es(1)).trim.toUpperCase(java.util.Locale.ROOT)
      else if (defaultDesc) "DESC" else "ASC"
      val desc = ord match {
        case "ASC" | "" => false
        case "DESC" => true
        case other => throw new IllegalArgumentException(
          s"$usage: sort order must be ASC or DESC, got '$other'")
      }
      val nullsFirst = if (es.length > 2)
        literalString(usage, es(2)).trim.toUpperCase(java.util.Locale.ROOT) match {
          case "NULLS FIRST" => true
          case "NULLS LAST" => false
          case other => throw new IllegalArgumentException(
            s"$usage: null order must be NULLS FIRST or NULLS LAST, got '$other'")
        }
      else false // DuckDB default_null_order: NULLS LAST
      (desc, nullsFirst) match {
        case (false, false) => new ArraySort(es.head) // ASC NULLS LAST
        case (false, true)  => new SortArray(es.head, Literal(true))
        case (true, false)  => new SortArray(es.head, Literal(false))
        case (true, true)   => Reverse(new ArraySort(es.head))
      }
    }
    reg("list_sort")(listSort("list_sort(arr[, order[, null_order]])",
      defaultDesc = false))
    reg("list_reverse_sort")(es => listSort(
      "list_reverse_sort(arr[, null_order])", defaultDesc = true)(
      // the optional argument of list_reverse_sort is the NULL order
      if (es.length > 1) Seq(es(0), Literal("DESC"), es(1)) else es))
    // generate_series(a, b[, step]) in SELECT position returns the
    // INCLUSIVE list — exactly Spark's sequence (DuckDB's exclusive
    // `range` stays unmapped: Spark resolves its own range TVF first).
    // FROM-position generate_series is rewritten by DuckDialect.
    reg("generate_series")(es =>
      if (es.length > 2) new Sequence(es(0), es(1), es(2))
      else new Sequence(es(0), es(1)))
    // unnest(list) in SELECT position: one row per element — Explode,
    // which the analyzer's generator extraction lifts out of the
    // projection. (Column is named `col` Spark-style unless aliased;
    // DuckDB names it `unnest`.) FROM-position unnest is rewritten by
    // DuckDialect; struct-flattening unnest(recursive:=true) stays
    // unmapped — different shape, loud analyzer error.
    reg("unnest")(es => Explode(es.head))
  }

  def registerAll(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      fr.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
