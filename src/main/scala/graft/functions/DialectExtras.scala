package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Second r12 dialect tier (continuing VERDICT r10 #5/#6): the
  * remaining chsql/ClickHouse and DuckDB names whose semantics map
  * cleanly onto existing Catalyst expressions — array lambdas (CH's
  * lambda-FIRST argument order), the URL-part family, list
  * constructors/aggregates, the multi-search pair, and the permissive
  * timestamp parser. Everything here is still a thin builder: native
  * Catalyst, codegen'd, no UDF boundary.
  *
  * The r13 tier adds the CH hash family ([[ChHashes.scala]]:
  * cityHash64/sipHash64/halfMD5/intHash32/intHash64/URLHash as
  * bit-exact implementations of the published layouts — the r12 gap
  * reason argued against REMAPPING Spark's hashes, not against
  * implementing ClickHouse's) and the IPv6 conversions
  * ([[Ipv6Exprs.scala]]: the parse/format kernel lives in a codegen
  * expression, so no UDF boundary after all).
  *
  * Deliberately NOT mapped (stay on the DuckDialect gap list):
  *  - farmHash64/farmFingerprint64 (a full FarmHash port is out of
  *    proportion to usage; the CityHash/SipHash family above covers
  *    the sampling idioms) and sipHash128 (128-bit return needs a
  *    FixedString(16) convention nothing downstream consumes yet);
  *  - window-positional scalars (neighbor, runningDifference): CH
  *    evaluates them against block order, which has no well-defined
  *    distributed meaning — Spark's window functions are the honest
  *    spelling;
  *  - age (CH's calendar-complete-units rules differ from
  *    timestampdiff on edge dates), generate_subscripts with dim != 1
  *    (multi-dimensional; the dim = 1 form rewrites in FROM position).
  *    (ngramDistance/ngramSearch left this list in r13 —
  *    [[ChNgram]] implements the published 4-gram definition — and
  *    JSONExtractRaw/JSONExtractArrayRaw/JSONType in r14:
  *    [[ChJsonRaw]] is a span-preserving scanner, so the raw-fidelity
  *    objection to a get_json_object remap no longer applies.)
  */
object DialectExtras {
  import GraftFunctions.tryParseUrl

  /** Codegen kernel for [[RoundToExp2]]'s scale-0 decimal (UInt64
    * convention) path; `p` is the input type's precision, which the
    * result (always <= the input) also fits. */
  def roundDecExp2(x: Decimal, p: Int): Decimal = {
    val bi = x.toJavaBigDecimal.toBigInteger
    if (bi.signum < 1) Decimal(0L, p, 0)
    else Decimal(new java.math.BigDecimal(
      java.math.BigInteger.ZERO.setBit(bi.bitLength - 1)), p, 0)
  }

  private def ts(e: Expression) = Cast(e, TimestampType)
  private def dt(e: Expression) = Cast(e, DateType)

  /** Fresh-named unresolved lambdas for building HOF expressions
    * programmatically (the Column-API pattern); fresh names so nested
    * HOFs never capture each other's variables. */
  private val lamSeq = new java.util.concurrent.atomic.AtomicLong()
  private def lam(f: Expression => Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq(s"__gx${lamSeq.incrementAndGet()}"))
    LambdaFunction(f(x), Seq(x))
  }
  private def lam2(f: (Expression, Expression) => Expression): Expression = {
    val n = lamSeq.incrementAndGet()
    val x = UnresolvedNamedLambdaVariable(Seq(s"__gx$n"))
    val i = UnresolvedNamedLambdaVariable(Seq(s"__gi$n"))
    LambdaFunction(f(x, i), Seq(x, i))
  }
  private def nonNulls(arr: Expression): Expression =
    ArrayFilter(arr, lam(IsNotNull))

  /** Epoch-anchored n-micros grid (shared by the toStartOf* shortcuts;
    * `x - pmod(x, n)` is floor division even pre-1970). */
  private def microGrid(t: Expression, micros: Long): Expression = {
    val us = UnixMicros(ts(t))
    MicrosToTimestamp(Subtract(us, Pmod(us, Literal(micros))))
  }

  /** Numeric list aggregate over nulls-skipped elements (DuckDB probed:
    * sum([1,NULL,2])=3, avg=1.5; empty/all-null → NULL). The
    * accumulator zero must carry the (unknown at registration) element
    * type, and a lambda can't live inside a RuntimeReplaceable
    * replacement (the lambda-binding rule never descends there), so the
    * zero is derived FROM the data: `array_min(nn) - array_min(nn)` is
    * a typed 0 that is NULL exactly when the null-skipped array is
    * empty — which nulls the whole aggregate, DuckDB's answer for that
    * case. (Deviation: sum of an int array stays int here where DuckDB
    * widens to HUGEINT — arrays are row-local, overflow fails loudly
    * under ANSI rather than silently wrapping.) */
  private def listNumAgg(arr0: Expression, fn: String): Expression = {
    val nn = nonNulls(arr0)
    val zero = Subtract(ArrayMin(nn), ArrayMin(nn))
    val sum = ArrayAggregate(nn, zero, lam2((acc, x) => Add(acc, x)), lam(identity))
    fn match {
      case "sum" => sum
      case "avg" => new Divide(Cast(sum, DoubleType), Cast(Size(nn), DoubleType))
    }
  }

  def register(reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    duckLists(reg)
    chArrays(reg)
    chDates(reg)
    chStringsJson(reg)
    chUrls(reg)
    chHashesIpv6(reg)
    chArithDateFormat(reg)
    chStringsArrays2(reg)
  }

  // ---- CH string/array/null second pass (r13 sweep, continued):
  //      replace family, UTF8-named spellings, null-handling
  //      identities, and the subset/count array predicates with
  //      CH-exact null semantics. ifNull/nullIf are ABSENT on purpose:
  //      Spark's same-named builtins already carry identical
  //      semantics. reverse stays unmapped (CH's is BYTE-level on
  //      strings where Spark's builtin is codepoint-level — divergent
  //      same-named builtin); reverseUTF8 maps to Spark's codepoint
  //      reverse exactly. replaceRegexpOne stays out: Catalyst has no
  //      first-match-only regexp replace kernel. ----
  private def chStringsArrays2(
      reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    // replaceOne: first occurrence of a LITERAL needle; empty needle →
    // original string. One With-bound locate, no recompute.
    reg("replaceOne") { es =>
      With(es(0)) { refs =>
        val str = refs.head
        val i = new StringLocate(es(1), str)
        CaseWhen(Seq((And(GreaterThan(i, Literal(0)),
          GreaterThan(Length(es(1)), Literal(0))),
          Concat(Seq(
            Substring(str, Literal(1), Subtract(i, Literal(1))),
            es(2),
            Substring(str, Add(i, Length(es(1))), Literal(Int.MaxValue)))))),
          Some(str))
      }
    }
    reg("replaceAll")(es => StringReplace(es(0), es(1), es(2)))
    // CH backreferences are \N; Spark's are $N — translate inside the
    // (required-literal) replacement, escaping any literal '$'
    reg("replaceRegexpAll")(es =>
      RegExpReplace(es(0), es(1), chRegexReplacement(es(2))))
    reg("reverseUTF8")(es => Reverse(es.head))
    reg("concatWithSeparator")(es => ConcatWs(es))
    // identities: the engine's values are nullable Spark columns either
    // way; CH's type-system distinction has no runtime content here
    reg("assumeNotNull")(es => es.head)
    reg("toNullable")(es => es.head)
    // countEqual/hasAll/hasAny with CH null semantics: NULL elements
    // compare with <=> (hasAll([1,NULL],[NULL]) = true)
    reg("countEqual")(es =>
      Size(ArrayFilter(es(0), lam(e => EqualNullSafe(e, es(1))))))
    reg("hasAll")(es => ArrayForAll(es(1),
      lam(x => ArrayExists(es(0), lam(y => EqualNullSafe(y, x))))))
    reg("hasAny")(es => ArrayExists(es(1),
      lam(x => ArrayExists(es(0), lam(y => EqualNullSafe(y, x))))))
    reg("arrayIntersect")(es =>
      es.reduceLeft((a, b) => ArrayIntersect(a, b)))
    // toFixedString: NUL-pad to exactly n; ClickHouse THROWS when the
    // string is longer — rpad's silent truncation would corrupt data
    reg("toFixedString") { es =>
      With(Cast(es(0), StringType)) { refs =>
        val s = refs.head
        CaseWhen(Seq((GreaterThan(Length(s), es(1)),
          Cast(RaiseError(Concat(Seq(
            Literal("toFixedString: value longer than "),
            Cast(es(1), StringType)))), StringType))),
          Some(StringRPad(s, es(1), Literal("\u0000"))))
      }
    }
    reg("leftUTF8")(es => Left(es(0), es(1)))
    reg("rightUTF8")(es => Right(es(0), es(1)))
    reg("toRelativeMinuteNum") { es =>
      val sec = UnixSeconds(ts(es.head))
      new IntegralDivide(Subtract(sec, Pmod(sec, Literal(60L))), Literal(60L))
    }
    reg("toRelativeSecondNum")(es => UnixSeconds(ts(es.head)))
  }

  /** CH `\N` backreference syntax → Java/Spark `$N`, for the (required
    * literal) replacement argument of replaceRegexpAll; a literal `$`
    * is escaped so it stays literal under Java's replacement rules. */
  private def chRegexReplacement(e: Expression): Expression = {
    val t = GraftFunctions.literalString(
      "replaceRegexpAll(s, pattern, replacement)", e)
    val sb = new StringBuilder
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '$') { sb.append("\\$"); i += 1 }
      else if (c == '\\' && i + 1 < t.length && t.charAt(i + 1).isDigit) {
        sb.append('$').append(t.charAt(i + 1)); i += 2
      } else if (c == '\\' && i + 1 < t.length && t.charAt(i + 1) == '\\') {
        sb.append("\\\\"); i += 2
      } else if (c == '\\') {
        // lone backslash (before a non-digit/non-backslash char, or
        // trailing): CH keeps it literal; unescaped it would be DROPPED
        // ('\x' → 'x') — or throw when trailing — under Java's
        // replacement rules (ADVICE r13)
        sb.append("\\\\"); i += 1
      } else { sb.append(c); i += 1 }
    }
    Literal(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
  }

  // ---- CH arithmetic / date-shift / readable-format tier (r13 second
  //      pass — a name-frequency sweep found these still answering 400
  //      despite clean Catalyst spellings; every one a thin builder).
  //      Deliberately NOT mapped, with reasons: erf (no JDK kernel; an
  //      approximation would silently differ from std::erf). dateAdd/
  //      dateSub left the list in r14 via DuckDialect's pre-parse
  //      token rewrite (the bare unit keyword is a PARSER problem, not
  //      an expression one); bar/roundToExp2/intExp10 in r14 below —
  //      the "needs a lookup kernel" objection dissolved once the
  //      UInt64 convention carried exact Decimal(20,0) literals. ----
  private def chArithDateFormat(
      reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    // CH `divide` is ALWAYS floating-point (intDiv is the integer one);
    // plus/minus/multiply/modulo were mapped back in the first tier and
    // this closes the family's odd one out
    reg("divide")(es =>
      new Divide(Cast(es(0), DoubleType), Cast(es(1), DoubleType)))
    // r15 late: correctly-rounded erf kernel (ChErf.scala) — closes
    // the "no JDK kernel / silent-last-ulp" hold by being exact
    reg("erf")(es => ErfExpr(Cast(es.head, DoubleType)))
    reg("bitNot")(es => BitwiseNot(es.head))
    reg("bitShiftLeft")(es => ChBitShift(es(0), Cast(es(1), IntegerType), "left"))
    reg("bitShiftRight")(es => ChBitShift(es(0), Cast(es(1), IntegerType), "right"))
    // bitTest(a, i) = bit i (LSB-first) as 0/1
    reg("bitTest")(es => ChBitShift(es(0), Cast(es(1), IntegerType), "test"))
    reg("trimBoth")(es =>
      if (es.length > 1) StringTrim(es(0), es(1)) else StringTrim(es(0)))
    reg("trimLeft")(es =>
      if (es.length > 1) StringTrimLeft(es(0), es(1)) else StringTrimLeft(es(0)))
    reg("trimRight")(es =>
      if (es.length > 1) StringTrimRight(es(0), es(1)) else StringTrimRight(es(0)))
    // addYears(d, n) … subtractSeconds(d, n): CH shifts the value by n
    // calendar units. Documented deviation shared with the rest of the
    // date tier: the result is TimestampType regardless of whether the
    // input was a date (the engine's time model is epoch-ns int64, so
    // "preserves Date-ness" has no meaning on this surface).
    Seq("Years" -> "YEAR", "Quarters" -> "QUARTER", "Months" -> "MONTH",
      "Weeks" -> "WEEK", "Days" -> "DAY", "Hours" -> "HOUR",
      "Minutes" -> "MINUTE", "Seconds" -> "SECOND").foreach { case (sfx, unit) =>
      reg("add" + sfx)(es => TimestampAdd(unit, es(1), ts(es.head)))
      reg("subtract" + sfx)(es =>
        TimestampAdd(unit, UnaryMinus(es(1)), ts(es.head)))
    }
    // toTime: the time-of-day on ClickHouse's fixed 1970-01-02 carrier
    // date (second precision, like CH DateTime)
    reg("toTime")(es => SecondsToTimestamp(Add(Literal(86400L),
      Pmod(UnixSeconds(ts(es.head)), Literal(86400L)))))
    reg("exp2")(es => Pow(Literal(2d), Cast(es.head, DoubleType)))
    reg("exp10")(es => Pow(Literal(10d), Cast(es.head, DoubleType)))
    // intExp2: exact UInt64 2^x for x in 0..63 (the UnsignedDecimal
    // wrap keeps 2^63 positive, same convention as the hash family)
    reg("intExp2")(es =>
      UnsignedDecimal(ShiftLeft(Literal(1L), Cast(es.head, IntegerType))))
    reg("formatReadableSize")(es =>
      FormatReadable(Cast(es.head, DoubleType), quantity = false))
    reg("formatReadableQuantity")(es =>
      FormatReadable(Cast(es.head, DoubleType), quantity = true))
    // intExp10 (r14): exact UInt64 10^x with CH's intExp.h clamps —
    // x < 0 → 0, x > 19 → UInt64 max. A 20-arm CaseWhen of Decimal
    // literals (10^19 < 2^64, so every arm is exact); pure Catalyst.
    reg("intExp10") { es =>
      def ud(v: BigInt) = Literal.create(
        Decimal(scala.math.BigDecimal(v), 20, 0), DecimalType(20, 0))
      With(Cast(es.head, IntegerType)) { refs =>
        val x = refs.head
        // NULL propagates (review r14: every null condition arm below
        // evaluates to null=false, so without this a NULL argument fell
        // through to the else-clamp and answered UInt64 max)
        val arms = (IsNull(x), Literal.create(null, DecimalType(20, 0))) +:
          (LessThan(x, Literal(0)), ud(BigInt(0))) +:
          (0 to 19).map(k => (EqualTo(x, Literal(k)), ud(BigInt(10).pow(k))))
        CaseWhen(arms, Some(ud((BigInt(1) << 64) - 1)))
      }
    }
    // roundToExp2 (r14): round DOWN to the nearest power of two; < 1
    // → 0 (CH FunctionsRound). Exact across the full unsigned-64 range
    // via the bit kernel in [[RoundToExp2]] — the old gap reason
    // ("needs a lookup kernel past 2^53") only held for a float
    // spelling; highestOneBit IS the kernel.
    reg("roundToExp2")(es => RoundToExp2(es.head))
    // bar (r14): ClickHouse's terminal bar rendering — full blocks
    // (U+2588) plus ONE left-eighth partial (U+2589..258F), band =
    // floor(frac*8), per the published UnicodeBar helper. Pure
    // Catalyst: clamp + repeat + element_at over the 7 partials.
    reg("bar") { es =>
      val x = Cast(es(0), DoubleType)
      val mn = Cast(es(1), DoubleType)
      val mx = Cast(es(2), DoubleType)
      val width = if (es.length > 3) Cast(es(3), DoubleType)
                  else Literal(80.0)
      // DuckDB's bar kernel divides IEEE-style (x/0 → ±Inf, 0/0 → NaN;
      // probed live: bar(5,0,0,10) full via +Inf, bar(0,0,0,10) empty
      // via NaN, bar(NaN,...) empty) — Spark has no IEEE division (ANSI
      // Divide THREW on min==max, LEGACY answers NULL), so the edges
      // are explicit arms. NaN checks come FIRST because Spark orders
      // NaN greatest in comparisons (review r14).
      val num = Subtract(x, mn)
      val den = Subtract(mx, mn)
      // NULL arm FIRST (ADVICE r14): IsNaN(NULL) is false, so a NULL x
      // with min==max fell through to the den==0 arms and answered ''
      // where DuckDB's bar is null-propagating (bar(NULL,0,0,10) IS
      // NULL). A null w flows through Floor/StringRepeat/Concat as
      // null, so the rendered string is NULL exactly when any input is.
      val w = CaseWhen(Seq(
        (Or(IsNull(num), Or(IsNull(den), IsNull(width))),
          Literal(null, DoubleType)),
        (Or(IsNaN(num), IsNaN(den)), Literal(0.0)),
        (And(EqualTo(den, Literal(0.0)), GreaterThan(num, Literal(0.0))), width),
        (EqualTo(den, Literal(0.0)), Literal(0.0))),
        Some(Least(Seq(Greatest(Seq(
          Multiply(Divide(num, den, EvalMode.LEGACY), width),
          Literal(0.0))), width))))
      With(w) { refs =>
        val ww = refs.head
        val full = Cast(Floor(ww), IntegerType)
        val rem = Cast(Floor(Multiply(
          Subtract(ww, Cast(Floor(ww), DoubleType)), Literal(8.0))),
          IntegerType)
        val partials = CreateArray((1 to 7).map(k =>
          Literal(String.valueOf((0x2590 - k).toChar))))
        Concat(Seq(
          StringRepeat(Literal("█"), full),
          CaseWhen(Seq((GreaterThan(rem, Literal(0)),
            ElementAt(partials, rem))), Some(Literal("")))))
      }
    }
  }

  // ---- CH hash family (bit-exact kernels in ChHashes.scala) + IPv6 ----
  private def chHashesIpv6(reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    reg("cityHash64")(ChHashBuilders.cityHash64)
    reg("sipHash64")(ChHashBuilders.sipHash64)
    // r15: the 128-bit pair, closing the last hash hold — CH's own
    // get128 fold and the paper's outlen=16 variant, as lowercase hex
    // (convention documented at the builder)
    reg("sipHash128")(ChHashBuilders.sipHash128)
    reg("sipHash128Reference")(ChHashBuilders.sipHash128Reference)
    reg("halfMD5")(ChHashBuilders.halfMD5)
    // r15 late: the portable farm-family member (Fingerprint64 is
    // documented never-changing; Guava-golden-pinned). farmHash64
    // stays on the 400 list — its reference value DISPATCHES per CPU.
    reg("farmFingerprint64")(ChHashBuilders.farmFingerprint64)
    reg("intHash32")(es => ChHashBuilders.intHash32(es.head))
    reg("intHash64")(es => ChHashBuilders.intHash64(es.head))
    reg("URLHash")(es => ChHashBuilders.urlHash(es.head))
    reg("IPv6StringToNum")(es => Ipv6StringToNum(es.head, "IPv6StringToNum"))
    reg("toIPv6")(es => Ipv6StringToNum(es.head, "toIPv6"))
    reg("toIPv6OrNull")(es => Ipv6StringToNumOrNull(es.head))
    reg("IPv6NumToString")(es => Ipv6NumToString(es.head))
    reg("isIPv6String")(es => IsIpv6String(es.head))
    // CH 4-gram similarity (byte-level base variants + ASCII-CI forms)
    reg("ngramDistance")(es => ChNgramExpr(es(0), es(1), "distance"))
    reg("ngramDistanceCaseInsensitive")(es => ChNgramExpr(es(0), es(1), "distanceCI"))
    reg("ngramSearch")(es => ChNgramExpr(es(0), es(1), "search"))
    reg("ngramSearchCaseInsensitive")(es => ChNgramExpr(es(0), es(1), "searchCI"))
  }

  // ---- DuckDB list constructors / aggregates ----
  private def duckLists(reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    reg("list_value")(es => CreateArray(es))
    reg("list_pack")(es => CreateArray(es))
    // probed: list_unique counts distinct NON-NULL elements
    reg("list_unique")(es =>
      Cast(Size(ArrayDistinct(nonNulls(es.head))), LongType))
    def listAggregate(es: Seq[Expression]): Expression = {
      if (es.length < 2) throw new IllegalArgumentException(
        s"list_aggregate(list, name[, ...]): expected >= 2 arguments, got ${es.length}")
      GraftFunctions.literalString("list_aggregate(list, name)", es(1))
        .toLowerCase(java.util.Locale.ROOT) match {
        case "min" => ArrayMin(es.head)
        case "max" => ArrayMax(es.head)
        case "count" => Cast(Size(nonNulls(es.head)), LongType)
        case "sum" => listNumAgg(es.head, "sum")
        case "avg" | "mean" => listNumAgg(es.head, "avg")
        case "string_agg" | "group_concat" => ArrayJoin(nonNulls(es.head),
          if (es.length > 2) es(2) else Literal(","), None)
        case other => throw new IllegalArgumentException(
          s"list_aggregate: unsupported aggregate '$other' " +
            "(min, max, count, sum, avg, string_agg)")
      }
    }
    reg("list_aggregate")(listAggregate)
    reg("list_aggr")(listAggregate)
  }

  // ---- CH array functions (lambda-FIRST argument order) ----
  private def chArrays(reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    // truthiness for the lambda-less forms: non-zero / non-null, which
    // is exactly a boolean cast guarded by IsNotNull
    def truthy(x: Expression): Expression =
      And(IsNotNull(x), Cast(x, BooleanType))
    reg("arrayMap")(es => ArrayTransform(es(1), es(0)))
    reg("arrayFilter")(es => ArrayFilter(es(1), es(0)))
    reg("arrayExists")(es =>
      if (es.length == 1) ArrayExists(es.head, lam(truthy))
      else ArrayExists(es(1), es(0)))
    reg("arrayAll")(es =>
      if (es.length == 1) ArrayForAll(es.head, lam(truthy))
      else ArrayForAll(es(1), es(0)))
    // NB a call whose ORIGINAL argument list contains a lambda must
    // resolve to a HigherOrderFunction ROOT (the analyzer checks the
    // builder's return), so the lambda form counts via aggregate, not
    // size-of-filter
    reg("arrayCount")(es =>
      if (es.length == 1) Size(ArrayFilter(es.head, lam(truthy)))
      else ArrayAggregate(ArrayFilter(es(1), es(0)), Literal(0),
        lam2((acc, _) => Add(acc, Literal(1))), lam(identity)))
    // CH arrayJoin unfolds the array into rows — Spark's explode, which
    // the analyzer's generator extraction lifts out of the projection
    reg("arrayJoin")(es => Explode(es.head))
    reg("arrayEnumerate")(es =>
      ArrayTransform(es.head, lam2((_, i) => Add(i, Literal(1)))))
    // arrayDifference: [0, a2-a1, …]; x - x types the leading zero
    // without knowing the element type (null propagates like CH)
    reg("arrayDifference") { es =>
      val arr = es.head
      ArrayTransform(arr, lam2((x, i) => CaseWhen(
        Seq((EqualTo(i, Literal(0)), Subtract(x, x))),
        Some(Subtract(x, ElementAt(arr, i)))))) // element_at is 1-based:
      // index i (0-based) IS the previous element's 1-based position
    }
    // arrayCompact: drop CONSECUTIVE duplicates (CaseWhen keeps the
    // element_at lazy so index 0 never probes element_at(arr, 0))
    reg("arrayCompact") { es =>
      val arr = es.head
      ArrayFilter(arr, lam2((x, i) => CaseWhen(
        Seq((EqualTo(i, Literal(0)), Literal(true))),
        Some(Not(EqualNullSafe(x, ElementAt(arr, i)))))))
    }
    reg("arrayZip")(es => ArraysZip(es))
    // arrayCumSum: prefix sums via per-index aggregate over the prefix
    // slice — O(n²) in the array length, which is row-local and small
    // by construction (CH's own arrays are block values); the typed
    // zero is the listNumAgg trick. A null element poisons the suffix
    // (null + x = null), the natural propagation.
    reg("arrayCumSum") { es =>
      val arr = es.head
      val zero = Subtract(ArrayMin(arr), ArrayMin(arr))
      ArrayTransform(arr, lam2((_, i) =>
        ArrayAggregate(Slice(arr, Literal(1), Add(i, Literal(1))), zero,
          lam2((acc, x) => Add(acc, x)), lam(identity))))
    }
    // multiSearchAny / multiSearchFirstPosition: substring tests over a
    // needle array; CH's first-position is the smallest match offset
    reg("multiSearchAny")(es =>
      ArrayExists(es(1), lam(n => Contains(es(0), n))))
    reg("multiSearchFirstPosition")(es => Coalesce(Seq(
      ArrayMin(ArrayFilter(
        ArrayTransform(es(1), lam(n => new StringLocate(n, es(0)))),
        lam(p => GreaterThan(p, Literal(0))))),
      Literal(0))))
    reg("uniqCombined")(es =>
      HyperLogLogPlusPlus(es.head).toAggregateExpression())
    // CH quantiles(l1, …)(x) → quantiles(l1, …, x), the parametric
    // convention quantile/top_k already use; sketch estimator like
    // `quantile` (the 100 TB path)
    reg("quantiles") { es =>
      if (es.length < 2) throw new IllegalArgumentException(
        s"quantiles(level, ..., x): expected >= 2 arguments, got ${es.length}")
      new ApproximatePercentile(es.last, CreateArray(es.dropRight(1)))
        .toAggregateExpression()
    }
  }

  // ---- CH date/time shortcuts ----
  private def chDates(reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    reg("toStartOfFiveMinutes")(es => microGrid(es.head, 5L * 60 * 1000000))
    reg("toStartOfTenMinutes")(es => microGrid(es.head, 10L * 60 * 1000000))
    reg("toStartOfFifteenMinutes")(es => microGrid(es.head, 15L * 60 * 1000000))
    reg("timeSlot")(es => microGrid(es.head, 30L * 60 * 1000000)) // CH: 30-min slot
    reg("toStartOfSecond")(es => TruncTimestamp(Literal("second"), ts(es.head)))
    // ISO year = the year of the ISO week = the year of that week's
    // Thursday (trunc 'week' is Monday-anchored; +3 days = Thursday)
    reg("toISOYear")(es =>
      Year(DateAdd(TruncDate(dt(es.head), Literal("week")), Literal(3))))
    // days/hours since the epoch (CH relative-number family)
    reg("toRelativeDayNum")(es =>
      DateDiff(dt(es.head), Literal.create(0, DateType)))
    reg("toRelativeHourNum") { es =>
      val sec = UnixSeconds(ts(es.head))
      new IntegralDivide(Subtract(sec, Pmod(sec, Literal(3600L))), Literal(3600L))
    }
    // permissive parser (CH's documented primary forms): ISO 8601 /
    // date-only via the cast, YYYYMMDD[hhmmss], DD/MM/YYYY, and bare
    // 9-10-digit strings as unix seconds. Documented deviation: the
    // base form returns NULL on unparseable input where CH throws
    // (per-row throw semantics don't exist in a vectorized plan) —
    // identical to the OrNull form.
    def bestEffort(es: Seq[Expression]): Expression = {
      val s0 = Cast(es.head, StringType)
      With(s0) { refs =>
        val s = refs.head
        def tryFmt(fmt: String) = new ParseToTimestamp(
          s, Some(Literal(fmt)), TimestampType, None, false)
        Coalesce(Seq(
          CaseWhen(Seq((new RLike(s, Literal("^\\d{9,10}$")),
            SecondsToTimestamp(Cast(s, LongType)))), None),
          tryFmt("yyyyMMddHHmmss"),
          tryFmt("yyyyMMdd"),
          tryFmt("dd/MM/yyyy"),
          Cast(s, TimestampType, None, EvalMode.TRY)))
      }
    }
    reg("parseDateTimeBestEffort")(bestEffort)
    reg("parseDateTimeBestEffortOrNull")(bestEffort)
  }

  // ---- CH string/JSON extras ----
  private def chStringsJson(reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    reg("positionCaseInsensitive")(es =>
      new StringLocate(Lower(es(1)), Lower(es(0))))
    // extractAll: CH extracts the first capture group when the pattern
    // has one, else the whole match — decidable only for a literal
    // pattern (the overwhelmingly common call shape)
    reg("extractAll") { es =>
      val p = GraftFunctions.literalString("extractAll(s, pattern)", es(1))
      val idx = if (java.util.regex.Pattern.compile(p)
        .matcher("").groupCount() >= 1) 1 else 0
      RegExpExtractAll(es(0), Literal(p), Literal(idx))
    }
    // extractGroups: the FIRST match's capture groups as an array —
    // group count decided from the literal pattern (like extractAll);
    // no match → empty array (CH), which the RLike guard provides
    // where regexp_extract alone would yield ['','',…]
    reg("extractGroups") { es =>
      val p = GraftFunctions.literalString("extractGroups(s, pattern)", es(1))
      val n = java.util.regex.Pattern.compile(p).matcher("").groupCount()
      if (n < 1) throw new IllegalArgumentException(
        "extractGroups: the pattern must contain at least one capture group")
      CaseWhen(
        Seq((IsNull(es(0)), Literal.create(null, ArrayType(StringType))),
          (new RLike(es(0), Literal(p)),
            CreateArray((1 to n).map(i =>
              RegExpExtract(es(0), Literal(p), Literal(i)))))),
        Some(Literal.create(Array.empty[String], ArrayType(StringType))))
    }
    // visitParam*/simpleJSON* are CH's fast-path simple-key JSON
    // getters — same answers as JSONExtractString for simple keys
    def jget(es: Seq[Expression]): Expression =
      GetJsonObject(es(0), Concat(Seq(Literal("$."), Cast(es(1), StringType))))
    reg("visitParamExtractString")(jget)
    reg("simpleJSONExtractString")(jget)
    // JSONLength: elements of an array or keys of an object
    reg("JSONLength")(es => Coalesce(Seq(
      LengthOfJsonArray(es.head), Size(JsonObjectKeys(es.head)))))
    // the raw-preserving trio (r14, VERDICT r13 #4): a span-preserving
    // scanner in ChJsonRaw.scala — get_json_object would unquote
    // strings and re-serialize containers, losing the byte-fidelity
    // that is the whole point of the Raw forms. Multi-step paths fold
    // binary steps over the validated root slice; a string step is a
    // key, an integral step a 1-based (negative-from-end) position.
    def jsonPath(es: Seq[Expression]): Expression =
      es.tail.foldLeft(JsonRawRoot(es.head): Expression)(JsonRawStep(_, _))
    reg("JSONExtractRaw")(jsonPath)
    reg("JSONExtractArrayRaw")(es => JsonRawArray(jsonPath(es)))
    reg("JSONType")(es => JsonRawType(jsonPath(es)))
  }

  // ---- CH URL family (ParseUrl + regex; null propagates on non-URLs
  //      like the already-mapped protocol/domain/path tier) ----
  private def chUrls(reg: String => (Seq[Expression] => Expression) => Unit): Unit = {
    reg("netloc")(es => tryParseUrl(es.head, Literal("AUTHORITY")))
    // strip one leading 'www.' from the domain, scheme optional (CH)
    reg("cutWWW")(es => RegExpReplace(
      es.head, Literal("^(([a-zA-Z][a-zA-Z0-9+.-]*://)?)www\\."), Literal("$1")))
    reg("cutQueryString")(es =>
      RegExpReplace(es.head, Literal("\\?[^#]*"), Literal("")))
    reg("cutFragment")(es =>
      RegExpReplace(es.head, Literal("#.*$"), Literal("")))
    reg("cutQueryStringAndFragment")(es =>
      RegExpReplace(es.head, Literal("[?#].*$"), Literal("")))
    // 'page=1#fragment' — everything after the first '?' (CH keeps the
    // '#' but not the '?')
    reg("queryStringAndFragment")(es =>
      nonEmptyOrNull(RegExpExtract(es.head, Literal("\\?(.*)$"), Literal(1))))
    // CH percent-codes spaces where Java's form-codec uses '+' — and a
    // literal '+' is DATA to CH's decoder, not a space. Bridge both
    // directions so the common cases agree: '+' is protected before
    // decoding and '%20' replaces '+' after encoding.
    reg("decodeURLComponent")(es => UrlDecode(
      RegExpReplace(es.head, Literal("\\+"), Literal("%2B"))))
    reg("encodeURLComponent")(es => RegExpReplace(
      UrlEncode(es.head), Literal("\\+"), Literal("%20")))
    // query parameters as 'k=v' strings / their names
    def params(e: Expression): Expression =
      StringSplit(tryParseUrl(e, Literal("QUERY")), Literal("&"), Literal(-1))
    reg("extractURLParameters")(es => params(es.head))
    reg("extractURLParameterNames")(es =>
      ArrayTransform(params(es.head),
        lam(p => RegExpExtract(p, Literal("^([^=]*)"), Literal(1)))))
    // firstSignificantSubdomain: the label left of the effective TLD,
    // where a {com, net, org, co} second-to-last label extends the TLD
    // (news.clickhouse.com.tr → clickhouse; news.clickhouse.com →
    // clickhouse) — CH's documented default-list behavior
    def sigParts(e: Expression): (Expression, Expression, Expression) = {
      val parts = StringSplit(tryParseUrl(e, Literal("HOST")),
        Literal("\\."), Literal(-1))
      val n = Size(parts)
      val secondLast = ElementAt(parts, Subtract(n, Literal(1)))
      val idx = CaseWhen(Seq((And(GreaterThanOrEqual(n, Literal(3)),
        In(secondLast, Seq("com", "net", "org", "co").map(Literal(_)))),
        Subtract(n, Literal(2)))), Some(Subtract(n, Literal(1))))
      (parts, n, idx)
    }
    reg("firstSignificantSubdomain") { es =>
      val (parts, n, idx) = sigParts(es.head)
      CaseWhen(Seq((GreaterThanOrEqual(n, Literal(2)), ElementAt(parts, idx))),
        Some(Literal.create(null, StringType)))
    }
    reg("cutToFirstSignificantSubdomain") { es =>
      val (parts, n, idx) = sigParts(es.head)
      CaseWhen(Seq((GreaterThanOrEqual(n, Literal(2)), ArrayJoin(
        Slice(parts, idx, Add(Subtract(n, idx), Literal(1))), Literal("."), None))),
        Some(Literal.create(null, StringType)))
    }
    // toIPv4: CH's IPv4-typed value IS the UInt32 (documented numeric
    // deviation — Spark has no IPv4 type; round-trip via IPv4NumToString)
    reg("toIPv4")(es => GraftFunctions.ipv4StringToNum(es.head))
  }

  /** '' → NULL (CH's permissive URL getters return '' where ParseUrl
    * yields null; here the EXTRACT direction needs the reverse). */
  private def nonEmptyOrNull(e: Expression): Expression =
    With(e) { refs =>
      CaseWhen(Seq((EqualTo(Length(refs.head), Literal(0)),
        Literal.create(null, StringType))), Some(refs.head))
    }
}

/** CH `roundToExp2`: round DOWN to the nearest power of two; inputs
  * below 1 return 0 (FunctionsRound). Integral types use
  * Long.highestOneBit in the operand's own type; Decimal(20,0) — the
  * UInt64 convention — goes through BigInteger so 2^63..2^64-1 rounds
  * to exactly 2^63; float/double clear the mantissa bits (exactly
  * 2^floor(log2 x), the same bit trick CH's float path uses). */
case class RoundToExp2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType => TypeCheckResult.TypeCheckSuccess
    // any scale-0 decimal: UInt64 arithmetic widens Decimal(20,0)
    // (e.g. intExp2(63) + 5 is DECIMAL(21,0)); the result is always
    // <= the input, so the input's own precision carries it
    case d: DecimalType if d.scale == 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"roundToExp2 expects an integer-valued numeric type, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case ByteType =>
      val x = v.asInstanceOf[Byte]
      (if (x < 1) 0L else java.lang.Long.highestOneBit(x.toLong)).toByte
    case ShortType =>
      val x = v.asInstanceOf[Short]
      (if (x < 1) 0L else java.lang.Long.highestOneBit(x.toLong)).toShort
    case IntegerType =>
      val x = v.asInstanceOf[Int]
      (if (x < 1) 0L else java.lang.Long.highestOneBit(x.toLong)).toInt
    case LongType =>
      val x = v.asInstanceOf[Long]
      if (x < 1) 0L else java.lang.Long.highestOneBit(x)
    case FloatType =>
      val x = v.asInstanceOf[Float]
      if (!(x >= 1f)) 0f
      else java.lang.Float.intBitsToFloat(
        java.lang.Float.floatToRawIntBits(x) & 0xFF800000)
    case DoubleType =>
      val x = v.asInstanceOf[Double]
      if (!(x >= 1d)) 0d
      else java.lang.Double.longBitsToDouble(
        java.lang.Double.doubleToRawLongBits(x) & 0xFFF0000000000000L)
    case d: DecimalType =>
      DialectExtras.roundDecExp2(v.asInstanceOf[Decimal], d.precision)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val jt = child.dataType match {
          case ByteType => "byte"
          case ShortType => "short"
          case IntegerType => "int"
          case _ => "long"
        }
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = ($c < 1) ? ($jt) 0 : " +
            s"($jt) java.lang.Long.highestOneBit((long) $c);")
      case FloatType =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = !($c >= 1f) ? 0f : java.lang.Float.intBitsToFloat(" +
            s"java.lang.Float.floatToRawIntBits($c) & 0xFF800000);")
      case DoubleType =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = !($c >= 1d) ? 0d : java.lang.Double.longBitsToDouble(" +
            s"java.lang.Double.doubleToRawLongBits($c) & 0xFFF0000000000000L);")
      case d: DecimalType =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = graft.functions.DialectExtras.roundDecExp2($c, ${d.precision});")
    }

  override protected def withNewChildInternal(n: Expression): RoundToExp2 =
    copy(child = n)
}

/** CH-exact `bitShiftLeft`/`bitShiftRight`/`bitTest` (ADVICE r13): Java
  * — and therefore Spark's shiftleft/shiftright — masks the shift count
  * mod the operand width, so `bitShiftLeft(1, 64)` returned 1 and
  * `bitTest(x, 64)` read bit 0; ClickHouse yields 0 whenever the count
  * is negative or at/past the operand's bit width. The width comes from
  * the left operand's RESOLVED integral type (an INT zeroes at 32, a
  * BIGINT at 64) — only decidable post-analysis, hence an expression
  * rather than a CaseWhen in the builder. In-range semantics are
  * exactly Java's (`<<`, arithmetic `>>`, `&1`), which agree with CH's
  * C++ on two's-complement integers. Documented deviation: a narrow CH
  * literal (UInt8 `1`) is an IntegerType literal here, so its width
  * gate sits at 32, not 8 — CH's own width-promotion rules for literal
  * arguments are version-dependent and unoracled, and the engine's
  * ingest columns are int64 throughout. `mode` ∈ left|right|test;
  * `test` returns 0/1 as IntegerType (the toUInt8 convention). */
case class ChBitShift(left: Expression, right: Expression, mode: String)
  extends BinaryExpression {
  override def prettyName: String = mode match {
    case "left" => "bitShiftLeft"
    case "right" => "bitShiftRight"
    case _ => "bitTest"
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      if (right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName count must be INT, got ${right.dataType.sql}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName operand must be an integer type, got ${other.sql}")
  }

  override def dataType: DataType =
    if (mode == "test") IntegerType else left.dataType

  private def width: Int = left.dataType match {
    case ByteType => 8
    case ShortType => 16
    case IntegerType => 32
    case _ => 64
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val cnt = r.asInstanceOf[Int]
    val oob = cnt < 0 || cnt >= width
    def asLong: Long = left.dataType match {
      case ByteType => l.asInstanceOf[Byte].toLong
      case ShortType => l.asInstanceOf[Short].toLong
      case IntegerType => l.asInstanceOf[Int].toLong
      case _ => l.asInstanceOf[Long]
    }
    def back(v: Long): Any = left.dataType match {
      case ByteType => v.toByte
      case ShortType => v.toShort
      case IntegerType => v.toInt
      case _ => v
    }
    mode match {
      case "test" => if (oob) 0 else ((asLong >> cnt) & 1L).toInt
      case "left" => if (oob) back(0L) else back(asLong << cnt)
      case _ => if (oob) back(0L) else back(asLong >> cnt)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = width
    val jt = left.dataType match {
      case ByteType => "byte"
      case ShortType => "short"
      case IntegerType => "int"
      case _ => "long"
    }
    nullSafeCodeGen(ctx, ev, (l, r) => mode match {
      case "test" =>
        s"${ev.value} = ($r < 0 || $r >= $w) ? 0 : (int) ((((long) $l) >> $r) & 1L);"
      case "left" =>
        s"${ev.value} = ($r < 0 || $r >= $w) ? ($jt) 0 : ($jt) ($l << $r);"
      case _ =>
        s"${ev.value} = ($r < 0 || $r >= $w) ? ($jt) 0 : ($jt) ($l >> $r);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChBitShift =
    copy(left = newLeft, right = newRight)
}
