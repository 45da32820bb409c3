package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's raw-preserving JSON accessors (VERDICT r13 #4):
  * `JSONExtractRaw`, `JSONExtractArrayRaw`, `JSONType`.
  *
  * These sat on the dialect gap list because mapping them onto
  * `get_json_object` would silently deviate: Spark's extractor UNQUOTES
  * string results and re-serializes containers, while the CH trio's
  * entire contract is byte-fidelity — `JSONExtractRaw('{"b": [-100,
  * 200.0, 300]}', 'b')` returns the raw slice `[-100, 200.0, 300]`
  * with its original spacing, quoting and number spellings intact (the
  * reference surface exposes them through chsql; CH observability
  * queries lean on ExtractRaw to re-ship nested payloads verbatim).
  * So this file implements a span-preserving scanner: a hand-rolled
  * single-pass JSON walker over the document TEXT that locates the
  * addressed value and returns `substring(start, end)` — never a
  * parse-then-print round trip.
  *
  * Path semantics per the published CH contract
  * (sql-reference/functions/json-functions): each trailing argument is
  * either a string (object member by key) or an integer (1-based
  * position; NEGATIVE counts from the end; an integer addresses the
  * n-th member of an object or the n-th element of an array). A
  * missing/mistyped step yields the function's default — `''` for
  * ExtractRaw, `[]` for ExtractArrayRaw, `'Null'` for JSONType (CH
  * returns the Enum value Null both for JSON null and for absent
  * paths). Type names follow CH's simdjson-era mapping: Object, Array,
  * String, Bool, Null, and for numbers UInt64 (non-negative integer),
  * Int64 (negative integer), Double (fraction/exponent or out of
  * 64-bit range).
  *
  * Multi-step paths FOLD: a raw slice of a valid document is itself a
  * valid document, so `JSONExtractRaw(j, 'a', 1)` builds as
  * `step(step(root(j), 'a'), 1)` — each step is a plain
  * BinaryExpression with full codegen (the [[Ipv6Exprs]] house
  * pattern; no UDF boundary, stays inside whole-stage codegen), and a
  * `''` miss propagates through later steps unchanged. `root()`
  * validates the document once (strict: one value, balanced, only
  * trailing whitespace) so that malformed input yields the CH default
  * rather than a partial slice.
  *
  * Deviation (documented): CH validates UTF-8 and rejects some exotic
  * malformed documents this scanner tolerates (e.g. duplicate keys —
  * first match wins here, as in simdjson's on-demand API); and CH's
  * Int64/UInt64/Double classification happens on the PARSED value, so
  * an integer written `1e2` is Double there and Double here too —
  * aligned — but `18446744073709551616` (2^64) is Double in CH and
  * Double here via the range check.
  */
object ChJsonRaw {

  // ---- scanning primitives: all return an exclusive end index, or -1 --

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
      s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    i
  }

  /** i0 at the opening quote; end AFTER the closing quote. */
  private def endOfString(s: String, i0: Int): Int = {
    var i = i0 + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  private def endOfNumber(s: String, i0: Int): Int = {
    var i = i0
    if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
    val digits0 = i
    while (i < s.length && {
      val c = s.charAt(i)
      (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' ||
        c == '+' || c == '-'
    }) i += 1
    if (i == digits0) -1 else i
  }

  private def endOfLiteral(s: String, i0: Int, lit: String): Int =
    if (s.regionMatches(i0, lit, 0, lit.length)) i0 + lit.length else -1

  /** i0 at '{' or '['; end AFTER the matching close. String-aware. */
  private def endOfContainer(s: String, i0: Int): Int = {
    var depth = 0
    var i = i0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' =>
          val e = endOfString(s, i)
          if (e < 0) return -1
          i = e
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' =>
          depth -= 1; i += 1
          if (depth == 0) return i
        case _ => i += 1
      }
    }
    -1
  }

  /** i0 at the first char of a value; end AFTER the value, or -1. */
  private def endOfValue(s: String, i0: Int): Int = {
    if (i0 >= s.length) return -1
    s.charAt(i0) match {
      case '{' | '[' => endOfContainer(s, i0)
      case '"' => endOfString(s, i0)
      case 't' => endOfLiteral(s, i0, "true")
      case 'f' => endOfLiteral(s, i0, "false")
      case 'n' => endOfLiteral(s, i0, "null")
      case _ => endOfNumber(s, i0)
    }
  }

  /** JSON string unescape of s[from+1, to-1] (bounds at the quotes) for
    * KEY comparison; null on a malformed escape. */
  private def unescape(s: String, from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder(to - from)
    var i = from + 1
    val end = to - 1
    while (i < end) {
      val c = s.charAt(i)
      if (c != '\\') { sb.append(c); i += 1 }
      else if (i + 1 >= end) return null
      else {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' =>
            if (i + 6 > end) return null
            try sb.append(
              Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            catch { case _: NumberFormatException => return null }
            i += 6
          case _ => return null
        }
      }
    }
    sb.toString
  }

  /** Member/element spans of the container starting at i0 ('{' or '[').
    * For objects, `keys` collects the RAW key spans (start at quote);
    * `vals` the value spans. For arrays, keys stays empty-aligned
    * ((-1,-1)). Returns false on malformed content. */
  private def scanContainer(s: String, i0: Int,
                            keys: java.util.ArrayList[Long],
                            vals: java.util.ArrayList[Long]): Boolean = {
    val isObj = s.charAt(i0) == '{'
    val outer = endOfValue(s, i0)
    if (outer < 0) return false
    var i = skipWs(s, i0 + 1)
    if (i < s.length && (s.charAt(i) == (if (isObj) '}' else ']')))
      return true // empty container
    var done = false
    while (!done) {
      var keySpan = -1L
      if (isObj) {
        if (i >= s.length || s.charAt(i) != '"') return false
        val ke = endOfString(s, i)
        if (ke < 0) return false
        keySpan = (i.toLong << 32) | (ke.toLong & 0xffffffffL)
        i = skipWs(s, ke)
        if (i >= s.length || s.charAt(i) != ':') return false
        i = skipWs(s, i + 1)
      }
      val ve = endOfValue(s, i)
      if (ve < 0) return false
      keys.add(keySpan)
      vals.add((i.toLong << 32) | (ve.toLong & 0xffffffffL))
      i = skipWs(s, ve)
      if (i >= s.length) return false
      s.charAt(i) match {
        case ',' => i = skipWs(s, i + 1)
        case '}' if isObj => done = true
        case ']' if !isObj => done = true
        case _ => return false
      }
    }
    true
  }

  private val Empty = UTF8String.fromString("")

  /** Validate + trim the document to its root value's raw slice; ""
    * when the text is not exactly one JSON value (+ whitespace). */
  def root(json: UTF8String): UTF8String = {
    val s = json.toString
    val st = skipWs(s, 0)
    if (st >= s.length) return Empty
    val en = endOfValue(s, st)
    if (en < 0 || skipWs(s, en) != s.length) return Empty
    // containers get a full structural walk; scalars were fully scanned
    s.charAt(st) match {
      case '{' | '[' =>
        if (walkOk(s, st, en)) UTF8String.fromString(s.substring(st, en))
        else Empty
      case _ => UTF8String.fromString(s.substring(st, en))
    }
  }

  /** Recursive structural validation of the container at [st, en). */
  private def walkOk(s: String, st: Int, en: Int): Boolean = {
    val keys = new java.util.ArrayList[Long]()
    val vals = new java.util.ArrayList[Long]()
    if (!scanContainer(s, st, keys, vals)) return false
    var i = 0
    while (i < vals.size()) {
      val v = vals.get(i)
      val vs = (v >> 32).toInt
      val ve = (v & 0xffffffffL).toInt
      s.charAt(vs) match {
        case '{' | '[' => if (!walkOk(s, vs, ve)) return false
        case _ =>
      }
      i += 1
    }
    true
  }

  /** One path step by string key: first member of the object whose
    * (unescaped) key equals `key`; "" when absent or not an object. */
  def stepKey(json: UTF8String, key: UTF8String): UTF8String = {
    val s = json.toString
    if (s.isEmpty || s.charAt(0) != '{') return Empty
    val keys = new java.util.ArrayList[Long]()
    val vals = new java.util.ArrayList[Long]()
    if (!scanContainer(s, 0, keys, vals)) return Empty
    val want = key.toString
    var i = 0
    while (i < keys.size()) {
      val k = keys.get(i)
      val ks = (k >> 32).toInt
      val ke = (k & 0xffffffffL).toInt
      val got = unescape(s, ks, ke)
      if (got != null && got == want) {
        val v = vals.get(i)
        return UTF8String.fromString(
          s.substring((v >> 32).toInt, (v & 0xffffffffL).toInt))
      }
      i += 1
    }
    Empty
  }

  /** One path step by 1-based index (negative from the end) into an
    * array's elements or an object's member VALUES, per CH. Takes a
    * long so every integral SQL type shares one kernel (and one
    * codegen call shape); any index beyond int range is a miss anyway. */
  def stepIndex(json: UTF8String, idx: Long): UTF8String = {
    val s = json.toString
    if (s.isEmpty || (s.charAt(0) != '{' && s.charAt(0) != '[')) return Empty
    val keys = new java.util.ArrayList[Long]()
    val vals = new java.util.ArrayList[Long]()
    if (!scanContainer(s, 0, keys, vals)) return Empty
    val n = vals.size()
    val pos = if (idx > 0) idx - 1 else n + idx
    if (pos < 0 || pos >= n) return Empty
    val v = vals.get(pos.toInt)
    UTF8String.fromString(
      s.substring((v >> 32).toInt, (v & 0xffffffffL).toInt))
  }

  /** Raw slices of the array's elements; empty when not an array. */
  def arrayRaw(json: UTF8String): Array[UTF8String] = {
    val s = json.toString
    if (s.isEmpty || s.charAt(0) != '[') return Array.empty
    val keys = new java.util.ArrayList[Long]()
    val vals = new java.util.ArrayList[Long]()
    if (!scanContainer(s, 0, keys, vals)) return Array.empty
    val out = new Array[UTF8String](vals.size())
    var i = 0
    while (i < out.length) {
      val v = vals.get(i)
      out(i) = UTF8String.fromString(
        s.substring((v >> 32).toInt, (v & 0xffffffffL).toInt))
      i += 1
    }
    out
  }

  /** CH JSONType name of the value (the input is a raw slice from
    * root/step, so '' — a prior miss — maps to 'Null'). */
  def typeOf(json: UTF8String): UTF8String = {
    val s = json.toString
    if (s.isEmpty) return UTF8String.fromString("Null")
    UTF8String.fromString(s.charAt(0) match {
      case '{' => "Object"
      case '[' => "Array"
      case '"' => "String"
      case 't' | 'f' => "Bool"
      case 'n' => "Null"
      case _ => numType(s)
    })
  }

  private def numType(s: String): String = {
    val frac = s.exists(c => c == '.' || c == 'e' || c == 'E')
    if (frac) "Double"
    else if (s.charAt(0) == '-') {
      try { java.lang.Long.parseLong(s); "Int64" }
      catch { case _: NumberFormatException => "Double" }
    } else {
      try { java.lang.Long.parseUnsignedLong(s); "UInt64" }
      catch { case _: NumberFormatException => "Double" }
    }
  }
}

/** Validate + trim to the root value's raw slice (the fold's seed). */
case class JsonRawRoot(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"JSONExtractRaw expects a STRING document, got ${child.dataType.sql}")
  override protected def nullSafeEval(v: Any): Any =
    ChJsonRaw.root(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChJsonRaw.root($c)")
  override protected def withNewChildInternal(n: Expression): JsonRawRoot =
    copy(child = n)
}

/** One CH json-path step: string right = member by key; integral right
  * = 1-based (negative-from-end) position. The right child's RESOLVED
  * type picks the semantics, as in CH — `'1'` is a key, `1` a position. */
case class JsonRawStep(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case StringType | ByteType | ShortType | IntegerType | LongType =>
      if (left.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"JSON path step expects a STRING document, got ${left.dataType.sql}")
    case other => TypeCheckResult.TypeCheckFailure(
      "JSON path arguments must be strings (keys) or integers " +
        s"(positions), got ${other.sql}")
  }
  private def byKey: Boolean = right.dataType == StringType
  override protected def nullSafeEval(l: Any, r: Any): Any =
    if (byKey)
      ChJsonRaw.stepKey(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    else {
      val idx = right.dataType match {
        case ByteType => r.asInstanceOf[Byte].toLong
        case ShortType => r.asInstanceOf[Short].toLong
        case IntegerType => r.asInstanceOf[Int].toLong
        case _ => r.asInstanceOf[Long]
      }
      ChJsonRaw.stepIndex(l.asInstanceOf[UTF8String], idx)
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (byKey)
      defineCodeGen(ctx, ev, (l, r) => s"graft.functions.ChJsonRaw.stepKey($l, $r)")
    else
      defineCodeGen(ctx, ev,
        (l, r) => s"graft.functions.ChJsonRaw.stepIndex($l, (long) $r)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JsonRawStep = copy(left = l, right = r)
}

/** `JSONExtractArrayRaw` face over the folded slice. */
case class JsonRawArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"JSONExtractArrayRaw expects a STRING document, got ${child.dataType.sql}")
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      ChJsonRaw.arrayRaw(v.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.functions.ChJsonRaw.arrayRaw($c))")
  override protected def withNewChildInternal(n: Expression): JsonRawArray =
    copy(child = n)
}

/** `JSONType` face over the folded slice. */
case class JsonRawType(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"JSONType expects a STRING document, got ${child.dataType.sql}")
  override protected def nullSafeEval(v: Any): Any =
    ChJsonRaw.typeOf(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChJsonRaw.typeOf($c)")
  override protected def withNewChildInternal(n: Expression): JsonRawType =
    copy(child = n)
}
