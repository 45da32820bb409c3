package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, language ID, quality scoring, document
  * fingerprinting. All pure column expressions (no UDFs) so they stay
  * inside whole-stage codegen and scale linearly with no shuffle.
  *
  * Each operator has a dual SQL rendering (the `*Sql` members) built from
  * the same constants, used as the DuckDB oracle — one source of truth for
  * both engines.
  */
object TextOps {

  /** Whitespace tokens of lower-cased trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Shared md5 bucket primitive (24 bits mod `mod`, always positive)
    * — the ONE spelling the Bloom probes and CDC boundaries hash with,
    * paired with [[md5BucketSql]] so the two engines cannot drift. */
  def md5Bucket(c: Column, mod: Long): Column =
    md5Slice(c, 1, 6) % mod

  /** `conv(substring(md5(c), pos, len), 16, 10).cast("long")` as ONE
    * codegen expression over the raw digest bytes
    * ([[graft.functions.Md5SliceExpr]], r15 optimization round) —
    * bit-identical by construction and property-pinned; every oracle
    * keeps the hex spelling. */
  def md5Slice(c: Column, pos: Int, len: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.Md5SliceExpr(
        org.apache.spark.sql.GraftColumnBridge.toExpression(c), pos, len))

  /** `unhex(md5(c))` as one digest-bytes kernel — the INTERNAL-key
    * spelling of md5 ([[graft.functions.Md5BinExpr]], r16): half the
    * shuffle bytes of the hex string, bijective with it, so grouping/
    * window decisions are identical. Never for oracle-visible columns. */
  def md5Bin(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.Md5BinExpr(
        org.apache.spark.sql.GraftColumnBridge.toExpression(c)))

  /** DuckDB rendering of [[md5Bucket]]. */
  def md5BucketSql(expr: String, mod: Long): String =
    s"(('0x'||substr(md5($expr),1,6))::UBIGINT)::BIGINT % $mod"

  /** JVM rendering of [[md5Bucket]] — the same first-6-hex-chars slice
    * (= top 3 digest bytes, 24 bits) mod `mod`, for scalar expressions
    * that replay an engine-side hash driver/executor-locally
    * ([[graft.functions.CmsCount]]); spec-pinned equal to the Column
    * face so the three spellings cannot drift. */
  // digest() resets the instance, so one per thread serves every call —
  // a per-call getInstance would dominate an interpreted per-row probe
  private val Md5Jvm = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def md5BucketJvm(s: String, mod: Long): Long = {
    val d = Md5Jvm.get()
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL)
    v % mod
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: word chunks + standalone non-word glyphs. */
  val BpeRegex = "[a-z0-9]+|[^a-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeRegex), lit(0)))

  // ---- language ID: stopword-lexicon hit counts, argmax with a fixed
  //      tie-break order (en, es, fr, de, zh). The zh signal is CJK
  //      codepoint presence rather than stopwords. ----
  val Lexicons: Seq[(String, String)] = Seq(
    "en" -> "the|and|of|to|in|is|was|for|that|it",
    "es" -> "el|la|de|que|los|en|un|una|por|con",
    "fr" -> "le|les|des|une|est|et|dans|pour|que|qui",
    "de" -> "der|die|das|und|ist|ein|nicht|mit|auf|von",
  )
  // \x{...} escapes parse in both Java regex and RE2 (DuckDB); \uXXXX doesn't in RE2.
  val CjkRegex = "[\\x{4e00}-\\x{9fff}]"

  private def hits(text: Column, lex: String): Column =
    size(regexp_extract_all(lower(text), lit(s"\\b($lex)\\b"), lit(0)))

  val LangNames: Seq[String] = Lexicons.map(_._1) :+ "zh"

  /** One (name, score) column per language — each an unconditional regex
    * sweep. Materialize these with `.as(...)` in their OWN projection
    * before calling `langIdFromScores` on the resulting attributes:
    * Spark's subexpression elimination skips conditionally-evaluated
    * CASE branches, so an argmax built over inline sweeps re-runs every
    * regex per branch (~20 sweeps/row measured instead of 6). */
  def langScores(text: Column): Seq[(String, Column)] =
    (Lexicons.map { case (l, lex) => l -> hits(text, lex) } :+
      ("zh" -> size(regexp_extract_all(text, lit(CjkRegex), lit(0)))))

  /** Argmax with the fixed en>es>fr>de>zh tie-break over already-
    * materialized score columns (cheap attribute reads). */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val total = scores.map(_._2).reduce(_ + _)
    scores.foldRight(lit("und"): Column) { case ((l, s), el) =>
      when(s >= scores.filter(_._1 != l).map(_._2).reduce(greatest(_, _)) && total > 0, l)
        .otherwise(el)
    }
  }

  /** Single-column convenience — correct but slow in wide plans (see
    * langScores); prefer the two-projection form on hot paths. */
  def langId(text: Column): Column = langIdFromScores(langScores(text))

  /** DuckDB rendering of langId(textCol) — same lexicons, same tie-break. */
  def langIdSql(textCol: String): String = {
    def h(lex: String) = s"len(regexp_extract_all(lower($textCol), '\\b($lex)\\b'))"
    val scores = Lexicons.map { case (l, lex) => l -> h(lex) } :+
      ("zh" -> s"len(regexp_extract_all($textCol, '$CjkRegex'))")
    val total = scores.map(_._2).mkString(" + ")
    val cases = scores.map { case (l, s) =>
      val others = scores.filter(_._1 != l).map(_._2)
      s"WHEN $s >= greatest(${others.mkString(", ")}) AND ($total) > 0 THEN '$l'"
    }
    s"CASE ${cases.mkString(" ")} ELSE 'und' END"
  }

  // ---- quality score: integer-derived ratios only, so the arithmetic is
  //      bit-identical across engines (int/int division, fixed op order).
  //      score = 0.5*min(tokens/100,1) + 0.25*min(stop_ratio/0.3,1)
  //            + 0.25*min(avg_token_len/8,1), rounded to 4dp. ----
  val StopLex: String = Lexicons.head._2

  /** qualityScore with BOTH inputs pre-materialized — token count and
    * stopword hits (review r10: ensembleGate re-derived nTok from text,
    * re-tokenizing per row when size(__w) was already a column; the
    * avg-len regex strip remains the one unavoidable text pass). */
  def qualityScoreFrom(text: Column, nTokens: Column,
                       stopHits: Column): Column = {
    val nTok = nTokens.cast("double")
    val stop = stopHits.cast("double")
    val avgLen = (length(regexp_replace(trim(lower(text)), "\\s+", "")).cast("double") / nTok)
    round(
      least(nTok / 100.0, lit(1.0)) * 0.5 +
        least(stop / nTok / 0.3, lit(1.0)) * 0.25 +
        least(avgLen / 8.0, lit(1.0)) * 0.25, 4)
  }

  /** qualityScore with a pre-materialized stopword hit count (StopLex is
    * the `en` lexicon, so p09 reuses the langScores sweep). */
  def qualityScoreWith(text: Column, stopHits: Column): Column =
    qualityScoreFrom(text, tokenCount(text), stopHits)

  def qualityScore(text: Column): Column =
    qualityScoreWith(text, hits(text, StopLex))

  def qualityScoreSql(textCol: String): String = {
    val nTok = s"CAST(len(string_split_regex(trim(lower($textCol)), '\\s+')) AS DOUBLE)"
    val stop = s"CAST(len(regexp_extract_all(lower($textCol), '\\b($StopLex)\\b')) AS DOUBLE)"
    val avgLen = s"(CAST(length(regexp_replace(trim(lower($textCol)), '\\s+', '', 'g')) AS DOUBLE) / $nTok)"
    OracleSql.roundD(s"least($nTok / 100.0, 1.0) * 0.5 + least($stop / $nTok / 0.3, 1.0) * 0.25 + " +
      s"least($avgLen / 8.0, 1.0) * 0.25", 4)
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set. Identical files (modulo word order/duplication) collide —
    * the cheap first pass before shingle-based near-dup. */
  def setFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  def setFingerprintSql(textCol: String): String =
    s"md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(lower($textCol)), '\\s+'))), ' '))"

  /** Rolling (order-sensitive) fingerprint over the token stream: a
    * chained hash acc ← md5(acc ∥ token), folded left with the first
    * token as the seed. md5 is the one hash primitive Spark and DuckDB
    * share bit-for-bit, so unlike an xxhash64 chain this IS
    * oracle-verifiable (DuckDB list_reduce; the fold shapes were checked
    * to agree engine-to-engine). Same collision behavior as any chained
    * rolling hash. */
  def rollingFingerprintOf(w: Column): Column =
    when(size(w) <= 1, coalesce(element_at(w, 1), lit("")))
      .otherwise(aggregate(slice(w, lit(2), size(w) - 1), element_at(w, 1),
        (acc, t) => md5(concat(acc, t))))

  def rollingFingerprint(text: Column): Column = rollingFingerprintOf(tokens(text))

  def rollingFingerprintSql(textCol: String): String =
    s"list_reduce(string_split_regex(trim(lower($textCol)), '\\s+'), (acc, x) -> md5(acc || x))"

  // ---- repetition filters (Gopher §A1.1 / C4-style quality rules):
  //      natural text repeats little; scraped boilerplate, SEO spam and
  //      generation loops repeat a lot. Standard pre-training gate. ----

  /** Keep-thresholds on the rounded fractions (Gopher-inspired: its
    * duplicate-line fraction cap is 0.30, top-2-gram 0.18). */
  val DupWordMax = 0.5
  val TopBigramMax = 0.18
  val DupTrigramMax = 0.3

  /** Per-doc repetition metrics + keep flag:
    *  - dup_word_frac: 1 − distinct/total words (word-level repetition);
    *  - top_bigram_frac: occurrences of the most frequent bigram over
    *    all bigrams (loop/boilerplate detector);
    *  - dup_trigram_frac: 1 − distinct/total trigrams;
    *  - keep: all three under their caps (computed on the ROUNDED
    *    values so the DuckDB oracle's boolean can never diverge at a
    *    threshold boundary).
    * Shape at scale: everything is a per-row column expression — ZERO
    * shuffles. The bigram mode (most frequent bigram's count) is the max
    * run length over the SORTED bigram array, one aggregate() pass per
    * row, instead of an explode + two groupBys + self-join that would
    * recompute the tokenize/gram base for the exploded branch (measured
    * 5.2 s vs 1 s at sf0.1). */
  /** Longest run over the SORTED array = the mode's count: one
    * aggregate() fold per row ((prev, run, best) state), no explode. */
  private def topRunOf(sortedArr: Column): Column =
    aggregate(sortedArr,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** The three repetition fractions over materialized (n_words, distinct
    * words, bigram, trigram) columns — ONE spelling shared by
    * repetitionStats (p14) and ensembleGate (p58), so the gates cannot
    * drift apart. Rounded to 6dp; verdicts compare the rounded value. */
  private def dupWordFracCol(nWords: Column, dw: Column): Column =
    round(lit(1.0) - dw.cast("double") / nWords, 6)
  private def topBigramFracCol(g2: Column): Column =
    round(when(size(g2) > 0,
      topRunOf(array_sort(g2)).cast("double") / size(g2))
      .otherwise(lit(0.0)), 6)
  private def dupTrigramFracCol(g3: Column): Column =
    round(when(size(g3) > 0,
      lit(1.0) - size(array_distinct(g3)).cast("double") / size(g3))
      .otherwise(lit(0.0)), 6)

  /** The same three fractions in DuckDB SQL (columns `nw, w, tb, g3` in
    * scope) — shared by repetitionSql and ensembleSql. */
  private def dupWordFracSql: String =
    OracleSql.roundD("1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / nw", 6)
  private def topBigramFracSql: String =
    s"coalesce(${OracleSql.roundD("tb", 6)}, 0.0)"
  private def dupTrigramFracSql: String =
    OracleSql.roundD("CASE WHEN len(g3) > 0 THEN " +
      "1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) ELSE 0.0 END", 6)

  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val w = col("__w")
    // codegen n-gram builder (WordNGrams), not an interpreted HOF
    def grams(n: Int): Column = graft.functions.TextExprs.ngrams(w, n)
    // tokenize, then materialize the gram arrays, THEN read them multiple
    // times — HOF lambdas re-evaluate captured expressions per element,
    // and size()/array_distinct() both re-reading an inline grams() would
    // re-build the arrays (same trap as DedupOps.shingles)
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__w"))
      .select(col("doc_id"), size(w).as("n_words"),
        size(array_distinct(w)).as("__dw"),
        grams(2).as("__g2"), grams(3).as("__g3"))
      .select(col("doc_id"), col("n_words"),
        dupWordFracCol(col("n_words"), col("__dw")).as("dup_word_frac"),
        topBigramFracCol(col("__g2")).as("top_bigram_frac"),
        dupTrigramFracCol(col("__g3")).as("dup_trigram_frac"))
      .withColumn("keep",
        col("dup_word_frac") <= DupWordMax &&
          col("top_bigram_frac") <= TopBigramMax &&
          col("dup_trigram_frac") <= DupTrigramMax)
  }

  // ---- multi-signal ensemble gate (the Dolma/FineWeb tagger→mixer
  //      shape: every filter runs as an independent TAGGER, the mixer
  //      records WHICH gate dropped a doc — drop-reason attribution is
  //      what lets a pipeline audit its own yield per rule). ----

  /** Gate thresholds (Gopher-adjacent, matching the standalone ops'
    * constants where one exists). */
  val EnsembleMinWords = 5L
  val EnsembleSymbolMax = 0.4
  val EnsembleQualityMin = 0.5

  /** Every signal + per-gate verdicts + keep + first-tripped reason:
    * `doc_id, n_words, symbol_frac, dup_word_frac, top_bigram_frac,
    * dup_trigram_frac, quality, g_short..g_lowq, keep, reason`.
    *
    * All signals are pure column expressions over one tokenize pass —
    * ZERO shuffles, whole-stage codegen, linear in corpus bytes (the
    * p08/p09/p31 sweep shape). Verdicts compare ROUNDED values so the
    * oracle's booleans can never diverge at a threshold boundary.
    * Reason priority is structural-first (short → symbolic → repetition
    * → model-ish quality), mirroring how production cascades order
    * cheap structural rules before scored ones. */
  def ensembleGate(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val w = col("__w")
    def grams(n: Int): Column = graft.functions.TextExprs.ngrams(w, n)
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"),
        tokens(col(textCol)).as("__w"))
      .select(col("doc_id"), col("__t"), w,
        size(w).cast("long").as("n_words"),
        size(array_distinct(w)).as("__dw"),
        grams(2).as("__g2"), grams(3).as("__g3"))
      .select(col("doc_id"),
        col("n_words"),
        // symbol_frac = 1 − (letters + digits + _ + whitespace)/chars;
        // \p{L}/\p{N} (not ASCII-only \w) so CJK text isn't all-symbol;
        // the classes mean the same thing in Java regex and RE2.
        // int/int division then one subtract — engine-exact
        round(when(length(col("__t")) > 0,
          lit(1.0) - length(regexp_replace(col("__t"), "[^\\p{L}\\p{N}_\\s]", ""))
            .cast("double") / length(col("__t"))).otherwise(lit(0.0)), 6)
          .as("symbol_frac"),
        dupWordFracCol(col("n_words"), col("__dw")).as("dup_word_frac"),
        topBigramFracCol(col("__g2")).as("top_bigram_frac"),
        dupTrigramFracCol(col("__g3")).as("dup_trigram_frac"),
        // n_words IS tokenCount(__t) (materialized one projection up) —
        // qualityScoreFrom reuses it instead of re-tokenizing (review r10)
        qualityScoreFrom(col("__t"), col("n_words"),
          hits(col("__t"), StopLex)).as("quality"))
      .withColumn("g_short", col("n_words") >= EnsembleMinWords)
      .withColumn("g_symbolic", col("symbol_frac") <= EnsembleSymbolMax)
      .withColumn("g_dupword", col("dup_word_frac") <= DupWordMax)
      .withColumn("g_topbigram", col("top_bigram_frac") <= TopBigramMax)
      .withColumn("g_duptrigram", col("dup_trigram_frac") <= DupTrigramMax)
      .withColumn("g_lowq", col("quality") >= EnsembleQualityMin)
      .withColumn("keep",
        col("g_short") && col("g_symbolic") && col("g_dupword") &&
          col("g_topbigram") && col("g_duptrigram") && col("g_lowq"))
      .withColumn("reason",
        when(!col("g_short"), "short")
          .when(!col("g_symbolic"), "symbolic")
          .when(!col("g_dupword"), "dup_word")
          .when(!col("g_topbigram"), "top_bigram")
          .when(!col("g_duptrigram"), "dup_trigram")
          .when(!col("g_lowq"), "low_quality")
          .otherwise("pass"))
  }

  /** DuckDB oracle for ensembleGate (same signals, same rounding, same
    * reason priority). */
  def ensembleSql(table: String = "documents"): String = {
    def r6(e: String) = OracleSql.roundD(e, 6)
    s"""WITH toks AS (
       |  SELECT doc_id, text, string_split_regex(trim(lower(text)), '\\s+') w
       |  FROM $table),
       |g AS (
       |  SELECT doc_id, text, w, len(w) AS nw,
       |    list_transform(range(1, greatest(len(w), 1)), i -> w[i]||' '||w[i+1]) AS g2,
       |    list_transform(range(1, greatest(len(w) - 1, 1)),
       |                   i -> w[i]||' '||w[i+1]||' '||w[i+2]) AS g3
       |  FROM toks),
       |bgc AS (
       |  SELECT doc_id, gg, count(*) AS c
       |  FROM (SELECT doc_id, unnest(g2) AS gg FROM g) GROUP BY 1, 2),
       |topb AS (
       |  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS tb FROM bgc GROUP BY 1),
       |m AS (
       |  SELECT g.doc_id, CAST(nw AS BIGINT) AS n_words,
       |    ${r6("CASE WHEN length(text) > 0 THEN 1.0 - " +
            "CAST(length(regexp_replace(text, '[^\\p{L}\\p{N}_\\s]', '', 'g')) AS DOUBLE)" +
            " / length(text) ELSE 0.0 END")} AS symbol_frac,
       |    $dupWordFracSql AS dup_word_frac,
       |    $topBigramFracSql AS top_bigram_frac,
       |    $dupTrigramFracSql AS dup_trigram_frac,
       |    ${qualityScoreSql("text")} AS quality
       |  FROM g LEFT JOIN topb ON g.doc_id = topb.doc_id),
       |v AS (
       |  SELECT *,
       |    n_words >= $EnsembleMinWords AS g_short,
       |    symbol_frac <= $EnsembleSymbolMax AS g_symbolic,
       |    dup_word_frac <= $DupWordMax AS g_dupword,
       |    top_bigram_frac <= $TopBigramMax AS g_topbigram,
       |    dup_trigram_frac <= $DupTrigramMax AS g_duptrigram,
       |    quality >= $EnsembleQualityMin AS g_lowq
       |  FROM m)
       |SELECT doc_id, n_words, symbol_frac, dup_word_frac, top_bigram_frac,
       |  dup_trigram_frac, quality, g_short, g_symbolic, g_dupword,
       |  g_topbigram, g_duptrigram, g_lowq,
       |  (g_short AND g_symbolic AND g_dupword AND g_topbigram
       |   AND g_duptrigram AND g_lowq) AS keep,
       |  CASE WHEN NOT g_short THEN 'short'
       |       WHEN NOT g_symbolic THEN 'symbolic'
       |       WHEN NOT g_dupword THEN 'dup_word'
       |       WHEN NOT g_topbigram THEN 'top_bigram'
       |       WHEN NOT g_duptrigram THEN 'dup_trigram'
       |       WHEN NOT g_lowq THEN 'low_quality'
       |       ELSE 'pass' END AS reason
       |FROM v ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle for repetitionStats (same constants, same rounding). */
  def repetitionSql(table: String = "documents"): String = {
    def r6(e: String) = OracleSql.roundD(e, 6)
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') w FROM $table),
       |g AS (
       |  SELECT doc_id, w, len(w) AS nw,
       |    list_transform(range(1, greatest(len(w), 1)), i -> w[i]||' '||w[i+1]) AS g2,
       |    list_transform(range(1, greatest(len(w) - 1, 1)),
       |                   i -> w[i]||' '||w[i+1]||' '||w[i+2]) AS g3
       |  FROM toks),
       |bgc AS (
       |  SELECT doc_id, gg, count(*) AS c
       |  FROM (SELECT doc_id, unnest(g2) AS gg FROM g) GROUP BY 1, 2),
       |topb AS (
       |  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS tb FROM bgc GROUP BY 1),
       |m AS (
       |  SELECT g.doc_id, nw AS n_words,
       |    $dupWordFracSql AS dup_word_frac,
       |    $topBigramFracSql AS top_bigram_frac,
       |    $dupTrigramFracSql AS dup_trigram_frac
       |  FROM g LEFT JOIN topb ON g.doc_id = topb.doc_id)
       |SELECT doc_id, n_words, dup_word_frac, top_bigram_frac, dup_trigram_frac,
       |  (dup_word_frac <= $DupWordMax AND top_bigram_frac <= $TopBigramMax
       |   AND dup_trigram_frac <= $DupTrigramMax) AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Per-document salient terms: the top-k terms by a TF-IDF-style
    * score, ties broken by term. The inverse-document-frequency factor
    * is the exact rational N/df rather than the classical log(N/df):
    * log's libm rounding differs across engines in the last ulp (no
    * correctly-rounded guarantee), while multiply/divide are IEEE-exact
    * everywhere — same ranking behavior for top-k purposes (N/df is a
    * monotone transform of log(N/df)), and the score replays bit-for-bit
    * in the DuckDB oracle.
    *
    * Scale shape: tf is one (doc, term) groupBy; df aggregates tf again
    * by term (vocabulary-sized, Zipf-bounded); the tf⋈df join shuffles
    * on term with bounded per-key rows (≤ docs containing the term, and
    * the scoring join carries only ids+counts, not text); top-k is one
    * doc-keyed window. No all-pairs anything. */
  /** Max lag probed by [[periodicity]]. */
  val MaxPeriodLag = 8

  /** Periodic-repetition score: for lags 1..MaxPeriodLag, the per-mille
    * fraction of positions where token i equals token i+lag; the MAX
    * over lags (`rep_milli`) with the smallest lag achieving it
    * (`best_lag`, 0 when nothing repeats). Degenerate loops ("ha ha ha
    * …", cycled boilerplate) score ~1000 at their period — a signal the
    * dup-n-gram FRACTIONS miss once the cycle is longer than the gram
    * (a lag-3 loop has every trigram distinct). Pure map: one HOF
    * filter per lag over the doc's own token array, exact integer
    * arithmetic, zero shuffles. */
  def periodicity(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val w = col("__w")
    val n = size(w)
    def matches(lag: Int): Column =
      when(n > lag,
        size(filter(sequence(lit(1), n - lag),
          i => element_at(w, i) === element_at(w, i + lag))).cast("long"))
        .otherwise(lit(0L))
    val withC = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__w"))
      .select(Seq(col("doc_id"), n.cast("long").as("n_tokens")) ++
        (1 to MaxPeriodLag).map(l => matches(l).as(s"__c$l")): _*)
    // integer DIV (not float /): per-mille replays exactly in DuckDB
    val withM = (1 to MaxPeriodLag).foldLeft(withC) { (df, l) =>
      df.withColumn(s"__m$l", expr(
        s"CASE WHEN n_tokens > $l THEN (1000 * __c$l) DIV (n_tokens - $l) " +
          "ELSE 0L END"))
    }
    val rep = greatest((1 to MaxPeriodLag).map(l => col(s"__m$l")): _*)
    val lagCase = (1 to MaxPeriodLag).foldRight(lit(0)) { (l, rest) =>
      when(col(s"__m$l") === col("rep_milli"), lit(l)).otherwise(rest)
    }
    withM.withColumn("rep_milli", rep)
      .withColumn("best_lag",
        when(col("rep_milli") === 0L, lit(0)).otherwise(lagCase))
      .select("doc_id", "n_tokens", "best_lag", "rep_milli")
  }

  /** rep_milli alone as ONE column — the SQL-surface face
    * (`rep_milli(text)` on /query). The token array binds as a LAMBDA
    * VARIABLE (a 1-element transform), so tokenization runs ONCE per
    * row — inlining `tokens(text)` inside the per-position filter
    * lambda would re-split the whole document per position per lag
    * (HOF lambda bodies evaluate per element; nothing hoists them).
    * The count multiplies in LONG (a multi-million-token doc would
    * wrap Int), and floor(double÷) equals integer DIV here: positive
    * operands ≤ 10¹⁰/10⁷, far below where a half-ulp could cross an
    * integer boundary. */
  def periodicityMilli(text: Column): Column =
    element_at(transform(array(tokens(text)), w => {
      val n = size(w)
      def milli(lag: Int): Column =
        when(n > lag,
          floor((lit(1000L) * size(filter(sequence(lit(1), n - lag),
            i => element_at(w, i) === element_at(w, i + lag))).cast("long"))
            .cast("double") / (n - lag)).cast("long"))
          .otherwise(lit(0L))
      greatest((1 to MaxPeriodLag).map(milli): _*)
    }), 1)

  /** DuckDB oracle for [[periodicity]] (same integer DIV, same lag
    * tie-break). */
  def periodicitySql(table: String = "documents"): String = {
    def milli(l: Int) =
      s"""CASE WHEN len(w) > $l THEN
         |    (1000 * len(list_filter(range(1, len(w) - $l + 1),
         |       i -> w[i] = w[i + $l]))) // (len(w) - $l)
         |  ELSE 0 END""".stripMargin
    val ms = (1 to MaxPeriodLag).map(l => s"${milli(l)} AS m$l").mkString(",\n")
    val rep = s"greatest(${(1 to MaxPeriodLag).map(l => s"m$l").mkString(", ")})"
    val lagCase = (1 to MaxPeriodLag)
      .map(l => s"WHEN m$l = rep_milli THEN $l").mkString(" ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') w
       |  FROM $table),
       |m AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, $ms FROM toks),
       |r AS (SELECT *, $rep AS rep_milli FROM m)
       |SELECT doc_id, n_tokens,
       |  CASE WHEN rep_milli = 0 THEN 0 $lagCase ELSE 0 END AS best_lag,
       |  CAST(rep_milli AS BIGINT) AS rep_milli
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Vocabulary-growth (Heaps-law) curve: cumulative token and distinct
    * type counts at `points` doc-id checkpoints, type-token ratio in
    * exact integer per-mille — the corpus statistic that says whether
    * more data still buys new vocabulary (what a tokenizer trainer's
    * vocab cap and a dedup pass's marginal value both track).
    *
    * ONE corpus pass at any checkpoint count: each word's first-seen
    * doc (min doc_id) is a single hash aggregate and per-doc token
    * counts another; both collapse to small frames BEFORE the tiny
    * checkpoint crossJoin, so the whole curve costs two linear shuffles
    * — never one corpus pass per checkpoint. */
  def vocabGrowth(docs: DataFrame, points: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // empty corpus: max() is NULL — degrade to an empty curve like the
    // sibling ops instead of throwing from the driver
    val maxIdRow = Option(docs.agg(max(col("doc_id"))).head().get(0))
    if (maxIdRow.isEmpty)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("cp", "n_tokens", "n_types", "ttr_milli")
    // type-tolerant: an IntegerType doc_id would CCE on asInstanceOf
    // (review r10); Number covers every integral column type
    val maxId = maxIdRow.get.asInstanceOf[Number].longValue()
    val cps = (1 to points)
      .map(k => (maxId * k + (points - 1)) / points).distinct.toDF("cp")
    val tk = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val types = tk.groupBy("w").agg(min(col("doc_id")).as("fs"))
      .crossJoin(broadcast(cps)).filter(col("fs") <= col("cp"))
      .groupBy("cp").agg(count(lit(1)).as("n_types"))
    val toks = tk.groupBy("doc_id").agg(count(lit(1)).as("nt"))
      .crossJoin(broadcast(cps)).filter(col("doc_id") <= col("cp"))
      .groupBy("cp").agg(sum(col("nt")).as("n_tokens"))
    toks.join(types, Seq("cp"))
      .withColumn("ttr_milli",
        expr("(1000 * n_types) DIV greatest(n_tokens, 1L)"))
  }

  /** DuckDB oracle for [[vocabGrowth]] (same checkpoints, same integer
    * ceil, same filters). */
  def vocabGrowthSql(points: Int = 5, table: String = "documents"): String = {
    val ks = (1 to points).map(k => s"($k)").mkString(", ")
    s"""WITH mx AS (SELECT max(doc_id) AS m FROM $table),
       |cps AS (SELECT DISTINCT (m * k + ${points - 1}) // $points AS cp
       |  FROM mx, (VALUES $ks) ks(k)),
       |tk AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(trim(lower(text)), '\\s+')) w
       |    FROM $table)
       |  WHERE length(w) > 0),
       |types AS (
       |  SELECT cp, count(*) AS n_types
       |  FROM (SELECT w, min(doc_id) AS fs FROM tk GROUP BY w), cps
       |  WHERE fs <= cp GROUP BY cp),
       |toks AS (
       |  SELECT cp, CAST(sum(nt) AS BIGINT) AS n_tokens
       |  FROM (SELECT doc_id, count(*) AS nt FROM tk GROUP BY doc_id), cps
       |  WHERE doc_id <= cp GROUP BY cp)
       |SELECT cp, n_tokens, n_types,
       |  (1000 * n_types) // greatest(n_tokens, 1) AS ttr_milli
       |FROM toks JOIN types USING (cp) ORDER BY cp""".stripMargin
  }

  /** The exact-rational salience core shared by [[salientTerms]] (keyed
    * by document) and `DedupOps.clusterCards` (keyed by cluster) — ONE
    * spelling of tf × (N/df), the rank window and the tie-break, so the
    * two faces cannot drift (review r14). `tok` is the exploded
    * (keyCol, t) frame; `n` the 1-row key-count frame. */
  private[ops] def salienceRank(tok: DataFrame, keyCol: String,
                                n: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = tok.groupBy(keyCol, "t").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(keyCol).orderBy(col("score").desc, col("t"))
    tf.join(dfreq, "t").crossJoin(broadcast(n))
      .withColumn("score", col("tf") * (col("n").cast("double") / col("df")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(keyCol), col("t").as("term"), col("score"), col("rk"))
  }

  def salientTerms(docs: DataFrame, k: Int = 3): DataFrame =
    salienceRank(
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("t")),
      "doc_id", docs.agg(count(lit(1)).as("n")), k)

  /** DuckDB oracle for salientTerms (same exact-rational score). */
  def salientTermsSql(k: Int = 3, table: String = "documents"): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) t
       |  FROM $table),
       |tf AS (SELECT doc_id, t, count(*) tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT t, count(*) df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id, t, tf * ((SELECT count(*) FROM $table) * 1.0 / df) AS score
       |  FROM tf JOIN df USING (t)),
       |rk AS (
       |  SELECT doc_id, t, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, t) rk
       |  FROM scored)
       |SELECT doc_id, t AS term, score, rk FROM rk
       |WHERE rk <= $k ORDER BY doc_id, rk""".stripMargin

  // ---- rare-n-gram rate (perplexity proxy): the CCNet-style quality
  //      signal without a log — score each doc by the fraction of its
  //      word n-grams that are rare in the corpus-wide model. High
  //      rare-fraction ≈ high LM surprisal (OOV-ish, noisy, or genuinely
  //      novel text); integer counts + one IEEE division keep it exactly
  //      oracle-replayable where a float log-prob sum would drift. ----
  val RareN = 3
  val RareMaxCount = 2L
  val RareFracMax = 0.95

  /** Per-doc rare-n-gram stats + keep gate:
    * `doc_id, n_grams, n_rare, rare_frac, keep`. The model is the
    * corpus' own n-gram frequency table (train = score corpus, the
    * degenerate-but-standard self-scoring setup); `n_rare` counts gram
    * INSTANCES whose corpus count ≤ maxC.
    *
    * Scale shape: the model groupBy shuffles map-side-combined (gram,
    * count) pairs — Zipf-bounded vocabulary, far below corpus size; the
    * instance⋈model join hashes on the same gram key (the exchange is
    * reusable between the two branches), and the per-doc rollup is the
    * only other shuffle. A pre-trained model table instead of the
    * self-join is the same dataflow minus the model branch. */
  def rareNgramStats(docs: DataFrame, n: Int = RareN,
                     maxC: Long = RareMaxCount): DataFrame = {
    val inst = docs
      .select(col("doc_id"), tokens(col("text")).as("__w"))
      .select(col("doc_id"),
        explode(graft.functions.TextExprs.ngrams(col("__w"), n)).as("g"))
    val model = inst.groupBy("g").agg(count(lit(1)).as("c"))
    inst.join(model, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("c") <= maxC, 1)).as("n_rare"))
      .withColumn("rare_frac",
        round(col("n_rare").cast("double") / col("n_grams"), 6))
      .withColumn("keep", col("rare_frac") <= RareFracMax)
  }

  /** DuckDB oracle for rareNgramStats (same grams, counts, rounding). */
  def rareNgramSql(n: Int = RareN, maxC: Long = RareMaxCount,
                   table: String = "documents"): String = {
    val gram = (0 until n).map(k => s"w[i+$k]").mkString("||' '||")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') w FROM $table),
       |inst AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, len(w) - ${n - 2}), i -> $gram)) g
       |  FROM toks WHERE len(w) >= $n),
       |model AS (SELECT g, count(*) c FROM inst GROUP BY g),
       |per AS (
       |  SELECT doc_id, count(*) AS n_grams,
       |    count(*) FILTER (WHERE c <= $maxC) AS n_rare
       |  FROM inst JOIN model USING (g) GROUP BY doc_id)
       |SELECT doc_id, n_grams, n_rare,
       |  ${OracleSql.roundD("n_rare * 1.0 / n_grams", 6)} AS rare_frac,
       |  (${OracleSql.roundD("n_rare * 1.0 / n_grams", 6)} <= $RareFracMax) AS keep
       |FROM per ORDER BY doc_id""".stripMargin
  }

  // ---- overlapping chunking (RAG/embedding prep): split each document
  //      into fixed-size token windows on a stride, so every token lands
  //      in ≥1 chunk and consecutive chunks overlap by size−stride
  //      tokens — the standard unit-of-indexing transform before
  //      embedding or retrieval. ----
  val ChunkSize = 32
  val ChunkStride = 24

  /** Per-doc overlapping chunks: `doc_id, start_tok, n_tok, chunk_fp`
    * (md5 of the space-joined chunk — the compact equality handle; the
    * chunk text itself is one `array_join` away when a sink wants it).
    * Chunk starts are 1, 1+stride, ... ≤ n_tokens; the last chunk may be
    * short. Map-only (tokenize → one transform → explode): zero
    * shuffles, chunk count ≈ corpus_tokens/stride. */
  /** Chunk rows WITH the chunk text: `doc_id, start_tok, n_tok, text`
    * — the form downstream featurization (p38 retrieval) consumes. */
  def chunkTexts(docs: DataFrame, size: Int = ChunkSize,
                 stride: Int = ChunkStride,
                 passthrough: Seq[String] = Nil): DataFrame = {
    require(size >= 1 && stride >= 1, s"size/stride must be >= 1")
    // stride > size would skip tokens, breaking the every-token-covered
    // invariant documented above
    require(stride <= size, s"stride ($stride) must be <= size ($size)")
    // a passthrough name colliding with the chunker's own output (or its
    // internals) would silently duplicate/shadow a column and surface as
    // AMBIGUOUS_REFERENCE far downstream — fail fast like the guards above
    val reserved = Set("doc_id", "text", "start_tok", "n_tok", "__w", "c")
    require(passthrough.forall(!reserved(_)),
      s"passthrough collides with chunker columns: ${passthrough.filter(reserved)}")
    val w = col("__w")
    val keep = passthrough.map(col)
    // `passthrough` columns ride the map-only explode instead of being
    // re-joined onto the chunk rows afterwards — a per-doc attribute
    // (cluster id, quality) costs zero shuffles this way, where a
    // chunk⋈doc join would reshuffle the whole chunk set at 100 TB
    // tokens materialized in their OWN projection (HOF lambdas re-run
    // captured expressions per element — same trap as DedupOps.shingles)
    docs.select(col("doc_id") +: keep :+ tokens(col("text")).as("__w"): _*)
      .select(col("doc_id") +: keep :+ explode(transform(
        sequence(lit(1), size_(w), lit(stride)),
        s => struct(s.as("start"), slice(w, s, lit(size)).as("toks")))).as("c"): _*)
      .select(col("doc_id") +: keep :++ Seq(col("c.start").as("start_tok"),
        size_(col("c.toks")).as("n_tok"),
        array_join(col("c.toks"), " ").as("text")): _*)
  }

  def chunkDocs(docs: DataFrame, size: Int = ChunkSize,
                stride: Int = ChunkStride): DataFrame =
    chunkTexts(docs, size, stride)
      .select(col("doc_id"), col("start_tok"), col("n_tok"),
        md5(col("text")).as("chunk_fp"))
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** 26-dim letter-count profile of a (lower-cased) text — the cheapest
    * real featurization: integer counts, so every downstream dot
    * product / cosine is exact integer arithmetic under IEEE doubles
    * and replays in SQL with NO rounding tolerance. */
  val Letters: Seq[String] = ('a' to 'z').map(_.toString)
  def letterVector(t: Column): Column =
    graft.functions.VectorExprs.letterCounts(t)

  /** DuckDB rendering of letterVector over `expr`. */
  def letterVectorSql(expr: String): String =
    Letters.map(l => s"CAST(length($expr) - length(replace($expr, '$l', '')) AS BIGINT)")
      .mkString("[", ", ", "]")

  /** DuckDB rendering of chunkTexts (chunk rows WITH the text). */
  def chunkTextsSql(size: Int = ChunkSize, stride: Int = ChunkStride,
                    table: String = "documents"): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') w FROM $table),
       |ch AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, len(w) + 1, $stride),
       |    i -> struct_pack(start := i,
       |                     txt := array_to_string(w[i:i+${size - 1}], ' '),
       |                     nt := len(w[i:i+${size - 1}])))) AS c
       |  FROM toks)
       |SELECT doc_id, c.start AS start_tok, c.nt AS n_tok, c.txt AS text
       |FROM ch ORDER BY doc_id, start_tok""".stripMargin

  /** DuckDB oracle for chunkDocs (same starts, slices, fingerprint). */
  def chunkDocsSql(size: Int = ChunkSize, stride: Int = ChunkStride,
                   table: String = "documents"): String =
    s"""SELECT doc_id, start_tok, n_tok, md5(text) AS chunk_fp
       |FROM (${chunkTextsSql(size, stride, table)})
       |ORDER BY doc_id, start_tok""".stripMargin

  /** Conjunctive keyword search: docs containing ALL `terms`, scored by
    * total occurrence count — the corpus-filtering primitive of a
    * training-data pipeline ("every doc mentioning X and Y").
    *
    * Plan: tokenize → explode → filter to the query terms (a literal
    * IN, evaluated map-side right at the explode — rows for non-query
    * tokens never reach the exchange) → one doc-keyed groupBy asserting
    * all terms matched. Work is linear in corpus tokens with a shuffle
    * of only matching (doc, term) rows; no index build is needed for a
    * one-shot query, and a reusable posting-list table is this same
    * dataflow stopped before the filter. */
  def keywordSearch(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "keywordSearch needs at least one term")
    // a term containing whitespace can never equal a whitespace-split
    // token — the conjunctive filter would silently return zero rows;
    // the caller meant multiple terms (review r10)
    require(terms.forall(!_.exists(_.isWhitespace)),
      "keywordSearch terms are single tokens; split multi-word queries " +
        s"into terms (got: ${terms.filter(_.exists(_.isWhitespace)).mkString("; ")})")
    // lower-case the TERMS too: the tokenizer lower-cases the corpus, so
    // a mixed-case query term would silently match nothing
    val q = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(q: _*))
      .groupBy("doc_id")
      .agg(countDistinct("tok").as("n_terms"), count(lit(1)).as("hits"))
      .filter(col("n_terms") === q.size)
      .select(col("doc_id"), col("hits"))
  }

  /** DuckDB oracle for keywordSearch (same tokenizer as p08/p21). */
  def keywordSearchSql(terms: Seq[String], table: String = "documents"): String = {
    val q = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val inList = q.map(OracleSql.sqlStr).mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) tok
       |  FROM $table),
       |hit AS (
       |  SELECT doc_id, count(DISTINCT tok) AS n_terms, count(*) AS hits
       |  FROM tok WHERE tok IN ($inList) GROUP BY doc_id)
       |SELECT doc_id, hits FROM hit WHERE n_terms = ${q.size}
       |ORDER BY doc_id""".stripMargin
  }

  // ---- vocabulary encoding (tokenizer-id step) ----

  /** Vocabulary capacity for [[vocabEncode]]. */
  val VocabSize = 128

  /** The tokenize-to-ids step every training pipeline runs before
    * sequence packing (p30): build a frequency vocabulary (top
    * [[VocabSize]] tokens by corpus count, ties by token — id 1 =
    * most frequent; 0 = UNK), encode each document as its id sequence,
    * and report per-doc `doc_id, n_tok, n_oov, oov_rate, ids_fp` where
    * `ids_fp` fingerprints the space-joined id sequence in token order
    * (the equality handle for the encoded corpus — the ids themselves
    * are one `collect_list` away when a sink wants them).
    *
    * Scale shape: the vocabulary pass is a token groupBy (map-side
    * combined onto the Zipf-bounded distinct-token domain) topped by a
    * DISTRIBUTED top-V — `orderBy.limit` compiles to
    * TakeOrderedAndProject (per-partition heaps of V, merged), so no
    * single task ever sorts the full token domain (which grows with the
    * corpus per Heaps' law) — and only the ≤V survivors pass through a
    * rank window. The vocab then BROADCASTS onto the exploded tokens
    * (map-side left join — the corpus never shuffles to look up ids),
    * and the per-doc reassembly is the only corpus-keyed exchange.
    * The vocab pass deliberately RESCANS the corpus (explode without
    * positions) rather than sharing the encode pass's subtree: sharing
    * would require a corpus-wide (doc, token) pre-aggregate exchange,
    * and a map-only second scan beats shipping every token over the
    * network — with a fixed external vocabulary (the production path)
    * the pass disappears entirely. */
  def vocabEncode(docs: DataFrame, vocabSize: Int = VocabSize): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "t")))
    val vocab = docs.select(explode(tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("t")).limit(vocabSize)
      // V-bounded rank (the window sees <= vocabSize rows)
      .withColumn("id",
        row_number().over(Window.orderBy(col("__c").desc, col("t"))))
      .select(col("t"), col("id"))
    tok.join(broadcast(vocab), Seq("t"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("id"), lit(0)).as("id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        count(when(col("id") === 0, 1)).as("n_oov"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("id")))),
          x => x.getField("id").cast("string")), " ")).as("ids_fp"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tok"), 6))
      .select("doc_id", "n_tok", "n_oov", "oov_rate", "ids_fp")
  }

  /** DuckDB oracle for vocabEncode (same vocabulary rank, same UNK=0,
    * same in-order id fingerprint). */
  def vocabEncodeSql(vocabSize: Int = VocabSize,
                     table: String = "documents"): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') w
       |  FROM $table),
       |pos AS (
       |  SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM toks),
       |tok AS (SELECT doc_id, i, w[i] AS t FROM pos),
       |vocab AS (
       |  SELECT t, id FROM (
       |    SELECT t, row_number() OVER (ORDER BY count(*) DESC, t) AS id
       |    FROM tok GROUP BY t)
       |  WHERE id <= $vocabSize),
       |enc AS (
       |  SELECT doc_id, i, coalesce(v.id, 0) AS id
       |  FROM tok LEFT JOIN vocab v USING (t)),
       |per AS (
       |  SELECT doc_id, count(*) AS n_tok,
       |    count(*) FILTER (WHERE id = 0) AS n_oov,
       |    md5(array_to_string(list(CAST(id AS VARCHAR) ORDER BY i), ' '))
       |      AS ids_fp
       |  FROM enc GROUP BY doc_id)
       |SELECT doc_id, n_tok, n_oov,
       |  ${OracleSql.roundD("n_oov * 1.0 / n_tok", 6)} AS oov_rate, ids_fp
       |FROM per ORDER BY doc_id""".stripMargin

  // ---- C4-style line-level cleaning ----

  /** Tokens per synthesized line; C4's minimum word count per kept line. */
  val LineTokens = 8
  val MinLineTokens = 5

  /** Rebuild each document as newline-separated lines of [[LineTokens]]
    * tokens with deterministic doc_id-derived blemishes — the corpus has
    * no natural line structure, so it is PLANTED identically in both
    * engines (the PiiOps/MediaGen trick) and the real operator
    * ([[c4Clean]]) is measured on top: line i loses its terminal '.'
    * when (doc_id + i) % 3 = 0 and gains a ' noscript javascript'
    * boilerplate tail when (doc_id + i) % 7 = 0; the final line is a
    * short tail whenever the token count isn't a multiple of
    * LineTokens. Map-only. */
  def withSyntheticLines(docs: DataFrame): DataFrame = {
    val w = col("__w")
    val lineIdx = sequence(lit(0),
      floor((size(w) - 1).cast("double") / LineTokens).cast("int"))
    docs.select(col("doc_id"), tokens(col("text")).as("__w"))
      .select(col("doc_id"), array_join(transform(lineIdx, i =>
        concat(
          array_join(slice(w, i * LineTokens + 1, lit(LineTokens)), " "),
          when((col("doc_id") + i) % 7 === 0, lit(" noscript javascript"))
            .otherwise(lit("")),
          when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
        "\n").as("text"))
  }

  /** DuckDB rendering of withSyntheticLines (same slices, same planted
    * blemishes — both engines clean the identical input). */
  // NB: no line here may START with '|' or '||' — this fragment embeds
  // into outer stripMargin strings (c4CleanSql), whose strip would eat
  // one pipe from a leading '||'
  def syntheticLinesSql(table: String = "documents"): String =
    s"""SELECT doc_id, array_to_string(list_transform(
       |    range(0, (len(w) - 1) // $LineTokens + 1),
       |    i -> array_to_string(w[i*$LineTokens+1:i*$LineTokens+$LineTokens], ' ') ||
       |      (CASE WHEN (doc_id + i) % 7 = 0 THEN ' noscript javascript' ELSE '' END) ||
       |      (CASE WHEN (doc_id + i) % 3 != 0 THEN '.' ELSE '' END)),
       |  chr(10)) AS text
       |FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') w
       |      FROM $table)""".stripMargin

  /** The C4 line gate: terminal punctuation, ≥ MinLineTokens words, no
    * boilerplate marker. Shared by c4Clean and the SQL surface. */
  private def lineGate(l: Column): Column =
    l.endsWith(".") &&
      org.apache.spark.sql.functions.size(split(l, " ")) >= MinLineTokens &&
      !l.contains("javascript")

  /** c4Clean's text→text core as ONE scalar expression (SQL surface:
    * `clean_lines(text)`): split on newlines, gate each line, re-join
    * the survivors. */
  def cleanLines(text: Column): Column =
    array_join(filter(split(text, "\n"), l => lineGate(l)), "\n")

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2, the
    * heuristics expressible over this corpus): keep only lines that end
    * in terminal punctuation, have ≥ [[MinLineTokens]] words, and carry
    * no 'javascript' boilerplate. Returns per-doc
    * `(doc_id, n_lines, n_kept, clean_fp)` where clean_fp fingerprints
    * the cleaned text (kept lines re-joined).
    *
    * Lines materialize as a column ONCE (`__l`), then the gate runs as
    * an array filter over it — pure column expressions, map-only, zero
    * shuffle: the same 100 TB shape as the p08/p09/p31 text sweeps
    * (linear in corpus bytes, parallelism = scan tasks). */
  def c4Clean(lined: DataFrame): DataFrame = {
    val kept = filter(col("__l"), l => lineGate(l))
    lined.select(col("doc_id"), split(col("text"), "\n").as("__l"))
      .select(col("doc_id"), col("__l"), kept.as("__k"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(col("__l")).as("n_lines"),
        org.apache.spark.sql.functions.size(col("__k")).as("n_kept"),
        md5(array_join(col("__k"), "\n")).as("clean_fp"))
  }

  // ---- Unicode text hygiene: NFC normalization + control-char strip +
  //      mojibake (U+FFFD) counting ----

  /** Control characters stripped by textHygiene: C0 minus NUL (SQL
    * literals can't carry it) and minus TAB/LF/CR — standard corpus
    * hygiene (C4/CCNet) PRESERVES whitespace controls, since newlines
    * carry the line structure p41 cleans on. Planted blemishes use BEL.
    * Java regex and RE2 read the \xhh escapes identically. */
  val CtlRegex = "[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"

  /** Plant deterministic Unicode blemishes (the corpus is clean ASCII —
    * same trick as withSyntheticLines): every doc gains a trailing
    * "café" spelled DECOMPOSED (e + U+0301) on even doc_ids and
    * precomposed (U+00E9) on odd ones, plus a BEL control char when
    * doc_id % 5 = 0 and a U+FFFD mojibake marker when doc_id % 7 = 0. */
  def withSyntheticMojibake(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(col("text"),
      when(col("doc_id") % 2 === 0, lit(" cafe\u0301")) // e + combining acute
        .otherwise(lit(" caf\u00e9")),                   // precomposed e-acute
      when(col("doc_id") % 5 === 0, lit("\u0007")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("\ufffd")).otherwise(lit(""))).as("text"))

  /** Unicode hygiene pass: count + strip control characters and U+FFFD
    * mojibake markers, NFC-normalize (composed/decomposed
    * spellings of the same text unify — without this, exact dedup and
    * every fingerprint see two distinct documents where a human sees
    * one), and fingerprint the normalized text. Returns
    * `(doc_id, n_ctl, n_bad, changed, fp)`.
    *
    * Map-only, zero shuffle; `nfc` is the codegen'd Catalyst expression
    * (graft.functions.NfcNormalize) with an already-normalized fast
    * path, so the common all-ASCII row costs one scan and no
    * allocation. */
  def textHygiene(docs: DataFrame): DataFrame = {
    import graft.functions.NfcNormalize.nfc
    val raw = col("text")
    docs.select(col("doc_id"),
        (length(raw) - length(regexp_replace(raw, CtlRegex, ""))).as("n_ctl"),
        (length(raw) - length(regexp_replace(raw, "\\ufffd", ""))).as("n_bad"),
        regexp_replace(regexp_replace(raw, CtlRegex, ""), "\\ufffd", "")
          .as("__clean"))
      .select(col("doc_id"), col("n_ctl"), col("n_bad"),
        col("__clean"), nfc(col("__clean")).as("__norm"))
      .select(col("doc_id"), col("n_ctl"), col("n_bad"),
        (col("__norm") =!= col("__clean")).as("changed"),
        md5(col("__norm")).as("fp"))
  }

  /** DuckDB oracle for textHygiene over withSyntheticMojibake — DuckDB's
    * nfc_normalize implements the same UAX #15 as java.text.Normalizer,
    * so the normalized bytes (and their md5) agree engine-to-engine. */
  def textHygieneSql(table: String = "documents"): String =
    s"""WITH moj AS (
       |  SELECT doc_id, text ||
       |    (CASE WHEN doc_id % 2 = 0 THEN ' cafe' || chr(769)
       |          ELSE ' caf' || chr(233) END) ||
       |    (CASE WHEN doc_id % 5 = 0 THEN chr(7) ELSE '' END) ||
       |    (CASE WHEN doc_id % 7 = 0 THEN chr(65533) ELSE '' END) AS text
       |  FROM $table),
       |c AS (
       |  SELECT doc_id,
       |    length(text) - length(regexp_replace(text, '$CtlRegex', '', 'g')) AS n_ctl,
       |    length(text) - length(replace(text, chr(65533), '')) AS n_bad,
       |    replace(regexp_replace(text, '$CtlRegex', '', 'g'), chr(65533), '') AS clean
       |  FROM moj)
       |SELECT doc_id, n_ctl, n_bad,
       |  nfc_normalize(clean) != clean AS changed,
       |  md5(nfc_normalize(clean)) AS fp
       |FROM c ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for c4Clean over withSyntheticLines. */
  def c4CleanSql(table: String = "documents"): String =
    s"""WITH lined AS (${syntheticLinesSql(table)}),
       |f AS (
       |  SELECT doc_id, string_split(text, chr(10)) AS l FROM lined),
       |g AS (
       |  SELECT doc_id, l, list_filter(l, x ->
       |    ends_with(x, '.') AND len(string_split(x, ' ')) >= $MinLineTokens
       |    AND NOT contains(x, 'javascript')) AS k
       |  FROM f)
       |SELECT doc_id, len(l) AS n_lines, len(k) AS n_kept,
       |  md5(coalesce(array_to_string(k, chr(10)), '')) AS clean_fp
       |FROM g ORDER BY doc_id""".stripMargin
}
