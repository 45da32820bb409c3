package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training + encode (Kudo, "Subword
  * Regularization", ACL 2018 — the SentencePiece algorithm), the second
  * real-world tokenizer beside BPE (p51/p52): BPE GROWS a vocabulary by
  * merging; unigram-LM SHRINKS one — seed with many candidate pieces,
  * EM-estimate piece probabilities against the corpus, prune to the
  * target size. Tokenization is then the min-cost segmentation under
  * per-piece costs (Viterbi), not a replace chain.
  *
  * Exact-replay discipline (the p44/p51 devices):
  *  - piece costs are QUANTIZED-BIT integers (llog2 bit lengths), so
  *    segmentation DP is pure integer arithmetic in both engines;
  *  - a segmentation's reported (cost, n_pieces) is derived from ONE
  *    number: cost' = Σ(per-piece cost·PieceCountBase) + n_pieces — the DP
  *    minimizes cost', so ANY optimal segmentation yields the same
  *    (cost, n_pieces) and the oracle never needs to replicate
  *    tie-breaking among equal-cost segmentations;
  *  - unknown single characters step at [[UnkCost]] (piece costs clamp
  *    strictly below it), so every word is segmentable and the DP's
  *    option set is identical in both engines;
  *  - the DuckDB oracle re-derives every word's optimal cost' with a
  *    recursive CTE over the RENDERED piece table — UNION (dedup)
  *    recursion bounds the state space to positions × distinct costs,
  *    so long words cannot explode the path count.
  *
  * Scale shape: training is driver-local over a capped word histogram
  * (top [[MaxTrainWords]] by frequency — Heaps' law keeps the head
  * representative at any corpus size; the same cap discipline as
  * BpeOps). ENCODING is fully distributed: the corpus's distinct words
  * (Heaps-bounded) Viterbi-segment in mapPartitions with the ~100-row
  * piece table broadcast, and per-doc rollups join the word results
  * back — the corpus text never shuffles, and no per-document work
  * happens on the driver. */
object UnigramOps {
  /** Longest candidate piece. */
  val MaxPieceLen = 4

  /** Training histogram cap (driver working set; Heaps-bounded head). */
  val MaxTrainWords = 8192

  /** Seed candidates kept before EM (plus all single characters). */
  val SeedSize = 512

  /** Final vocabulary size after pruning (plus all single characters). */
  val VocabSize = 96

  /** EM iterations (E: Viterbi counts, M: re-quantized costs). */
  val EmIters = 3

  /** Cost of stepping one UNKNOWN character; piece costs clamp to
    * [1, UnkCost-1] so a known piece always beats the unk step. */
  val UnkCost = 64L

  /** cost' = cost·PieceCountBase + n_pieces: one number the DP
    * minimizes, decoding to (cost, n_pieces) for ANY optimal
    * segmentation. 4096 bounds piece count per word — no natural token
    * approaches it, and the DP would reject longer state anyway. */
  val PieceCountBase = 4096L

  /** A trained piece: surface form and quantized-bit cost. */
  final case class Piece(piece: String, qcost: Long)

  /** floor(log2(x+1)) — bit length of x+1, the shared quantized log. */
  private def llog2(x: Long): Long =
    63 - java.lang.Long.numberOfLeadingZeros(x + 1)

  // ---- training (driver-local over the capped histogram) ----

  /** Collect the top-[[MaxTrainWords]] word histogram (freq desc, word
    * asc — the deterministic head) from one distributed corpus pass. */
  def wordHistogram(docs: DataFrame, cap: Int = MaxTrainWords): Seq[(String, Long)] =
    docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      // same oversized-word skip as segmentWords: one pathological
      // token must not abort training's driver-side EM
      .filter(length(col("w")) > 0 && length(col("w")) < PieceCountBase)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(cap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Train the piece table: seed (all chars + top substring candidates
    * by corpus weight), EM iterations of Viterbi-count / re-quantize,
    * prune to [[VocabSize]] multi-char pieces + all single chars. */
  def train(docs: DataFrame): Seq[Piece] = trainOn(wordHistogram(docs))

  def trainOn(hist: Seq[(String, Long)]): Seq[Piece] = {
    if (hist.isEmpty) return Seq.empty
    // candidate substrings weighted by (occurrences in word) × word freq.
    // All indexing is in CODE POINTS (DuckDB's length/substr semantics),
    // never UTF-16 units: a supplementary-plane char is ONE position in
    // both engines and no candidate can be a lone surrogate.
    val weight = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- hist) {
      val cp = codePoints(w)
      for (l <- 1 to MaxPieceLen; i <- 0 to cp.length - l)
        weight.updateWith(cp.slice(i, i + l).mkString)(c =>
          Some(c.getOrElse(0L) + f))
    }
    def nCp(p: String) = p.codePointCount(0, p.length)
    val chars = weight.keys.filter(nCp(_) == 1).toSeq.sorted
    val multis = weight.filter(kv => nCp(kv._1) > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(SeedSize).map(_._1)
    var vocab: Seq[String] = chars ++ multis
    // init costs from raw weights, then EM
    var costs: Map[String, Long] = quantize(vocab.map(p => p -> weight(p)).toMap)
    for (it <- 1 to EmIters) {
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, f) <- hist; p <- segment(w, costs)._3)
        usage.updateWith(p)(c => Some(c.getOrElse(0L) + f))
      if (it == EmIters) {
        // prune: all single chars + top multi-char pieces by usage
        val keptMultis = usage.filter(kv => nCp(kv._1) > 1).toSeq
          .sortBy { case (p, c) => (-c, p) }.take(VocabSize).map(_._1)
        vocab = chars ++ keptMultis
      }
      costs = quantize(vocab.map(p => p -> usage.getOrElse(p, 0L)).toMap)
    }
    costs.toSeq.sortBy(_._1).map { case (p, c) => Piece(p, c) }
  }

  /** Quantized-bit costs from usage counts: llog2(total) − llog2(count),
    * clamped to [1, UnkCost−1]. Unused pieces cost the ceiling. */
  private def quantize(usage: Map[String, Long]): Map[String, Long] = {
    val total = usage.values.sum
    usage.map { case (p, c) =>
      p -> math.min(UnkCost - 1, math.max(1L, llog2(total) - llog2(c)))
    }
  }

  /** Min-cost' segmentation of one word: (cost, nPieces, pieces).
    * cost' = cost·PieceCountBase + nPieces is the minimized objective; unknown
    * characters step at [[UnkCost]]. */
  def segment(w: String, costs: Map[String, Long]): (Long, Long, Seq[String]) = {
    val cp = codePoints(w)
    val n = cp.length
    if (n == 0) return (0L, 0L, Seq.empty)
    // the cost' decode needs n_pieces < PieceCountBase; a single token
    // this long is corpus pathology (base64 blob, DNA string) that the
    // hygiene passes (p41/p43 line gates) cap upstream in a real
    // pipeline — fail loud rather than publish wrapped numbers
    require(n < PieceCountBase,
      s"word of $n code points exceeds PieceCountBase=$PieceCountBase")
    val INF = Long.MaxValue / 4
    val dp = Array.fill(n + 1)(INF)
    val back = new Array[Int](n + 1) // chosen piece length at each end pos
    dp(0) = 0L
    for (i <- 1 to n) {
      // the always-available unk step (one code point)
      if (dp(i - 1) < INF && dp(i - 1) + UnkCost * PieceCountBase + 1 < dp(i)) {
        dp(i) = dp(i - 1) + UnkCost * PieceCountBase + 1; back(i) = 1
      }
      for (l <- 1 to math.min(MaxPieceLen, i)) {
        costs.get(cp.slice(i - l, i).mkString).foreach { c =>
          val cand = dp(i - l) + c * PieceCountBase + 1
          if (dp(i - l) < INF && cand < dp(i)) { dp(i) = cand; back(i) = l }
        }
      }
    }
    val pieces = scala.collection.mutable.ListBuffer.empty[String]
    var i = n
    while (i > 0) { pieces.prepend(cp.slice(i - back(i), i).mkString); i -= back(i) }
    (dp(n) / PieceCountBase, dp(n) % PieceCountBase, pieces.toList)
  }

  /** The word as an array of single-code-point strings — the unit of
    * every index here (matches DuckDB's length/substr semantics). */
  private def codePoints(w: String): Array[String] =
    w.codePoints().toArray.map(c => new String(Character.toChars(c)))

  // ---- distributed encode ----

  /** Per-distinct-word segmentation results `(w, cost_q, n_pieces)`:
    * the words DataFrame shards the Heaps-bounded vocabulary, each task
    * runs the integer DP locally with the broadcast piece table. */
  def segmentWords(words: DataFrame, pieces: Seq[Piece]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pieces.map(p => p.piece -> p.qcost).toMap)
    // words at/over PieceCountBase code points are SKIPPED, not thrown
    // on: segment's fail-loud require would kill the whole distributed
    // encode on one pathological token (base64 blob, DNA string), and
    // the SQL oracle — which shares this filter (length(w) here and in
    // DuckDB both count code points) — would otherwise silently wrap
    // via % PieceCountBase and publish wrong numbers. Both engines drop
    // the same words, so encode rollups stay differential.
    words.select(col("w")).filter(length(col("w")) < PieceCountBase)
      .as[String].mapPartitions { it =>
        val costs = bc.value
        it.map { w => val (c, n, _) = segment(w, costs); (w, c, n) }
      }.toDF("w", "cost_q", "n_pieces")
  }

  /** Training table query (p60): the top-`show` corpus words with their
    * frequency and optimal (cost_q, n_pieces) under the trained pieces.
    * The word head and frequencies re-derive in SQL; the DP re-derives
    * from the rendered piece table. */
  def trainTable(docs: DataFrame, pieces: Seq[Piece], show: Int = 200): DataFrame = {
    val freqs = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(show)
    freqs.join(segmentWords(freqs, pieces), "w")
      .select(col("w").as("word"), col("freq"), col("cost_q"), col("n_pieces"))
  }

  /** Per-document encode rollup (p61): `doc_id, n_words, total_pieces,
    * total_cost` — tokens join their word's segmentation result (word
    * table broadcast at this scale; hash join once it outgrows one). */
  def encodeDocs(docs: DataFrame, pieces: Seq[Piece]): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val words = segmentWords(toks.select("w").distinct(), pieces)
    toks.join(broadcast(words), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("total_pieces"),
        sum(col("cost_q")).as("total_cost"))
  }

  // ---- DuckDB oracle ----

  /** SQL string literal — the ONE shared escaping spelling. */
  private def sqlStr(s: String): String = OracleSql.sqlStr(s)

  /** Rendered piece table as VALUES rows. An empty model would render
    * `VALUES ` — invalid SQL that fails at differential-compare time
    * far from the cause (review r10; the bpeTrainSql require is the
    * precedent) — so it fails fast here instead. */
  private def piecesValues(pieces: Seq[Piece]): String = {
    require(pieces.nonEmpty,
      "unigram oracle needs a non-empty piece table (train produced none)")
    pieces.map(p => s"(${sqlStr(p.piece)}, ${p.qcost})")
      .mkString(", ")
  }

  /** Recursive-CTE Viterbi over the rendered pieces: for every word in
    * `wordsCte` (column `w`), the minimal cost' reachable at each
    * position; UNION (not UNION ALL) dedups (w, pos, acc) states so the
    * state space stays positions × distinct costs. The final min per
    * word yields (cost_q, n_pieces) via DIV/MOD PieceCountBase — any optimal
    * segmentation agrees, so no tie-break needs replaying. */
  private def dpSql(pieces: Seq[Piece]): String =
    s"""pieces(p, qc) AS (VALUES ${piecesValues(pieces)}),
       |steps(p, qc) AS (
       |  SELECT p, CAST(qc AS BIGINT) FROM pieces
       |  UNION ALL SELECT CAST(NULL AS VARCHAR), $UnkCost),
       |dp AS (
       |  SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS acc FROM words
       |  UNION
       |  SELECT d.w, d.pos + coalesce(length(s.p), 1) AS pos,
       |    d.acc + s.qc*$PieceCountBase + 1 AS acc
       |  FROM dp d JOIN steps s
       |    ON (s.p IS NULL OR substr(d.w, d.pos + 1, length(s.p)) = s.p)
       |  WHERE d.pos < length(d.w)
       |),
       |seg AS (
       |  SELECT w, min(acc) AS best FROM dp
       |  WHERE pos = length(w) GROUP BY w)""".stripMargin

  /** Oracle for [[trainTable]] (p60). */
  def trainTableSql(pieces: Seq[Piece], show: Int = 200,
                    table: String = "documents"): String =
    s"""WITH RECURSIVE freqs AS (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |    FROM $table)
       |  WHERE length(w) > 0
       |  GROUP BY w ORDER BY freq DESC, w LIMIT $show),
       |words AS (SELECT w FROM freqs WHERE length(w) < $PieceCountBase),
       |${dpSql(pieces)}
       |SELECT f.w AS word, f.freq,
       |  s.best // $PieceCountBase AS cost_q, s.best % $PieceCountBase AS n_pieces
       |FROM freqs f JOIN seg s ON f.w = s.w
       |ORDER BY word""".stripMargin

  /** Oracle for [[encodeDocs]] (p61). */
  def encodeDocsSql(pieces: Seq[Piece], table: String = "documents"): String =
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |  FROM $table),
       |words AS (SELECT DISTINCT w FROM toks
       |  WHERE length(w) > 0 AND length(w) < $PieceCountBase),
       |${dpSql(pieces)}
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(s.best % $PieceCountBase) AS BIGINT) AS total_pieces,
       |  CAST(sum(s.best // $PieceCountBase) AS BIGINT) AS total_cost
       |FROM toks t JOIN seg s ON t.w = s.w
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
