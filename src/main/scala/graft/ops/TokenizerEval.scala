package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer EVALUATION: the per-language fertility table comparing the
  * two trained tokenizers (BPE p51/p52 vs unigram-LM p60/p61).
  * Fertility — pieces emitted per word — is THE cross-lingual tokenizer
  * metric (a tokenizer trained on English-heavy data fragments other
  * scripts; fertility per language is how that bias is measured and
  * reported, e.g. in the XLM-R and NLLB tokenizer analyses). Closing
  * the loop train → encode → EVALUATE is what makes the tokenizer ops a
  * usable pipeline rather than two artifacts.
  *
  * Exact-replay discipline: all sums are integers; the fertility ratio
  * is integer millis ((1000·pieces) DIV words), so the report replays
  * bit-for-bit from the same trained artifacts the p52/p61 oracles
  * already render. Docs whose token stream is empty under a tokenizer's
  * hygiene (BPE strips the frame char; both drop empty tokens) carry no
  * encode row and drop from the joined report in BOTH engines.
  *
  * Scale: two map-only encode passes + one language rollup
  * (dimension-sized result); the per-doc joins ride the doc_id key the
  * encodes already group on. */
object TokenizerEval {

  /** Per-language fertility: `lang, n_docs, bpe_tok, bpe_pieces,
    * bpe_fert_milli, uni_tok, uni_pieces, uni_fert_milli`.
    *
    * r15 optimization (guide §2.3 "aggregate before you shuffle" /
    * §2.4): ONE map-only projection through the artifact-bound scalar
    * encodes — [[BpeOps.encodePiecesCol]] (p80's face, spec-pinned ≡
    * the batch [[BpeOps.encode]] rollup) and
    * [[graft.functions.UnigramEncode]] (p81's face, spec-pinned ≡
    * [[UnigramOps.encodeDocs]]) — followed by the language rollup.
    * The previous spelling ([[fertilityReportJoined]], kept as the
    * equality-spec reference) ran both batch encodes (a token explode +
    * doc_id aggregate each, plus the distinct-word broadcast join) and
    * re-joined the per-doc rows onto docs: three corpus-row shuffles
    * and two extra scans for the same numbers. The inner-join row
    * domain is reproduced exactly: a doc appears iff BOTH encodes
    * produced a row — BPE ⇔ ≥ 1 kept token (non-empty after the `|`
    * strip), unigram ⇔ ≥ 1 word under PieceCountBase code points; NULL
    * text nulls both structs and the filter drops it in either
    * spelling. */
  def fertilityReport(docs: DataFrame, merges: Seq[BpeOps.Merge],
                      pieces: Seq[UnigramOps.Piece]): DataFrame = {
    val costs = pieces.map(p => p.piece -> p.qcost).toMap
    val uniExpr = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.UnigramEncode(
        org.apache.spark.sql.GraftColumnBridge.toExpression(col("text")), costs))
    docs
      .select(col("lang"),
        BpeOps.encodePiecesCol(col("text"), merges).as("__bp"),
        uniExpr.as("__u"))
      .filter(size(col("__bp")) > 0 && col("__u")("n_words") > 0)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("__bp")).cast("long")).as("bpe_tok"),
        sum(aggregate(col("__bp"), lit(0L), (a, ps) => a + size(ps)))
          .as("bpe_pieces"),
        sum(col("__u")("n_words")).as("uni_tok"),
        sum(col("__u")("total_pieces")).as("uni_pieces"))
      .select(col("lang"), col("n_docs"),
        col("bpe_tok"), col("bpe_pieces"),
        expr("(1000 * bpe_pieces) DIV greatest(bpe_tok, 1L)")
          .as("bpe_fert_milli"),
        col("uni_tok"), col("uni_pieces"),
        expr("(1000 * uni_pieces) DIV greatest(uni_tok, 1L)")
          .as("uni_fert_milli"))
  }

  /** The pre-r15 joined spelling — the two batch encodes re-joined on
    * doc_id — kept as the equality-spec reference for
    * [[fertilityReport]] (TokenizerEvalSpec pins new ≡ old on an
    * edge corpus; the DuckDB oracle gates the declared face). */
  def fertilityReportJoined(docs: DataFrame, merges: Seq[BpeOps.Merge],
                            pieces: Seq[UnigramOps.Piece]): DataFrame = {
    val bpe = BpeOps.encode(docs, merges)
      .select(col("doc_id"), col("n_tok").as("bpe_tok"),
        col("n_pieces").as("bpe_pieces"))
    val uni = UnigramOps.encodeDocs(docs, pieces)
      .select(col("doc_id"), col("n_words").as("uni_tok"),
        col("total_pieces").as("uni_pieces"))
    docs.select(col("doc_id"), col("lang"))
      .join(bpe, "doc_id").join(uni, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bpe_tok")).as("bpe_tok"),
        sum(col("bpe_pieces")).as("bpe_pieces"),
        sum(col("uni_tok")).as("uni_tok"),
        sum(col("uni_pieces")).as("uni_pieces"))
      .select(col("lang"), col("n_docs"),
        col("bpe_tok"), col("bpe_pieces"),
        expr("(1000 * bpe_pieces) DIV greatest(bpe_tok, 1L)")
          .as("bpe_fert_milli"),
        col("uni_tok"), col("uni_pieces"),
        expr("(1000 * uni_pieces) DIV greatest(uni_tok, 1L)")
          .as("uni_fert_milli"))
  }

  /** DuckDB oracle: the p52 and p61 per-doc encode oracles embedded as
    * subqueries (each carries its own WITH), joined on doc_id and
    * rolled up per language with the same integer-milli ratios. */
  def fertilitySql(merges: Seq[BpeOps.Merge],
                   pieces: Seq[UnigramOps.Piece],
                   table: String = "documents"): String =
    s"""WITH bpe AS (
       |  SELECT * FROM (
       |${BpeOps.bpeEncodeSql(merges, table).linesIterator.map("    " + _).mkString("\n")}
       |  )),
       |uni AS (
       |  SELECT * FROM (
       |${UnigramOps.encodeDocsSql(pieces, table).linesIterator.map("    " + _).mkString("\n")}
       |  ))
       |SELECT d.lang, count(*) AS n_docs,
       |  CAST(sum(b.n_tok) AS BIGINT) AS bpe_tok,
       |  CAST(sum(b.n_pieces) AS BIGINT) AS bpe_pieces,
       |  (1000 * CAST(sum(b.n_pieces) AS BIGINT))
       |    // greatest(CAST(sum(b.n_tok) AS BIGINT), 1) AS bpe_fert_milli,
       |  CAST(sum(u.n_words) AS BIGINT) AS uni_tok,
       |  CAST(sum(u.total_pieces) AS BIGINT) AS uni_pieces,
       |  (1000 * CAST(sum(u.total_pieces) AS BIGINT))
       |    // greatest(CAST(sum(u.n_words) AS BIGINT), 1) AS uni_fert_milli
       |FROM $table d
       |JOIN bpe b ON d.doc_id = b.doc_id
       |JOIN uni u ON d.doc_id = u.doc_id
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
}
