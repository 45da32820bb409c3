package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenizerEvalSpec extends SparkSpec {
  import spark.implicits._

  // structural separation: every "xx" word fits in ONE max-length piece
  // (length <= MaxPieceLen), every "yy" word needs at least two — so
  // fertility(xx) = exactly 1.0 and fertility(yy) >= 2.0 under ANY
  // trained vocabulary
  private def corpus = ((0L until 20L).map(i =>
    (i, "bana bana pear bana pear lime", "xx")) ++
    (20L until 30L).map(i =>
      (i, s"qwzxjvkp$i mxyqwvzj$i qwzxmxyq$i", "yy")))
    .toDF("doc_id", "text", "lang")

  test("fertility separates compressible from incompressible languages") {
    val merges = BpeOps.train(corpus)
    val pieces = UnigramOps.train(corpus)
    val r = TokenizerEval.fertilityReport(corpus, merges, pieces)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("xx", "yy"))
    val (xx, yy) = (r("xx"), r("yy"))
    assert(xx.getAs[Long]("n_docs") == 20 && yy.getAs[Long]("n_docs") == 10)
    // short trained words cost one piece; long words at least two
    assert(xx.getAs[Long]("uni_fert_milli") == 1000L,
      s"unigram xx: ${xx.getAs[Long]("uni_fert_milli")}")
    assert(yy.getAs[Long]("uni_fert_milli") >= 2000L,
      s"unigram yy: ${yy.getAs[Long]("uni_fert_milli")}")
    // BPE merges have no piece-length cap (a whole frequent word can
    // become one piece), so only the weak ordering is structural
    assert(xx.getAs[Long]("bpe_fert_milli") <= yy.getAs[Long]("bpe_fert_milli"))
    // integer-milli ratios are exactly (1000*pieces) div words
    for (row <- Seq(xx, yy)) {
      assert(row.getAs[Long]("bpe_fert_milli") ==
        1000 * row.getAs[Long]("bpe_pieces") / row.getAs[Long]("bpe_tok"))
      assert(row.getAs[Long]("uni_fert_milli") ==
        1000 * row.getAs[Long]("uni_pieces") / row.getAs[Long]("uni_tok"))
    }
  }

  test("map-only spelling == joined spelling, including row-domain edges (r15)") {
    val merges = BpeOps.train(corpus)
    val pieces = UnigramOps.train(corpus)
    val longWord = "z" * UnigramOps.PieceCountBase.toInt // unigram skips it
    val edge = (corpus.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))) ++ Seq(
      (100L, null, "xx"),              // NULL text: drops in both
      (101L, "", "xx"),                // empty: BPE no kept token
      (102L, "|", "xx"),               // only the frame char: strips empty
      (103L, "   ", "yy"),             // whitespace-only
      (104L, s"$longWord $longWord", "yy"), // BPE row, NO unigram row
      (105L, s"bana $longWord", "xx"), // unigram counts 1 word, BPE 2 toks
      (106L, "bana|pear lime", "yy"))) // strip rejoins into one token
      .toSeq.toDF("doc_id", "text", "lang")
    val a = TokenizerEval.fertilityReport(edge, merges, pieces)
      .orderBy("lang").collect().map(_.toSeq)
    val b = TokenizerEval.fertilityReportJoined(edge, merges, pieces)
      .orderBy("lang").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("rollup equals per-doc recomputation") {
    val merges = BpeOps.train(corpus)
    val pieces = UnigramOps.train(corpus)
    val perDoc = UnigramOps.encodeDocs(corpus, pieces)
      .agg(sum("n_words"), sum("total_pieces")).head()
    val report = TokenizerEval.fertilityReport(corpus, merges, pieces)
      .agg(sum("uni_tok"), sum("uni_pieces")).head()
    assert(report.getLong(0) == perDoc.getLong(0))
    assert(report.getLong(1) == perDoc.getLong(1))
  }
}
