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
