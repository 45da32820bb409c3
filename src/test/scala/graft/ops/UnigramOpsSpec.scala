package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 30L).map { i =>
    // heavy repetition of a few stems -> EM should carve them as pieces
    (i, "interna interna tional tional internation alpha beta " +
      s"internationalization x$i")
  }.toDF("doc_id", "text")

  test("DP segmentation is cost'-optimal vs brute-force enumeration") {
    val pieces = UnigramOps.trainOn(Seq(("abab", 10L), ("abcd", 5L), ("cdcd", 7L)))
    val costs = pieces.map(p => p.piece -> p.qcost).toMap
    def brute(w: String): Long = {
      // enumerate all segmentations into chunks of length 1..MaxPieceLen
      def go(pos: Int): Seq[Long] =
        if (pos == w.length) Seq(0L)
        else (1 to math.min(UnigramOps.MaxPieceLen, w.length - pos)).flatMap { l =>
          val p = w.substring(pos, pos + l)
          val stepCosts =
            costs.get(p).map(_ * UnigramOps.PieceCountBase + 1).toSeq ++
              (if (l == 1) Seq(UnigramOps.UnkCost * UnigramOps.PieceCountBase + 1)
               else Seq.empty)
          stepCosts.flatMap(sc => go(pos + l).map(_ + sc))
        }
      go(0).min
    }
    for (w <- Seq("abab", "abcd", "cdab", "abcdcd", "a", "zzzz", "abcdabab")) {
      val (c, n, segs) = UnigramOps.segment(w, costs)
      assert(c * UnigramOps.PieceCountBase + n == brute(w), s"word $w")
      assert(segs.mkString == w, s"tiling broken for $w: $segs")
    }
  }

  test("EM carves repeated stems into multi-char pieces") {
    val pieces = UnigramOps.train(corpus)
    val multi = pieces.filter(_.piece.length > 1).map(_.piece).toSet
    assert(multi.nonEmpty, "no multi-char pieces trained")
    // the dominant stems are 4-char windows of the repeated words
    assert(multi.exists(p => "international".contains(p) && p.length >= 2),
      s"no stem piece found in $multi")
    val costs = pieces.map(p => p.piece -> p.qcost).toMap
    // a trained word segments into fewer pieces than its length
    val (_, n, _) = UnigramOps.segment("interna", costs)
    assert(n < "interna".length, s"no compression: $n pieces")
  }

  test("unknown characters segment at UnkCost, never fail") {
    val pieces = UnigramOps.trainOn(Seq(("abc", 5L)))
    val costs = pieces.map(p => p.piece -> p.qcost).toMap
    val (c, n, segs) = UnigramOps.segment("abé", costs) // é unseen
    assert(n == segs.length && segs.mkString == "abé")
    assert(c >= UnigramOps.UnkCost, s"unk char cost $c below UnkCost")
  }

  test("encodeDocs rolls up exactly and is partitioning-invariant") {
    val pieces = UnigramOps.train(corpus)
    val out = UnigramOps.encodeDocs(corpus, pieces).cache()
    assert(out.count() == 30)
    // cross-check one doc against driver-side segmentation
    val costs = pieces.map(p => p.piece -> p.qcost).toMap
    val row = out.filter($"doc_id" === 3L).collect().head
    val words = "interna interna tional tional internation alpha beta internationalization x3"
      .split(" ")
    val exp = words.map(w => UnigramOps.segment(w, costs))
    assert(row.getAs[Long]("n_words") == words.length)
    assert(row.getAs[Long]("total_pieces") == exp.map(_._2).sum)
    assert(row.getAs[Long]("total_cost") == exp.map(_._1).sum)
    def rows(parts: Int) =
      UnigramOps.encodeDocs(corpus.repartition(parts), pieces)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    assert(rows(1) == rows(13))
    out.unpersist()
  }

  test("training is deterministic and pieces respect the cost clamp") {
    val a = UnigramOps.train(corpus)
    val b = UnigramOps.train(corpus)
    assert(a == b)
    assert(a.forall(p => p.qcost >= 1 && p.qcost < UnigramOps.UnkCost))
    // every single char of the histogram head is present (coverage)
    val chars = a.filter(_.piece.length == 1).map(_.piece.head).toSet
    assert(Set('a', 'i', 'n', 't').subsetOf(chars), chars)
  }

  test("UnigramEncode expression == encodeDocs rollup (p81's binding)") {
    import org.apache.spark.sql.GraftColumnBridge
    val docs = Seq(
      (0L, "interna tional internationalization alpha"),
      (1L, "xyz qqq"),          // unknown-heavy: unk steps, never fails
      (2L, ""),                 // empty -> no row on either face
      (3L, "naïve café naïve")) // non-ASCII: code-point indexing
      .toDF("doc_id", "text")
    val pieces = UnigramOps.train(corpus)
    val costs = pieces.map(p => p.piece -> p.qcost).toMap
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    val u = GraftColumnBridge.column(graft.functions.UnigramEncode(
      GraftColumnBridge.toExpression(col("text")), costs))
    val viaExpr = docs.select(col("doc_id"), u.as("u"))
      .select(col("doc_id"), col("u")("n_words").as("n_words"),
        col("u")("total_pieces"), col("u")("total_cost"))
      .filter(col("n_words") > 0)
      .collect().map(key).toMap
    val batch = UnigramOps.encodeDocs(docs, pieces)
      .select(col("doc_id"), col("n_words"), col("total_pieces"), col("total_cost"))
      .collect().map(key).toMap
    assert(viaExpr == batch)
    assert(!viaExpr.contains(2L))
  }
}
