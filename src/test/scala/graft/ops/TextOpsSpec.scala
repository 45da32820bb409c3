package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("tokenCount splits on whitespace runs") {
    val r = docs("a  b\tc", " x ").select(TextOps.tokenCount($"text")).as[Int].collect()
    assert(r.toSeq == Seq(3, 1))
  }

  test("langId picks the lexicon with most hits; und on no signal") {
    val r = docs(
      "the cat and the dog is here",
      "el perro que la casa con un gato",
      "le chat est dans la maison pour les amis",
      "der hund ist ein tier und das ist gut",
      "你好世界",
      "zzz qqq www").select(TextOps.langId($"text")).as[String].collect()
    assert(r.toSeq == Seq("en", "es", "fr", "de", "zh", "und"))
  }

  test("qualityScore is in [0,1] and favors longer stopword-rich text") {
    val r = docs(
      "the cat and the dog is in the house and it was good " * 10,
      "x").select(TextOps.qualityScore($"text")).as[Double].collect()
    assert(r.forall(v => v >= 0.0 && v <= 1.0))
    assert(r(0) > r(1))
  }

  test("setFingerprint is word-order and duplication insensitive") {
    val r = docs("b a c a", "a b c", "a b d")
      .select(TextOps.setFingerprint($"text")).as[String].collect()
    assert(r(0) == r(1) && r(1) != r(2))
  }

  test("rollingFingerprint is order sensitive") {
    val r = docs("a b c", "c b a", "a b c")
      .select(TextOps.rollingFingerprint($"text")).as[String].collect()
    assert(r(0) != r(1) && r(0) == r(2))
  }

  test("WordNGrams expression: exact grams, short arrays, null input") {
    import graft.functions.TextExprs.ngrams
    val df = Seq(Some(Seq("a", "b", "c", "d")), Some(Seq("x", "y")), None)
      .toDF("w").select(ngrams($"w", 3).as("g"))
    val r = df.collect().map(x => if (x.isNullAt(0)) null else x.getSeq[String](0))
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Seq())
    assert(r(2) == null)
  }

  test("repetitionStats: hand-computed fractions and keep gate") {
    val df = TextOps.repetitionStats(docs(
      "a a a b",        // doc 0: looping
      "w x y z",        // doc 1: clean
      "p q"))           // doc 2: too short for trigrams
      .orderBy("doc_id").collect()

    val d0 = df(0)
    assert(d0.getAs[Int]("n_words") == 4)
    // distinct {a,b}=2 of 4 -> 0.5; bigrams [a a, a a, a b] top 2/3;
    // trigrams [a a a, a a b] all distinct -> 0
    assert(d0.getAs[Double]("dup_word_frac") == 0.5)
    assert(d0.getAs[Double]("top_bigram_frac") == 0.666667)
    assert(d0.getAs[Double]("dup_trigram_frac") == 0.0)
    assert(!d0.getAs[Boolean]("keep"), "looping doc must be filtered")

    val d1 = df(1)
    assert(d1.getAs[Double]("dup_word_frac") == 0.0)
    assert(d1.getAs[Double]("top_bigram_frac") == 0.333333) // 1 of 3
    assert(!d1.getAs[Boolean]("keep"), "4 unique words still trip the bigram cap")

    val d2 = df(2)
    assert(d2.getAs[Double]("top_bigram_frac") == 1.0) // single bigram
    assert(d2.getAs[Double]("dup_trigram_frac") == 0.0) // none -> defined 0
  }

  test("salientTerms ranks rare repeated terms above ubiquitous ones") {
    // "common" is in all 4 docs (df=4 -> idf 1); "rare" only in doc 0,
    // twice (score 2*4=8); "semi" in docs 0+1 (score 4/2=2 in each)
    val docs = Seq(
      (0L, "common rare rare semi"),
      (1L, "common semi x y"),
      (2L, "common only plain words"),
      (3L, "common filler terms here")).toDF("doc_id", "text")
    val r = TextOps.salientTerms(docs, k = 2)
      .orderBy("doc_id", "rk")
      .as[(Long, String, Double, Int)].collect().toSeq
    val doc0 = r.filter(_._1 == 0L)
    assert(doc0 == Seq((0L, "rare", 8.0, 1), (0L, "semi", 2.0, 2)), doc0)
    val doc1 = r.filter(_._1 == 1L)
    // semi (4/2=2) beats x and y (4/1=4 each)... no: x,y score 4 > semi 2
    assert(doc1.map(_._2) == Seq("x", "y"), doc1) // ties broken by term asc
    assert(r.forall(_._4 <= 2) && r.count(_._1 == 2L) == 2)
  }

  test("keywordSearch: conjunctive match, hits counts ALL query-term occurrences") {
    val docs = Seq(
      (0L, "spark window spark vector"),  // all 3 terms, 4 hits
      (1L, "spark window window"),        // missing vector -> excluded
      (2L, "VECTOR Spark window"),        // case-folds -> 3 hits
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val r = TextOps.keywordSearch(docs, Seq("spark", "vector", "window"))
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 4L, 2L -> 3L), r)
  }

  test("chunkDocs: stride-overlapped windows cover every token, tail short") {
    // 10 tokens, size 4, stride 3 -> starts 1,4,7,10; last chunk length 1
    val docs = Seq((7L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextOps.chunkDocs(docs, size = 4, stride = 3)
      .orderBy("start_tok")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(r.map(_._2) == Seq(1, 4, 7, 10))
    assert(r.map(_._3) == Seq(4, 4, 4, 1))
    // overlap: chunk k shares size-stride tokens with chunk k+1
    val md5of = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.head._4 == md5of("t1 t2 t3 t4"))
    assert(r.last._4 == md5of("t10"))
    // every token index 1..10 is covered by at least one [start, start+n)
    val covered = r.flatMap(c => c._2 until (c._2 + c._3)).toSet
    assert((1 to 10).forall(covered))
  }

  test("chunkTexts invariants hold for random (n, size, stride) combos") {
    // for every combination: starts are exactly 1, 1+stride, ... ≤ n;
    // every token index lands in ≥1 chunk; each chunk holds
    // min(size, n-start+1) tokens; passthrough columns ride unchanged
    val rnd = new scala.util.Random(41)
    val combos = (1 to 25).map { _ =>
      val size = 1 + rnd.nextInt(12)
      (1 + rnd.nextInt(40), size, 1 + rnd.nextInt(size))
    }
    combos.foreach { case (n, size, stride) =>
      val doc = Seq((7L, (1 to n).map(i => s"t$i").mkString(" "), "keepme"))
        .toDF("doc_id", "text", "tag")
      val rows = graft.ops.TextOps
        .chunkTexts(doc, size = size, stride = stride, passthrough = Seq("tag"))
        .select("start_tok", "n_tok", "tag")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
      val label = s"n=$n size=$size stride=$stride"
      val starts = rows.map(_._1).sorted
      assert(starts.toSeq == (1 to n by stride).toSeq, s"$label starts=$starts")
      rows.foreach { case (st, nt, tag) =>
        assert(nt == math.min(size, n - st + 1), s"$label start=$st n_tok=$nt")
        assert(tag == "keepme", label)
      }
      val covered = rows.flatMap { case (st, nt, _) => st until (st + nt) }.toSet
      assert(covered == (1 to n).toSet, s"$label uncovered=${(1 to n).toSet.diff(covered)}")
    }
  }

  test("chunkDocs / substrDupStats drop null-text docs, never crash") {
    val docs = Seq((1L, null: String), (2L, "a b c d")).toDF("doc_id", "text")
    val ch = TextOps.chunkDocs(docs, size = 4, stride = 3).collect()
    assert(ch.map(_.getAs[Long]("doc_id")).toSet == Set(2L))
    val sd = DedupOps.substrDupStats(docs, w = 2).collect()
    assert(sd.map(_.getAs[Long]("doc_id")).toSet == Set(2L))
  }

  test("rareNgramStats scores rare-trigram instances against the corpus model") {
    // "a b c d" appears in 3 docs -> its trigrams have count 3 (> maxC=2,
    // common); doc 3's trigrams are unique (count 1, rare)
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b c d"),
      (2L, "a b c d x"),   // 'a b c'/'b c d' common, 'c d x' rare
      (3L, "p q r s"),     // all rare
      (4L, "xy"),          // < 3 tokens -> absent
    ).toDF("doc_id", "text")
    val r = TextOps.rareNgramStats(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_grams"), x.getAs[Long]("n_rare"),
          x.getAs[Double]("rare_frac"), x.getAs[Boolean]("keep")))).toMap
    assert(r(0L) == ((2L, 0L, 0.0, true)))
    assert(r(1L) == ((2L, 0L, 0.0, true)))
    assert(r(2L) == ((3L, 1L, 0.333333, true)))
    assert(r(3L) == ((2L, 2L, 1.0, false)))  // 1.0 > RareFracMax gate
    assert(!r.contains(4L))
  }

  test("withSyntheticLines plants 8-token lines with deterministic blemishes") {
    import spark.implicits._
    // 17 tokens -> 3 lines (8, 8, 1); doc_id=0: line 0 gets boilerplate
    // ((0+0)%7=0) AND no '.' ((0+0)%3=0); lines 1,2 get '.'
    val doc = Seq((0L, (1 to 17).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val lines = TextOps.withSyntheticLines(doc)
      .select("text").as[String].head().split("\n")
    assert(lines.length == 3)
    assert(lines(0) == "t1 t2 t3 t4 t5 t6 t7 t8 noscript javascript")
    assert(lines(1) == "t9 t10 t11 t12 t13 t14 t15 t16.")
    assert(lines(2) == "t17.")
  }

  test("c4Clean keeps only punctuated >=5-word non-boilerplate lines") {
    import spark.implicits._
    val doc = Seq((0L, (1 to 17).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val r = TextOps.c4Clean(TextOps.withSyntheticLines(doc)).head()
    // of the 3 planted lines: line0 fails (javascript, no '.'),
    // line1 passes (8 words, '.'), line2 fails (1 word)
    assert(r.getInt(1) == 3, "n_lines")
    assert(r.getInt(2) == 1, "n_kept")
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("t9 t10 t11 t12 t13 t14 t15 t16.".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getString(3) == expected, "clean_fp is md5 of the kept text")
  }

  test("c4Clean: a doc whose every line fails fingerprints the empty clean text") {
    import spark.implicits._
    // 4 tokens -> one line 't1 t2 t3 t4.' (doc 1: (1+0)%3!=0) -> fails
    // the >=5-words gate; kept set is empty
    val doc = Seq((1L, "t1 t2 t3 t4")).toDF("doc_id", "text")
    val r = TextOps.c4Clean(TextOps.withSyntheticLines(doc)).head()
    assert(r.getInt(1) == 1 && r.getInt(2) == 0)
    assert(r.getString(3) == "d41d8cd98f00b204e9800998ecf8427e") // md5("")
  }

  test("nfc expression composes decomposed text; already-NFC passes through") {
    import spark.implicits._
    import graft.functions.NfcNormalize.nfc
    val df = Seq(
      (0L, "cafe\u0301"),   // decomposed -> composes
      (1L, "caf\u00e9"),    // already NFC -> unchanged
      (2L, "plain ascii"),
      (3L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = df.select($"id", nfc($"t").as("n")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(0L).contains("caf\u00e9"), out(0L))
    assert(out(1L).contains("caf\u00e9"))
    assert(out(2L).contains("plain ascii"))
    assert(out(3L).isEmpty, "null in -> null out")
  }

  test("vocabEncode: frequency-ranked ids, UNK=0, order-sensitive fingerprint") {
    import spark.implicits._
    // corpus frequencies: aa x4, bb x3, cc x2, dd x1 -> ids 1..4 with
    // vocabSize 3 cutting dd to UNK
    val docs = Seq(
      (0L, "aa bb aa cc"),
      (1L, "bb aa cc bb"),
      (2L, "aa dd"),
      (3L, "dd aa")).toDF("doc_id", "text")
    val r = TextOps.vocabEncode(docs, vocabSize = 3).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(4)))).toMap
    assert(r(0L)._1 == 4 && r(0L)._2 == 0, r(0L))
    assert(r(2L)._2 == 1 && r(3L)._2 == 1, "dd is out-of-vocab")
    def fp(ids: Seq[Int]) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(ids.mkString(" ").getBytes("UTF-8"))
      md.map("%02x".format(_)).mkString
    }
    // aa=1 bb=2 cc=3, dd -> 0; doc 0 "aa bb aa cc" -> 1 2 1 3
    assert(r(0L)._3 == fp(Seq(1, 2, 1, 3)), "id sequence in token order")
    // docs 2 and 3 share a token SET but not order -> different fps
    assert(r(2L)._3 == fp(Seq(1, 0)) && r(3L)._3 == fp(Seq(0, 1)))
    assert(r(2L)._3 != r(3L)._3)
  }

  test("textHygiene counts blemishes, strips controls, and unifies spellings") {
    import spark.implicits._
    // doc 0: decomposed tail + BEL + FFFD; doc 1: precomposed tail only.
    // After hygiene both texts are byte-identical -> same fingerprint.
    val docs = Seq((0L, "same text"), (1L, "same text")).toDF("doc_id", "text")
    val r = TextOps.textHygiene(TextOps.withSyntheticMojibake(docs))
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getBoolean(3), x.getString(4)))).toMap
    assert(r(0L)._1 == 1, "doc 0 has one control char (BEL: 0 % 5 == 0)")
    assert(r(0L)._2 == 1, "doc 0 has one U+FFFD (0 % 7 == 0)")
    assert(r(0L)._3, "doc 0's decomposed tail changed under NFC")
    assert(r(1L) == ((0, 0, false, r(1L)._4)))
    assert(r(0L)._4 == r(1L)._4,
      "after hygiene the two spellings fingerprint identically")
  }

  test("ensembleGate attributes the first-tripped reason in priority order") {
    import spark.implicits._
    // passes all six gates: 120 words, 1/3 stopwords (quality's stop
    // ratio), long distinct content words (dup/bigram/trigram low,
    // avg-token-length high)
    val good = (0 until 120)
      .map(i => if (i % 3 == 0) "the" else s"wonderful$i").mkString(" ")
    val docs = Seq(
      (0L, good),                        // passes everything
      (1L, "one two"),                   // < 5 words -> short
      (2L, "!!! ### $$$ %%% ^^^ &&&"),   // symbols (and short-safe: 6 words)
      (3L, ("spam spam " * 30).trim),    // dup words AND top bigram -> dup_word wins
      (4L, ""),                          // empty -> short
    ).toDF("doc_id", "text")
    val r = TextOps.ensembleGate(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Boolean]("keep"), x.getAs[String]("reason")))).toMap
    assert(r(0L) == ((true, "pass")), r(0L))
    assert(r(1L) == ((false, "short")))
    assert(r(2L) == ((false, "symbolic")))
    assert(r(3L) == ((false, "dup_word")), r(3L))
    assert(r(4L) == ((false, "short")))
  }

  test("ensembleGate is map-only: zero exchanges in the physical plan") {
    import spark.implicits._
    val docs = Seq((0L, "a b c")).toDF("doc_id", "text")
    val plan = TextOps.ensembleGate(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("ensembleGate symbol fraction treats CJK letters as letters") {
    import spark.implicits._
    val docs = Seq((0L, "中文 文本 中文 文本 中文 句子")).toDF("doc_id", "text")
    val r = TextOps.ensembleGate(docs).collect().head
    assert(r.getAs[Double]("symbol_frac") == 0.0, r.toString)
  }

  test("periodicity finds the loop period dup-n-gram fractions miss") {
    import spark.implicits._
    val docs = Seq(
      (0L, ("ha " * 20).trim),                       // pure lag-1 loop
      (1L, ("red blue green " * 7).trim),            // lag-3 cycle: trigrams all distinct? no—
      (2L, "one two three four five six seven eight nine ten"), // no repetition
      (3L, "x"),                                     // shorter than every lag
    ).toDF("doc_id", "text")
    val r = TextOps.periodicity(docs)
      .as[(Long, Long, Int, Long)].collect().map(x => x._1 -> x).toMap
    assert(r(0L)._3 == 1 && r(0L)._4 == 1000, r(0L)) // perfect lag-1
    assert(r(1L)._3 == 3 && r(1L)._4 == 1000, r(1L)) // perfect lag-3
    assert(r(2L)._4 == 0 && r(2L)._3 == 0, r(2L))
    assert(r(3L)._4 == 0, r(3L))
  }

  test("vocabGrowth: monotone curve whose last point is the global count") {
    import spark.implicits._
    // vocabulary saturates: later docs repeat earlier words
    val docs = (0L until 100L).map { i =>
      (i, (0 to 9).map(j => s"w${(i * 7 + j * 3) % 60}").mkString(" "))
    }.toDF("doc_id", "text")
    val r = TextOps.vocabGrowth(docs)
      .orderBy($"cp").as[(Long, Long, Long, Long)].collect()
    assert(r.length == 5, r.mkString(", "))
    assert(r.map(_._2).sliding(2).forall(p => p(0) <= p(1)), "tokens not monotone")
    assert(r.map(_._3).sliding(2).forall(p => p(0) <= p(1)), "types not monotone")
    assert(r.last._2 == 1000L) // 100 docs x 10 tokens
    assert(r.last._3 == 60L)   // the full planted vocabulary
    // saturation: TTR falls as the corpus grows (Heaps with V << N)
    assert(r.head._4 > r.last._4, r.mkString(", "))
  }

  test("vocabGrowth: empty corpus yields an empty curve, not a throw") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = TextOps.vocabGrowth(empty)
    assert(r.columns.toSeq == Seq("cp", "n_tokens", "n_types", "ttr_milli"))
    assert(r.count() == 0)
  }
}
