package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training (Sennrich et al. 2016): learn the merge table
  * a byte-pair-encoding tokenizer is — the step that turns a prepared
  * corpus into the vocabulary p46 encodes with. Each merge step finds
  * the most frequent adjacent symbol pair across the corpus and fuses
  * it into a new symbol.
  *
  * Distributed shape (the part that matters at 100 TB): the corpus is
  * scanned ONCE, distributed, into a word histogram — BPE statistics
  * only ever depend on (word, count), and the distinct-word domain is
  * Heaps-law-bounded, orders of magnitude smaller than the corpus —
  * capped at [[VocabCap]] by (count DESC, word) via TakeOrdered (no
  * global sort; the oracle applies the identical cap). The merge loop
  * then runs DRIVER-LOCAL over that bounded table with delta counting
  * (each step re-counts only the words containing the merged pair,
  * through a pair→words inverted index) — the shape production
  * trainers (SentencePiece, HF tokenizers) use, because per-merge
  * work is microseconds on a histogram while ANY distributed step
  * pays a fixed job-scheduling floor. Measured here: a fully
  * distributed delta-counted loop (one bounded Spark job per merge)
  * cost ~0.25 s/step at EVERY scale factor — 30 s for 120 merges,
  * two hours for a real 30 k-merge vocab — all scheduling, no data;
  * the histogram route trains 120 merges in milliseconds after the
  * same single corpus pass. The collect is NOT a data-path collect:
  * it is capped by construction (≤ VocabCap rows, the same class of
  * bounded driver state as p44/p47's broadcast models).
  *
  * The delta update is exact: a merged word cannot retain an (l,r)
  * adjacency after the left-to-right fold, and unaffected words
  * contribute identical pairs — so the state always equals the full
  * recount the oracle independently performs.
  *
  * Determinism: integer counts (no float aggregate), ties broken by
  * (count DESC, l, r) — the vocab is gated to `^[a-z0-9]+$` so string
  * comparison is plain ASCII byte order in both engines, and the
  * delimiter trick in the oracle (`|l||r|` on `|`-wrapped symbols)
  * can never false-match inside a symbol.
  *
  * Oracle: [[bpeTrainSql]] does NOT trust the trained table — it
  * re-encodes the vocab step-by-step with the merges (a recursive CTE
  * of left-to-right `replace` passes, provably equivalent to the
  * fold) and independently recomputes each step's argmax pair from
  * the re-encoded symbols. If any step's choice were wrong, that
  * step's oracle row diverges and the differential compare fails —
  * training is verified inductively, not just replayed.
  */
object BpeOps {
  /** Merge steps for the p51 query (real trainers run ~30k; on the
    * driver-local histogram each step is microseconds, so the count is
    * a dial, not a design change — the 10× raise from the original 12
    * costs nothing, see train()). */
  val NumMerges = 120

  /** Driver-memory bound for the histogram the trainer pulls: top-K
    * words by (count DESC, word ASC), deterministic. A no-op at test
    * SFs (vocab ≪ cap) but structurally load-bearing at 100 TB — it
    * turns "Heaps-law-bounded" into "bounded by construction". The
    * oracle applies the identical cap. */
  val VocabCap = 1 << 20

  /** Words kept for training: lowercase alnum only (post-normalization
    * wordpieces, and ASCII-ordered ties for the oracle). */
  val WordGate = "^[a-z0-9]+$"

  final case class Merge(step: Int, l: String, r: String, merged: String, cnt: Long)

  /** The word histogram BPE trains on — the ONE corpus pass. */
  def wordHistogram(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike(WordGate))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` BPE merges from `docs`: one distributed corpus
    * pass to the capped word histogram, then [[trainLocal]] over it.
    * Returns the merge table `(step, l, r, merged, cnt)`; stops early
    * if no pair is left. */
  def train(docs: DataFrame, numMerges: Int = NumMerges): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = wordHistogram(docs)
      // TakeOrdered(K): per-partition top-K, no global sort; total
      // order (cnt DESC, word) makes the cap boundary deterministic
      .orderBy(col("cnt").desc, col("word"))
      .limit(VocabCap)
      .as[(String, Long)]
      .collect()
    trainLocal(hist, numMerges)
  }

  /** The merge loop, driver-local over the bounded (word, count)
    * histogram. State: per-word symbol arrays, a pair→count map, and a
    * pair→word-ids inverted index (entries may go stale after other
    * merges touch a word — re-verified adjacency-first on use). Each
    * step: O(pairs) argmax scan (a real 30 k-merge run would keep a
    * heap keyed the same way), then delta-update ONLY the words that
    * still contain the merged pair. */
  private[ops] def trainLocal(hist: Array[(String, Long)],
                              numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] =
      hist.map(_._1.split("(?!^)").filter(_.nonEmpty))
    val cnt: Array[Long] = hist.map(_._2)
    val pc = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def addPairs(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val nv = pc.getOrElse(p, 0L) + sign * cnt(i)
        if (nv == 0L) pc.remove(p) else pc.update(p, nv)
        if (sign > 0L) occ.getOrElseUpdate(p, mutable.HashSet.empty) += i
        j += 1
      }
    }
    syms.indices.foreach(addPairs(_, 1L))
    val merges = Seq.newBuilder[Merge]
    var step = 1
    while (step <= numMerges && pc.nonEmpty) {
      // argmax by (count DESC, l, r) — the vocab gate keeps symbols
      // ASCII, so String '<' is byte order, same as Spark and DuckDB
      var bestP: (String, String) = null
      var bestC = Long.MinValue
      for ((p, c) <- pc)
        if (c > bestC || (c == bestC &&
            (p._1 < bestP._1 || (p._1 == bestP._1 && p._2 < bestP._2)))) {
          bestP = p; bestC = c
        }
      val (l, r) = bestP
      merges += Merge(step, l, r, l + r, bestC)
      for (i <- occ.getOrElse(bestP, mutable.HashSet.empty[Int]).toArray) {
        val s = syms(i)
        var contains = false
        var j = 0
        while (!contains && j < s.length - 1) {
          if (s(j) == l && s(j + 1) == r) contains = true
          j += 1
        }
        if (contains) { // stale index entries skip here
          addPairs(i, -1L)
          // left-to-right non-overlapping fold: a symbol formed this
          // pass never re-merges as the LEFT of the same pair —
          // equivalent to the oracle's string replace
          val out = mutable.ArrayBuffer.empty[String]
          var k = 0
          while (k < s.length) {
            if (k < s.length - 1 && s(k) == l && s(k + 1) == r) {
              out += (l + r); k += 2
            } else { out += s(k); k += 1 }
          }
          syms(i) = out.toArray
          addPairs(i, 1L)
        }
      }
      occ.remove(bestP)
      step += 1
    }
    merges.result()
  }

  /** [[train]] as a DataFrame (the p51 query shape). */
  def trainDf(docs: DataFrame, numMerges: Int = NumMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spark.createDataset(train(docs, numMerges)).toDF()
      .select(col("step"), col("l"), col("r"), col("merged"), col("cnt"))
  }

  /** Wrapped symbol-string form of a word: each char framed in `|`
    * (`cat` → `|c||a||t|`). The frame makes a merge's replace pattern
    * (`|l||r|` → `|lr|`) unable to false-match inside a symbol or
    * across a pair that shares only one delimiter. */
  private def wrapChars(w: Column): Column =
    concat(lit("|"), array_join(
      filter(split(w, "(?!^)"), x => length(x) > 0), "||"), lit("|"))

  /** BPE-encode a corpus with a trained merge table: one non-
    * overlapping left-to-right replace pass per merge, in rank order —
    * exhaustive per pass because a merge cannot recreate its own pair
    * (l+r is a single symbol afterwards). Returns per-doc
    * `(doc_id, n_tok, n_pieces, fp)` where fp fingerprints the full
    * in-order piece stream.
    *
    * Map-only until the per-doc rollup (one doc-keyed shuffle): the
    * merge table is a rank-ordered chain of string replaces baked into
    * the projection — the artifact is code, not a join side. At 100 TB
    * the encode pass is the expensive face of a tokenizer and this is
    * the shape you want: linear in corpus bytes, zero extra shuffles,
    * whole-stage codegen. The frame char `|` is stripped from tokens
    * before wrapping (a token containing it would corrupt its own
    * segmentation); tokens empty after the strip are dropped. The
    * oracle applies the identical strip+drop. */
  def encode(docs: DataFrame, merges: Seq[Merge],
             textCol: String = "text"): DataFrame = {
    val enc = merges.foldLeft(wrapChars(col("w"))) { (c, m) =>
      replace(c, lit(s"|${m.l}||${m.r}|"), lit(s"|${m.merged}|"))
    }
    val toks = filter(transform(TextOps.tokens(col(textCol)),
      t => regexp_replace(t, "\\|", "")), t => length(t) > 0)
    docs
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), enc.as("enc"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        sum(size(split(trim(col("enc"), "|"), "\\|\\|"))).as("n_pieces"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("enc")))),
          s => s("enc")), " ")).as("fp"))
  }

  /** The trained merge table applied to free TEXT as one array column:
    * per input token (frame char `|` stripped, empties dropped — the
    * [[encode]] hygiene), that token's BPE pieces in order, so the
    * value is `array<array<string>>` and `flatten(...)` is the piece
    * stream. The SQL surface's `bpe_encode(text)`, backed by the
    * memoizing [[graft.functions.BpeEncode]] expression (symbol-array
    * fold ≡ the replace chain; a 120-merge chain inside a `transform`
    * lambda runs interpreted per element — measured 4× the batch
    * projection) — p80 proves the equivalence by reconstructing
    * [[encode]]'s exact (n_tok, n_pieces, fp) from this array against
    * the [[bpeEncodeSql]] oracle's replace-chain render. */
  def encodePiecesCol(text: Column, merges: Seq[Merge]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.functions.BpeEncode(
      org.apache.spark.sql.GraftColumnBridge.toExpression(text),
      merges.map(m => (m.l, m.r))))

  /** DuckDB oracle for [[encode]]: the same rank-ordered replace chain
    * rendered as nested `replace` calls over the same wrapped form. */
  def bpeEncodeSql(merges: Seq[Merge], table: String = "documents"): String = {
    val wrapped = "'|' || array_to_string(list_transform(range(1, len(w)+1), " +
      "i -> w[i]), '||') || '|'"
    val enc = merges.foldLeft(wrapped) { (c, m) =>
      s"replace($c, '|${m.l}||${m.r}|', '|${m.merged}|')"
    }
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(ws)+1),
       |    i -> {'pos': i, 'w': ws[i]}), recursive := true)
       |  FROM (SELECT doc_id, list_filter(list_transform(
       |          string_split_regex(trim(lower(text)), '\\s+'),
       |          w -> replace(w, '|', '')), w -> len(w) > 0) ws
       |        FROM $table)),
       |e AS (SELECT doc_id, pos, $enc AS enc FROM tok)
       |SELECT doc_id, count(*) AS n_tok,
       |  CAST(sum(len(string_split(trim(enc, '|'), '||'))) AS BIGINT) AS n_pieces,
       |  md5(array_to_string(list(enc ORDER BY pos), ' ')) AS fp
       |FROM e GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle: re-encode the vocab with the TRAINED merges
    * (recursive CTE, one wrapped-string replace pass per step) and
    * recompute each step's argmax pair from scratch — inductive
    * verification of every training decision. `merges` is the runtime
    * artifact, rendered as a VALUES table (the p13 trained-centroid
    * pattern). */
  def bpeTrainSql(merges: Seq[Merge], table: String = "documents"): String = {
    require(merges.nonEmpty, "bpeTrainSql needs at least one trained merge")
    val values = merges
      .map(m => s"(${m.step}, '${m.l}', '${m.r}')").mkString(", ")
    s"""WITH RECURSIVE
       |v0 AS (
       |  SELECT word, count(*) AS cnt FROM (
       |    SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |    FROM $table)
       |  WHERE regexp_matches(word, '${WordGate}')
       |  GROUP BY word),
       |v AS (SELECT word, cnt FROM v0 ORDER BY cnt DESC, word LIMIT ${VocabCap}),
       |m AS (SELECT * FROM (VALUES $values) t(step, l, r)),
       |enc AS (
       |  SELECT cnt,
       |    '|' || array_to_string(list_transform(range(1, len(word)+1),
       |      i -> word[i]), '||') || '|' AS s,
       |    0 AS step
       |  FROM v
       |  UNION ALL
       |  SELECT enc.cnt,
       |    replace(enc.s, '|'||m.l||'||'||m.r||'|', '|'||m.l||m.r||'|'),
       |    enc.step + 1
       |  FROM enc JOIN m ON m.step = enc.step + 1),
       |sy AS (
       |  SELECT step, cnt, string_split(trim(s, '|'), '||') AS syms
       |  FROM enc WHERE step < ${merges.size}),
       |pairs AS (
       |  SELECT step + 1 AS step, cnt,
       |    unnest(list_transform(range(1, len(syms)),
       |      i -> {'l': syms[i], 'r': syms[i+1]}), recursive := true)
       |  FROM sy WHERE len(syms) > 1),
       |agg AS (SELECT step, l, r, sum(cnt) AS c FROM pairs GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT step, l, r, c,
       |    row_number() OVER (PARTITION BY step ORDER BY c DESC, l, r) AS rk
       |  FROM agg)
       |SELECT step, l, r, l || r AS merged, CAST(c AS BIGINT) AS cnt
       |FROM best WHERE rk = 1 ORDER BY step""".stripMargin
  }
}
