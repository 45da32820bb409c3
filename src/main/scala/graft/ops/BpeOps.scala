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
  * scanned ONCE, into a word histogram — BPE statistics only ever
  * depend on (word, count), and the distinct-word domain is
  * Heaps-law-bounded, orders of magnitude smaller than the corpus.
  * Every training iteration then runs on the vocab table alone:
  * pair counting is a map-side explode + partial agg, the argmax is a
  * TakeOrdered(1) (per-partition top-1, no global sort), and the merge
  * application is a map-only fold over each word's symbol array. The
  * driver holds one (l, r) pair per step — never the vocab. Production
  * trainers add delta counting (re-count only words containing the
  * merged pair); the full recount here keeps every step a pure
  * function of the vocab, which is what lets the oracle replay it.
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
  /** Merge steps for the p51 query (real trainers run ~30k; each step
    * is the same bounded job, so the count is a dial, not a design
    * change). */
  val NumMerges = 12

  /** Words kept for training: lowercase alnum only (post-normalization
    * wordpieces, and ASCII-ordered ties for the oracle). */
  val WordGate = "^[a-z0-9]+$"

  final case class Merge(step: Int, l: String, r: String, merged: String, cnt: Long)

  /** The word histogram BPE trains on — the ONE corpus pass. */
  def wordHistogram(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike(WordGate))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** One left-to-right merge pass over a symbol array: fuse every
    * adjacent (l, r) into l+r. A symbol merged in this pass never
    * re-merges as the LEFT of the same pair (l+r is strictly longer
    * than l), which makes this fold equivalent to the oracle's
    * non-overlapping string replace. */
  private def applyMerge(sym: Column, l: String, r: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) === 0, array(x))
        .when(element_at(acc, size(acc)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Train `numMerges` BPE merges from `docs`. Returns the merge table
    * `(step, l, r, merged, cnt)`; stops early if no pair is left. */
  def train(docs: DataFrame, numMerges: Int = NumMerges): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // vocab state: (sym: array<string>, cnt) — starts as characters.
    // localCheckpoint per step: the vocab is Heaps-bounded tiny relative
    // to the corpus, and V chained folds would otherwise stack V plans.
    // the end-of-string lookahead split leaves a trailing "" under
    // Spark's split semantics — filter it, or "" symbols win merges
    var vocab = wordHistogram(docs)
      .select(filter(split(col("word"), "(?!^)"),
        x => length(x) > 0).as("sym"), col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val top = vocab.filter(size(col("sym")) > 1)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("l"),
            element_at(col("sym"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1) // TakeOrderedAndProject: per-partition top-1, no global sort
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case Some((l, r, c)) =>
          merges += Merge(step, l, r, l + r, c)
          val next = vocab.select(applyMerge(col("sym"), l, r).as("sym"), col("cnt"))
            .localCheckpoint()
          vocab.unpersist()
          vocab = next
          step += 1
        case None => done = true
      }
    }
    vocab.unpersist()
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
    * whole-stage codegen. A token containing the frame char `|` would
    * degrade segmentation but not parity — the oracle runs the
    * identical byte-level ops. */
  def encode(docs: DataFrame, merges: Seq[Merge],
             textCol: String = "text"): DataFrame = {
    val enc = merges.foldLeft(wrapChars(col("w"))) { (c, m) =>
      replace(c, lit(s"|${m.l}||${m.r}|"), lit(s"|${m.merged}|"))
    }
    docs
      .select(col("doc_id"), posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), enc.as("enc"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        sum(size(split(trim(col("enc"), "|"), "\\|\\|"))).as("n_pieces"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("enc")))),
          s => s("enc")), " ")).as("fp"))
  }

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
       |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') ws
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
       |v AS (
       |  SELECT word, count(*) AS cnt FROM (
       |    SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |    FROM $table)
       |  WHERE regexp_matches(word, '${WordGate}')
       |  GROUP BY word),
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
