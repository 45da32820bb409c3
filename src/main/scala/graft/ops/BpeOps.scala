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
  * Every training iteration then runs on the vocab table alone, with
  * DELTA counting: the pair-count table is materialized once, and each
  * merge step updates it by re-counting ONLY the words that contain
  * the merged pair (subtract their old pair multiset, add their new
  * one) — the refinement production trainers use, since at a real 30 k
  * vocab a full recount per merge is O(corpus-vocab) × V. The argmax
  * is a TakeOrdered(1) (per-partition top-1, no global sort), the
  * merge application is a map-only fold over each affected word's
  * symbol array, and the driver holds one (l, r) pair per step —
  * never the vocab. Lazy per-step checkpoints make all of a step's
  * work ride its single argmax job while keeping lineage depth
  * constant. The delta is provably exact: a merged word cannot retain
  * an (l,r) adjacency after the left-to-right fold, and unaffected
  * words contribute identical pairs — so the state equals the full
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
  /** Merge steps for the p51 query (real trainers run ~30k; each step
    * is the same bounded single job, so the count is a dial, not a
    * design change — delta counting made a 10× raise from the original
    * 12 affordable, see train()). */
  val NumMerges = 120

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

  /** Per-word adjacent-pair multiset, weighted by word count — the unit
    * both the initial count and every delta are built from. Guarded on
    * size>1 (sequence(1,0) would generate a DESCENDING range). */
  private def pairExplode(v: DataFrame): DataFrame =
    v.filter(size(col("sym")) > 1)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("sym")) - 1),
        i => struct(element_at(col("sym"), i).as("l"),
          element_at(col("sym"), i + 1).as("r")))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("cnt").as("c"))

  /** Does the symbol array contain (l, r) adjacently? when-guarded so
    * single-symbol words never build the descending sequence(1, 0). */
  private def hasPair(sym: Column, l: String, r: String): Column =
    when(size(sym) > 1,
      exists(sequence(lit(1), size(sym) - 1),
        i => element_at(sym, i) === lit(l) && element_at(sym, i + 1) === lit(r)))
      .otherwise(lit(false))

  /** Train `numMerges` BPE merges from `docs`. Returns the merge table
    * `(step, l, r, merged, cnt)`; stops early if no pair is left.
    *
    * State per step: `vocab` (sym, cnt) and `counts` (l, r, c), both
    * lazily localCheckpoint'd — each materializes inside the NEXT step's
    * argmax job (so a step costs ONE job), and both are delta-updated:
    * only words containing the merged pair are re-folded and re-counted.
    * Superseded checkpoints are unpersisted two steps later (their
    * successor is materialized by then — unpersisting a local checkpoint
    * earlier would discard blocks its not-yet-materialized successor
    * still needs). */
  def train(docs: DataFrame, numMerges: Int = NumMerges): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // AQE off for the training loop (restored on exit): adaptive
    // execution materializes every lazy checkpoint's shuffle stages as
    // their own jobs at checkpoint-build time — measured ~170 ms of
    // fixed planning+scheduling cost per extra job, ~2 jobs/step. With
    // AQE off each step is literally ONE argmax job. The per-step
    // relations are vocab-bounded and checkpointed, so none of AQE's
    // runtime re-planning (skew, coalesce) has anything to win here.
    val aqeBefore = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // per-step relations are Heaps-bounded (vocab, pair counts) — a
    // corpus-wide shuffle fan-out would cost ~100 scheduled tasks per
    // step for kilobytes of data (measured 333 ms/step at 32; the task
    // floor dominates). Narrow the loop's shuffles to a width that
    // still scales with the cluster, restore on exit.
    val spBefore = spark.conf.getOption("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(4, spark.sparkContext.defaultParallelism / 8).toString)
    try {
    // vocab state: (sym: array<string>, cnt) — starts as characters.
    // the end-of-string lookahead split leaves a trailing "" under
    // Spark's split semantics — filter it, or "" symbols win merges
    var vocab = wordHistogram(docs)
      .select(filter(split(col("word"), "(?!^)"),
        x => length(x) > 0).as("sym"), col("cnt"))
      .localCheckpoint(false)
    var counts = pairExplode(vocab)
      .groupBy("l", "r").agg(sum("c").as("c"))
      .localCheckpoint(false)
    // superseded states, freed once two generations old (see Scaladoc)
    val retired = scala.collection.mutable.Queue.empty[DataFrame]
    def retire(dfs: DataFrame*): Unit = {
      dfs.foreach(retired.enqueue(_))
      while (retired.size > 4) retired.dequeue().unpersist()
    }
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val top = counts
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1) // TakeOrderedAndProject: per-partition top-1, no global sort
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case Some((l, r, c)) =>
          merges += Merge(step, l, r, l + r, c)
          val contains = hasPair(col("sym"), l, r)
          val affected = vocab.filter(contains)
          val merged = affected
            .select(applyMerge(col("sym"), l, r).as("sym"), col("cnt"))
          // counts' = counts − affected's old pairs + affected's new
          // pairs; zero-count rows leave the table (never negative: the
          // delta is exact, see object Scaladoc)
          val nextCounts = counts
            .unionAll(pairExplode(affected).select(col("l"), col("r"), (-col("c")).as("c")))
            .unionAll(pairExplode(merged))
            .groupBy("l", "r").agg(sum("c").as("c"))
            .filter(col("c") > 0)
            .localCheckpoint(false)
          // single conditional projection, NOT filter(!contains) ∪ merged:
          // a per-step union would DOUBLE the RDD's partition count each
          // step (union concatenates partition lists → exponential task
          // explosion by step ~20). CaseWhen evaluates per row, so only
          // affected rows pay the fold — same work saving, one pass.
          val nextVocab = vocab
            .select(when(contains, applyMerge(col("sym"), l, r))
              .otherwise(col("sym")).as("sym"), col("cnt"))
            .localCheckpoint(false)
          retire(vocab, counts)
          vocab = nextVocab
          counts = nextCounts
          step += 1
        case None => done = true
      }
    }
    retired.foreach(_.unpersist())
    vocab.unpersist()
    counts.unpersist()
    merges.result()
    } finally {
      aqeBefore match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.enabled")
      }
      spBefore match {
        case Some(v) => spark.conf.set("spark.sql.shuffle.partitions", v)
        case None => spark.conf.unset("spark.sql.shuffle.partitions")
      }
    }
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
