package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference aggregation (r14, p98): turn per-comparison
  * "A beat B" records into per-item scalar strengths with the
  * Bradley–Terry model — the arena-leaderboard / reward-data-curation
  * primitive (Chatbot-Arena-style rankings, judge-vote aggregation for
  * RLHF preference sets). Reference semantics: BT maximum-likelihood
  * via Hunter (2004)'s MM iteration,
  *
  *   p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j)
  *
  * where W_i = total wins of item i and n_ij = games between i and j.
  *
  * Arithmetic is INTEGER end to end (the p96 integer-ppm discipline) so
  * a distributed Σ can never reorder a float accumulation: strengths
  * live in ppm (p₀ = 1 000 000) and one MM step is
  *
  *   t_ij = (n_ij · 10⁹) DIV (p_i + p_j)         -- per opponent
  *   p'_i = greatest(1, (W_i · 10⁹) DIV Σ_j t_ij) -- never-winner floor
  *
  * with floor division at both fraction points (all values positive, so
  * DIV = floor on both engines). The 10⁹ scale keeps p' in ppm range
  * (t ≈ 500·n at p≈p₀) and overflows int64 only past ~9·10⁹ games per
  * item pair — document-scale corpora hit the per-pair game cap long
  * before that. Items that never win floor at 1 ppm instead of
  * poisoning later p_i + p_j sums with zero.
  *
  * Scale shape: the directed games table (i, j, n, w) is aggregated
  * ONCE (one shuffle over match records, grouped to item-pair cells)
  * and materialized (localCheckpoint — every iteration re-reads it);
  * each of the fixed `iters` MM steps is two hash joins of the
  * strength table onto the cells plus one O(cells) aggregate. Nothing
  * is ever driver-side; item count and cell count bound every stage
  * regardless of raw match volume.
  */
object PrefOps {

  /** Synthesize deterministic arena matches from the documents corpus:
    * adjacent docs (doc_id, doc_id+1) from different `source`s play one
    * game; the higher heuristic quality score wins, ties go to the
    * lower doc_id. One equi-join on doc_id+1 — no window, no global
    * sort. Returns (winner, loser) source pairs. */
  def syntheticMatches(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), col("source"),
      TextOps.qualityScore(col("text")).as("q"))
    // (r15 note: an explode-pair + hash-agg respelling of this join was
    // measured SLOWER — build 0.79 → 0.99 s at sf0.1 — and reverted;
    // the scan is cheap next to the MM loop below, which is where the
    // round's p98 optimization landed.)
    scored.as("a")
      .join(scored.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .filter(col("a.source") =!= col("b.source"))
      // tie ⇒ a wins: a.doc_id < b.doc_id by construction
      .select(
        when(col("a.q") >= col("b.q"), col("a.source")).otherwise(col("b.source")).as("winner"),
        when(col("a.q") >= col("b.q"), col("b.source")).otherwise(col("a.source")).as("loser"))
  }

  /** Undirected item-pair game cells from (winner, loser) match
    * records: `(x, y, n, wx)` with x < y, n games between them, wx won
    * by x. Pure projections + ONE hash aggregate, so it doubles as the
    * STREAMING arena build ([[graft.streaming.StreamOps]]): cells merge
    * downstream by summing n and wx (both plain SUMs), and state is
    * bounded by the item-pair count, not match volume or time. */
  def matchCells(matches: DataFrame): DataFrame = matches
    // reject self-matches (ADVICE r14): streamed/artifact input can carry
    // winner == loser records ([[syntheticMatches]] can't — sources
    // differ by filter); an x==y cell would double-count in
    // [[bradleyTerry]]'s dir union (games = 2n for n self-games) instead
    // of the zero-information no-op a self-game is
    .filter(col("winner") =!= col("loser"))
    .select(least(col("winner"), col("loser")).as("x"),
      greatest(col("winner"), col("loser")).as("y"),
      when(col("winner") <= col("loser"), 1L).otherwise(0L).as("wx"))
    .groupBy(col("x"), col("y"))
    .agg(count(lit(1)).as("n"), sum(col("wx")).as("wx"))

  /** Bradley–Terry strengths from (winner, loser) match records.
    * Returns one row per item: (source, games, wins, strength_ppm). */
  def bradleyTerry(matches: DataFrame, iters: Int = 5): DataFrame = {
    // undirected game cells, then both directions with each side's wins
    val cells = matchCells(matches)
    val dir = cells.select(col("x").as("i"), col("y").as("j"), col("n"), col("wx").as("w"))
      .union(cells.select(col("y"), col("x"), col("n"), (col("n") - col("wx")).as("w")))
      .localCheckpoint(true)
    val wins = dir.groupBy(col("i"))
      .agg(sum(col("n")).as("games"), sum(col("w")).as("wins"))
      // two consumers of an item-bounded frame: the MM loop's wins map
      // and the output join — without this the full cell aggregate
      // re-runs for each
      .localCheckpoint(true)
    // r15 optimization: the strength table is one row per ITEM —
    // thousands of models in any real arena, never corpus-sized — and
    // the old loop broadcast it onto the cells twice per MM step, which
    // (a) already materialized p on the DRIVER each step (that is what
    // a broadcast build is) and (b) referenced p's un-materialized plan
    // twice per step, DOUBLING the composed plan per iteration: at
    // iters=5 the physical plan hit 853 nodes and the run spent ~2 s in
    // 15 serialized broadcast-exchange builds. Binding p as a MAP
    // LITERAL per step keeps the identical driver footprint and integer
    // math (one element_at lookup per side; Σt is an order-independent
    // integer SUM either way) while each step becomes ONE bounded
    // aggregate job over the checkpointed cells — flat plans, no
    // broadcasts. The per-step reduce stays distributed; only the
    // item-bounded (i, d) result crosses to the driver, exactly like
    // the p101 bucket fit and the CMS/NB artifact collects.
    require(matches.schema("winner").dataType ==
      org.apache.spark.sql.types.StringType,
      "bradleyTerry items must be strings (every declared face passes " +
        "source labels); extend the map binding before feeding other types")
    val winsMap: Map[String, Long] = wins.select(col("i"), col("wins"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var p: Map[String, Long] = winsMap.map { case (k, _) => k -> 1000000L }
    (1 to iters).foreach { _ =>
      val pm = typedlit(p)
      val d: Map[String, Long] = dir
        .select(col("i"), element_at(pm, col("i")).as("pi"),
          element_at(pm, col("j")).as("pj"), col("n"))
        .select(col("i"), expr("(n * 1000000000) DIV (pi + pj)").as("t"))
        .groupBy(col("i")).agg(sum(col("t")).as("d"))
        .collect().map(r =>
          r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
      p = winsMap.map { case (k, w) =>
        val dk = d.getOrElse(k, 0L)
        // d = 0 replays greatest(1, x DIV 0 = NULL) = 1; positive longs
        // make Scala / the same floor DIV the old expr computed
        k -> (if (dk <= 0L) 1L else math.max(1L, (w * 1000000000L) / dk))
      }
    }
    val spark = matches.sparkSession
    import spark.implicits._
    val pDf = p.toSeq.toDF("i", "p")
    wins.join(broadcast(pDf), "i")
      .select(col("i").as("source"), col("games"), col("wins"),
        col("p").as("strength_ppm"))
      .orderBy(col("source"))
  }

  /** DuckDB oracle for [[bradleyTerry]] over [[syntheticMatches]]: the
    * match synthesis, cell aggregate, and an UNROLLED chain of `iters`
    * integer MM steps (same ppm quantization, same floor divisions). */
  def bradleyTerrySql(iters: Int = 5): String = {
    val steps = (1 to iters).map { i =>
      val prev = if (i == 1) "p0" else s"step${i - 1}"
      s"""step$i AS (
         |  SELECT d.i AS i,
         |    CAST(greatest(1, (max(w.wins) * 1000000000) //
         |      sum((d.n * 1000000000) // (pi.p + pj.p))) AS BIGINT) AS p
         |  FROM dir d
         |  JOIN $prev pi ON pi.i = d.i
         |  JOIN $prev pj ON pj.i = d.j
         |  JOIN wins w ON w.i = d.i
         |  GROUP BY d.i)""".stripMargin
    }.mkString(",\n")
    val q = (c: String) => TextOps.qualityScoreSql(c)
    s"""WITH scored AS (
       |  SELECT doc_id, source, ${q("text")} AS q FROM documents),
       |m AS (
       |  SELECT CASE WHEN a.q >= b.q THEN a.source ELSE b.source END AS winner,
       |         CASE WHEN a.q >= b.q THEN b.source ELSE a.source END AS loser
       |  FROM scored a JOIN scored b ON b.doc_id = a.doc_id + 1
       |  WHERE a.source <> b.source),
       |cells AS (
       |  SELECT least(winner, loser) AS x, greatest(winner, loser) AS y,
       |         count(*) AS n,
       |         CAST(sum(CASE WHEN winner <= loser THEN 1 ELSE 0 END) AS BIGINT) AS wx
       |  FROM m WHERE winner <> loser GROUP BY 1, 2),
       |dir AS (
       |  SELECT x AS i, y AS j, n, wx AS w FROM cells
       |  UNION ALL
       |  SELECT y, x, n, n - wx FROM cells),
       |wins AS (SELECT i, CAST(sum(n) AS BIGINT) AS games,
       |                CAST(sum(w) AS BIGINT) AS wins FROM dir GROUP BY i),
       |p0 AS (SELECT i, CAST(1000000 AS BIGINT) AS p FROM wins),
       |$steps
       |SELECT w.i AS source, w.games, w.wins, s.p AS strength_ppm
       |FROM wins w JOIN step$iters s ON s.i = w.i
       |ORDER BY source""".stripMargin
  }
}
