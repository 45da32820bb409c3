package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators (SURVEY §2.5 stretch surface).
  *
  * The reference has NO watermarks/event-time windows — its "streaming"
  * is micro-batched buffered ingest, and query-side continuity is
  * client polling (ARCHITECTURE.md:5165-5183). These operators are the
  * strict-superset a Spark-native engine gets from Structured Streaming:
  * the same int64-ns time model (`time` column) lifted into Spark's
  * event-time machinery, so late data is handled by WATERMARK instead of
  * by arrival-time partitioning alone.
  *
  * Scale notes: windowed aggregation is a streaming partial aggregate
  * with state keyed by (window, group) — state size is bounded by the
  * watermark horizon; flatMapGroupsWithState keeps one small state
  * object per series key, sharded across executors by the groupBy hash.
  */
object StreamOps {

  /** ns-epoch long → event-time timestamp, the ONE spelling (review
    * r10: it existed six times). INTEGER division: `col / 1000` is
    * DOUBLE division, and ns-epoch values exceed double's 2^53
    * mantissa — rows within ~256 ns of a window boundary would land
    * in the wrong window. */
  private def eventTimeNs(timeCol: String): org.apache.spark.sql.Column =
    timestamp_micros(expr(s"`$timeCol` DIV 1000"))

  /** Tumbling event-time window aggregates with late-data tolerance.
    * `timeCol` is int64 ns (the reference time model); rows later than
    * `lateness` behind the max seen event time are dropped by the
    * watermark instead of corrupting closed windows. */
  def windowedAgg(rows: DataFrame, timeCol: String, valueCol: String,
                  groupCols: Seq[String],
                  windowLen: String = "1 minute",
                  lateness: String = "30 seconds"): DataFrame = {
    val withTime = rows.withColumn("event_time", eventTimeNs(timeCol))
      .withWatermark("event_time", lateness)
    withTime
      .groupBy(window(col("event_time"), windowLen) +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol)), 6).as("sum_v"),
        round(avg(col(valueCol)), 6).as("avg_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
      .select(Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++ groupCols.map(col) ++
        Seq(col("n"), col("sum_v"), col("avg_v"), col("min_v"), col("max_v")): _*)
  }

  /** One measurement point of a keyed series: (series key, time ns, value). */
  final case class SeriesPoint(key: String, timeNs: Long, value: Double)
  /** Running per-series state carried across micro-batches. */
  final case class SeriesState(count: Long, sum: Double, lastNs: Long)
  /** Emitted per input point: running count/avg and the inter-arrival gap. */
  final case class SeriesUpdate(key: String, count: Long, avg: Double, gapNs: Long)

  /** Streaming exact dedup: pass each distinct document through once,
    * keyed by content hash, as data ARRIVES — the streaming face of
    * p01's batch dedup for ingest-time pipelines.
    *
    * Spark-first: `dropDuplicatesWithinWatermark` on md5(text). Dedup
    * state is kept by the engine and EVICTED once a key's event time
    * falls behind the watermark, so state is bounded by the lateness
    * horizon at any stream length — the property that matters on an
    * unbounded corpus stream, where plain dropDuplicates' state grows
    * forever. Duplicates farther apart than `lateness` are a job for
    * the batch pass (p01/p20); this op guarantees exactly-once emission
    * within the horizon and at-least-once beyond it. */
  def dedupStream(docs: DataFrame, timeCol: String,
                  lateness: String = "10 minutes"): DataFrame =
    // md5(coalesce(text,'')) — the batch fingerprint contract
    // (DedupOps.memberMap / IncrementalCorpus, review r10): the stream
    // face of p01 must agree with the batch pass on null-text docs
    docs.withColumn("__h", md5(coalesce(col("text"), lit(""))))
      .withColumn("__event_time", eventTimeNs(timeCol))
      .withWatermark("__event_time", lateness)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h", "__event_time")

  /** Streaming NEAR-dup lookup: flag arriving documents that are
    * MinHash-LSH + exact-Jaccard near-duplicates of an EXISTING corpus —
    * the incremental face of p03's batch near-dup, for ingest-time
    * filtering against a frozen snapshot.
    *
    * Spark-first shape: the arrival's signature is a map-only column
    * expression (DedupOps.rowSignature — the grouped-min spelling would
    * be a stateful streaming aggregation), candidates come from an
    * equi-join of the arrival's 16 band hashes against the STATIC
    * `DedupOps.corpusBandIndex` (stream-static joins are stateless), and
    * the exact verify is `array_intersect` against the static shingle
    * sets — per-candidate arithmetic, no aggregation. The only state is
    * `dropDuplicatesWithinWatermark` over (doc_id, corpus_id), which
    * collapses multi-band collisions and is EVICTED at the lateness
    * horizon, so state stays bounded on an unbounded stream.
    *
    * At 100 TB the band index is a parquet table partitioned by band;
    * each micro-batch probes it with a hash join (the arrival side is
    * tiny — broadcast it per batch via AQE), and verify touches only
    * band-colliding candidates, exactly like the batch plan.
    *
    * Output (Append): one row per (arriving doc, corpus near-dup) with
    * the exact Jaccard — same pair semantics as minHashPairs restricted
    * to arrival×corpus. */
  def nearDupStream(arrivals: DataFrame, bandIndex: DataFrame,
                    shingleSets: DataFrame, tau: Double,
                    timeCol: String = "time",
                    lateness: String = "10 minutes", n: Int = 3): DataFrame = {
    import graft.ops.DedupOps
    // the ONE shingle definition (DedupOps.shingleSets) builds the
    // arrival side too — the stream must never drift from the static
    // corpusShingleSets/corpusBandIndex it joins against. Shingle-hash
    // array materialized ONCE (its own projection) — the 64
    // per-permutation mins re-scan it, they must not re-hash the strings
    val sh = DedupOps.shingleSets(arrivals, n, passthrough = Seq(timeCol))
      .withColumnRenamed("sh", "__sh")
      .withColumn("__hs", transform(col("__sh"), s => xxhash64(s)))
      .withColumn("__sig", DedupOps.rowSignature(col("__hs")))
    val cands = sh
      .select(col("doc_id"), col(timeCol), col("__sh"),
        posexplode(DedupOps.bandHashes(col("__sig"))).as(Seq("__band", "__bh")))
      .join(bandIndex,
        col("__band") === bandIndex("band") && col("__bh") === bandIndex("bh"))
      .withColumn("__event_time", eventTimeNs(timeCol))
      .withWatermark("__event_time", lateness)
      .dropDuplicatesWithinWatermark("doc_id", "corpus_id")
    cands.join(shingleSets, "corpus_id")
      .withColumn("__inter", size(array_intersect(col("__sh"), col("sh"))))
      .withColumn("j", col("__inter").cast("double") /
        (size(col("__sh")) + size(col("sh")) - col("__inter")))
      .filter(col("j") >= tau)
      .select(col("doc_id"), col("corpus_id"), round(col("j"), 6).as("j"))
  }

  /** Streaming gap-based sessionization: the streaming face of p18's
    * batch sessionize, via Spark's native `session_window` — sessions
    * merge as points arrive and CLOSE (emit) once the watermark passes
    * the session end + gap, so results are final when emitted.
    *
    * Spark-first: session_window is a built-in streaming state operator
    * (merging-window state store, keyed by (key, window)); no custom
    * state code, and state is evicted at the watermark horizon like all
    * event-time state. Output per closed session: key, session start/
    * end, event count, value sum. */
  def sessionizeStream(rows: DataFrame, keyCol: String, timeCol: String,
                       valueCol: String, gap: String = "30 minutes",
                       lateness: String = "10 minutes"): DataFrame =
    rows.withColumn("event_time", eventTimeNs(timeCol))
      .withWatermark("event_time", lateness)
      .groupBy(session_window(col("event_time"), gap), col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 6).as("sum_v"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"), col("sum_v"))

  /** Streaming CCNet perplexity gate — the streaming face of p55 for
    * ingest-time filtering: the hashed-bigram LM trains ONCE on a
    * curated/seed batch (`ModelOps.bigramLmMaps`, ≤ PplBuckets entries
    * per table at any corpus size), then every arriving document scores
    * map-only against the bound model and gates on bits-per-token.
    *
    * Spark-first: ZERO streaming state — scoring is a per-row
    * `aggregate` over the doc's own bigrams with the model as two map
    * literals, so there is no watermark, no aggregation buffer, and
    * the stream sustains any rate the executors scan at. The batch
    * tercile cut becomes a fixed `maxBptMilli` threshold (at scale the
    * threshold comes from a sampled percentile of the reference — the
    * CCNet deployment shape; the batch op's own bpt_milli distribution
    * supplies it, as the spec demonstrates). */
  def pplGateStream(arrivals: DataFrame, m12: Map[Long, Long],
                    m1: Map[Long, Long], maxBptMilli: Long): DataFrame =
    graft.ops.ModelOps.pplScore(arrivals, m12, m1)
      .withColumn("keep", col("bpt_milli") <= maxBptMilli)

  /** Streaming Dolma-style ensemble gate — the streaming face of p58:
    * all six quality gates (length, symbol fraction, duplication
    * fractions, heuristic quality) are ONE map-only projection over the
    * document text, so the batch operator applies to a streaming frame
    * UNCHANGED — stateless, watermark-free, append-mode. This wrapper
    * names that contract (and the spec drains it against the batch
    * results as its oracle). */
  def ensembleGateStream(arrivals: DataFrame): DataFrame =
    graft.ops.TextOps.ensembleGate(arrivals)

  /** Streaming decontamination screen — p72's pure-sketch face at
    * INGEST time (the natural deployment: screen arriving documents
    * against the benchmark/eval-set filter before they ever land). The
    * holdout's Bloom bits bind as one 4 KB literal and each arriving
    * doc counts its own distinct n-gram hits via a higher-order filter
    * over the doc's shingle array — no explode, no join, no
    * aggregation, ZERO streaming state. Decisions (false positives
    * included) are identical to the batch screen, as the spec drains. */
  def decontamScreenStream(arrivals: DataFrame, bits: Array[Long],
                           n: Int = graft.ops.DedupOps.DecontamN): DataFrame = {
    // the ONE shingle spelling (shared with the batch screen/oracles):
    // an inline copy here could silently drift from bloomScreen's
    val sh = graft.ops.DedupOps.shingleArr(col("text"), n)
    arrivals
      .withColumn("n_hits",
        size(filter(sh, s => graft.ops.DedupOps.bloomHit(bits, s))))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** Streaming CDC-chunk screen — p73's chunk keys at INGEST time:
    * each arriving document chunks by content-defined boundaries
    * (shift-invariant, so trailing shared content still matches) and
    * counts how many of its chunks an EXISTING corpus already stores,
    * via the corpus chunk-hash set as a constant-size Bloom sketch
    * (`DedupOps.cdcBloomBits` — 4 KB at ANY corpus size, mergeable
    * across corpus shards by bitwise OR). ZERO streaming state: the
    * bits ride as one literal, chunking + membership are per-row
    * column expressions (the decontamScreenStream pattern extended to
    * chunk keys). Bounded false positives over-count n_dup, never
    * under; the exact accounting is the batch pass (p73). */
  def cdcScreenStream(arrivals: DataFrame, bits: Array[Long]): DataFrame =
    arrivals
      .withColumn("__ch", graft.ops.DedupOps.cdcChunkHashes(col("text")))
      .withColumn("n_chunks", size(col("__ch")).cast("long"))
      .withColumn("n_dup", size(filter(col("__ch"),
        h => graft.ops.DedupOps.bloomHit(bits, h))).cast("long"))
      .withColumn("dup_milli",
        expr("(1000 * n_dup) DIV greatest(n_chunks, 1L)"))
      .drop("__ch")

  /** Streaming media-fingerprint match — p78/p79's perceptual dedup
    * keys at INGEST time: each arriving image/audio asset decodes to
    * its fingerprint (real codec decode in a Dataset mapPartitions —
    * stateless, so it runs on the stream unchanged) and matches a
    * STATIC fingerprint index `(mkind, ahash, corpus_id)` by exact
    * hash equality. The index is fingerprint rows, not media — tiny
    * next to the assets — so the stream-static join broadcasts and
    * the arriving bytes never shuffle. Append-mode, no watermark, no
    * state. Output: one row per (arriving asset, matching corpus
    * asset). */
  def mediaMatchStream(arrivals: DataFrame, index: DataFrame): DataFrame =
    graft.ops.MultimodalOps.mediaFingerprints(arrivals)
      .join(broadcast(index), Seq("mkind", "ahash"))

  /** Streaming count-min sketch — the p91 counter build run as a
    * streaming aggregation: arriving documents shingle map-side and
    * fold into the `(j, slot)`-keyed counters, whose TOTAL state is
    * ≤ d·w = 2^18 rows BY THE SKETCH'S CONSTRUCTION — a streaming
    * aggregate with a constant state bound needing no watermark to
    * stay finite (most streaming aggs bound state by time horizon;
    * this one is bounded by algebra). It is LITERALLY the batch
    * builder ([[graft.ops.SketchOps.cmsCounters]] — pure column
    * expressions + one aggregation), so batch and stream cannot
    * drift: the spec drains a two-batch stream and asserts set
    * equality with the batch face over the union. Run in
    * Update/Complete mode; the emitted counter rows merge downstream
    * by elementwise SUM (the artifact contract). */
  def cmsCounterStream(arrivals: DataFrame): DataFrame =
    graft.ops.SketchOps.cmsCounters(arrivals)

  /** Streaming arena cells — p98's Bradley–Terry input run as a
    * streaming aggregation: arriving (winner, loser) match records fold
    * into `(x, y)`-keyed game cells whose state is bounded by the
    * ITEM-PAIR count (thousands of models in any real arena), not by
    * match volume or any time horizon — the same algebra-bounded shape
    * as [[cmsCounterStream]]. It is LITERALLY the batch builder
    * ([[graft.ops.PrefOps.matchCells]]), so batch and stream cannot
    * drift; cells merge downstream by summing n and wx, and the tiny
    * MM solve ([[graft.ops.PrefOps.bradleyTerry]]'s iteration over a
    * collected snapshot) runs batch-side whenever a leaderboard is
    * wanted. Update/Complete mode. */
  def arenaCellsStream(matches: DataFrame): DataFrame =
    graft.ops.PrefOps.matchCells(matches)

  /** Streaming HDR histogram — the p92 bucket build as a streaming
    * aggregation: values bucket map-side in pure integer arithmetic
    * and fold into the idx-keyed counts, state ≤1.5 k rows by the
    * log-linear layout's construction (49-bit domain × 32/octave) —
    * the same constant-state-bound shape as [[cmsCounterStream]].
    * Same definition as the batch face
    * ([[graft.ops.SketchOps.hdrHistogram]]); quantile probes run
    * against any emitted snapshot via
    * [[graft.functions.HdrQuantile]] or the batch tail. */
  def hdrHistogramStream(rows: DataFrame, valueCol: String): DataFrame =
    graft.ops.SketchOps.hdrHistogram(rows, col(valueCol))

  /** One funnel-relevant event: stage is the 0-based index into the
    * funnel's stage list (pre-filtered — noise never enters the state). */
  final case class FunnelPoint(user: Long, timeNs: Long, stage: Int)
  /** Keyed funnel state: the max-start DP vector (starts(j) = best chain
    * start reaching stage j, Long.MinValue = unreached), the buffer of
    * events the watermark has not yet finalized, and the last emitted
    * level. */
  final case class FunnelState(starts: Seq[Long], buf: Seq[FunnelPoint], level: Int)
  /** Emitted whenever a user's funnel level increases: the new level and
    * the event time that reached it. */
  final case class FunnelAdvance(user: Long, level: Int, atNs: Long)

  /** Streaming windowFunnel: the p23 chain DP (max-start is the whole
    * per-level state) lifted to an unbounded stream with OUT-OF-ORDER
    * arrivals. The batch DP folds events in event-time order, so events
    * buffer in keyed state until the watermark passes them — no earlier
    * event can still arrive within the lateness horizon — then fold in
    * (time, stage) order. An event-time timeout fires when the
    * watermark passes the oldest buffered event, so chains complete
    * even for users that stop sending.
    *
    * State per key is O(stages) longs + the non-final buffer (bounded
    * by arrival rate × lateness horizon); emitted levels are final for
    * data within the horizon. Beyond-horizon stragglers are the batch
    * pass's job (p23), mirroring the dedupStream/p01 split.
    *
    * Eviction semantics (review r10): state is evicted once it is DEAD
    * — the funnel completed, or the watermark passed every chain's
    * reach (newest start + window). Advance levels are therefore
    * PER-JOURNEY: a user whose state was evicted and who later sends
    * stage-0 starts a new journey and re-reports its levels; a
    * downstream unique-converter count dedupes on user, not on
    * advance rows. Without dead-state eviction, every one-event user
    * would hold state forever on a high-cardinality stream. */
  def funnelStream(points: Dataset[FunnelPoint], nStages: Int, windowNs: Long,
                   lateness: String = "10 minutes"): Dataset[FunnelAdvance] = {
    import points.sparkSession.implicits._
    // out-of-contract stages cost the EVENT, not the stream (review
    // r10): starts(stage) on stage >= nStages would throw inside the
    // stateful operator, and checkpoint replay re-delivers the same
    // event — a permanent crash-loop (the StreamIngest coerce
    // discipline, state-op edition)
    val bounded = points.filter(p => p.stage >= 0 && p.stage < nStages)
    // the watermarked COLUMN must reach the stateful operator (a .map
    // that drops it fails analysis), so carry it as a tuple field
    val withTime = bounded
      .withColumn("event_time", eventTimeNs("timeNs"))
      .withWatermark("event_time", lateness)
      .as[(Long, Long, Int, java.sql.Timestamp)]
    withTime.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Int, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(
            FunnelState(Seq.fill(nStages)(Long.MinValue), Seq.empty, 0))
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          val buf = st.buf ++ rows.map(r => FunnelPoint(r._1, r._2, r._3))
          val (ready, pending) = buf.partition(_.timeNs <= wmNs)
          val starts = st.starts.toArray
          val out = Seq.newBuilder[FunnelAdvance]
          var level = st.level
          // fold finalized events in event-time order (ties: stage asc,
          // matching the batch DP's strictly-earlier row semantics for
          // in-stage-order same-time chains)
          ready.sortBy(p => (p.timeNs, p.stage)).foreach { p =>
            if (p.stage == 0) starts(0) = math.max(starts(0), p.timeNs)
            else {
              val m = starts(p.stage - 1)
              // d >= 0 mirrors the batch DP's wrap guard (r10,
              // WindowFunnelAgg): t - m for m near Long.MinValue wraps
              // negative and would pass <= windowNs for events ~2^64 ns
              // apart. Through THIS face the wrap is unreachable today —
              // the late-event filter only delivers rows at/after the
              // watermark that folded m (verified: a MinValue+1 stage-0
              // point is dropped as late in its first batch), so m <= t
              // holds — but the two faces must share one arithmetic
              // discipline: a late-filter semantics change must not
              // silently reintroduce the wrap here.
              val d = p.timeNs - m
              if (m != Long.MinValue && d >= 0 && d <= windowNs)
                starts(p.stage) = math.max(starts(p.stage), m)
            }
            val reached = p.stage + 1
            if (reached > level && starts(p.stage) != Long.MinValue) {
              level = reached
              out += FunnelAdvance(user, level, p.timeNs)
            }
          }
          // dead-state eviction (review r10 extended the completed-only
          // rule): with nothing buffered, state is dead once the funnel
          // completed OR the watermark passed every chain's reach
          // (newest start + window — no in-horizon event can extend a
          // chain after that; stage-0 re-entry builds a NEW journey).
          // Per-journey semantics documented on the class: a user
          // returning after eviction re-reports levels for the new
          // journey. Without the idle arm, one-event users accumulated
          // state forever on a high-cardinality stream.
          val newest = starts.max
          val dead = pending.isEmpty && (level >= nStages ||
            newest == Long.MinValue || wmNs > newest + windowNs)
          if (dead) state.remove()
          else {
            state.update(FunnelState(starts.toSeq, pending, level))
            if (pending.nonEmpty)
              // fire once the watermark passes the oldest buffered event
              // (+1 ms: the timeout must sit strictly past the watermark)
              state.setTimeoutTimestamp(pending.map(_.timeNs).min / 1000000L + 1)
            else
              // idle arm: fire once the watermark passes the newest
              // chain's reach, so the eviction above actually runs
              state.setTimeoutTimestamp((newest + windowNs) / 1000000L + 1)
          }
          out.result().iterator
      }
  }

  /** Custom keyed state via flatMapGroupsWithState: running count/mean
    * and inter-arrival gap per series — the kind of per-key incremental
    * statistic the reference can only compute by re-querying. State is
    * one SeriesState per key, updated per micro-batch.
    *
    * Ordering: points sort by event time WITHIN a micro-batch, but
    * flatMapGroupsWithState gives no cross-batch ordering guarantee, so
    * gaps are arrival-order across batches. A late point (event time
    * before state.lastNs) emits gap 0 and leaves lastNs at the max seen
    * — never a negative gap or a backward-moving clock. */
  def runningSeriesStats(points: Dataset[SeriesPoint],
                         idleLateness: String = "30 minutes"): Dataset[SeriesUpdate] = {
    import points.sparkSession.implicits._
    // idle-eviction (the funnelStream discipline): one state entry per
    // key EVER SEEN otherwise accumulates forever on churning key
    // spaces (session/host ids) until the state store exhausts executor
    // memory. EVENT-time timeouts, not processing-time: a key whose
    // last point falls `idleLateness` behind the watermark drops its
    // state (and restarts from zero if it reappears — running stats,
    // not an exact ledger). ProcessingTimeTimeout would ALSO make the
    // engine re-run batches continuously (shouldRunAnotherBatch is
    // always true under wall-clock timeouts — processAllAvailable never
    // returns), so event time is both the cheaper and the correct axis.
    points.toDF()
      .withColumn("__event_time", eventTimeNs("timeNs"))
      .withWatermark("__event_time", idleLateness)
      .as[(String, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeriesState, SeriesUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows0: Iterator[(String, Long, Double, java.sql.Timestamp)],
         state: GroupState[SeriesState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(SeriesState(0L, 0.0, 0L))
            val out = rows0.map(r => SeriesPoint(r._1, r._2, r._3))
              .toSeq.sortBy(_.timeNs).map { p =>
                val gap = if (st.lastNs == 0L) 0L else math.max(0L, p.timeNs - st.lastNs)
                st = SeriesState(st.count + 1, st.sum + p.value, math.max(st.lastNs, p.timeNs))
                SeriesUpdate(key, st.count, st.sum / st.count, gap)
              }
            state.update(st)
            // timeout base must sit at/after the current watermark (a
            // fully-late batch's lastNs may be behind it)
            state.setTimeoutTimestamp(
              math.max(st.lastNs / 1000000L, state.getCurrentWatermarkMs()),
              idleLateness)
            out.iterator
          }
      }
  }
}
