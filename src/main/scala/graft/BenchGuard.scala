package graft

/** Measurement-integrity helpers for [[Bench]]'s sf1 ratio guard,
  * extracted pure so specs can pin the adjudication behavior without a
  * bench run (VERDICT r11 #1-#2 — the r11 record *claimed* this
  * machinery shipped; this object is it actually shipping).
  *
  * Three features live here:
  *  - the ratio-baseline KEY carries the scale-up generator version
  *    (VERDICT r10 #4): ratios measured on g_n derived bytes must never
  *    compare against a baseline frozen on g_{n-1} bytes, even when the
  *    SOURCE bytes are identical — a generator-logic change alters the
  *    derived corpus and with it every data-distribution-dependent
  *    ratio. A version bump now hits the same loud-reset path a driver
  *    data regeneration does.
  *  - provenance: `head_sha` + `tree_dirty` recorded in BENCH_DETAIL,
  *    so a flag adjudication can prove WHICH code a record measured
  *    (rounds 9-11 each spent a session re-establishing exactly that)
  *    and the bench-at-final-HEAD round rule becomes checkable.
  *  - sentinel normalization: a plan-stable probe measured inside each
  *    confirm window separates machine load from plan regressions at
  *    record time — a candidate whose elevation matches the sentinel's
  *    concurrent drift self-clears as environment instead of costing
  *    the next round an adjudication session.
  */
object BenchGuard {

  /** The sf1 ratio-baseline key: source content fingerprint + scale-up
    * generator version. Empty stays empty (fingerprint unavailable →
    * the guard disarms rather than comparing garbage). */
  def baselineKey(contentFp: String): String =
    if (contentFp.isEmpty) "" else contentFp + BenchData.GeneratorVersion

  /** The `__data_fp` value persisted in a LEGACY single-section
    * SF1_RATIOS.json, if any. Accepts both the legacy bare-hex form and
    * the versioned form — a legacy value never equals a versioned key,
    * so the first run after the version joined the key resets loudly
    * (correct: the legacy baseline's generator is unknown). */
  def parsePrevFp(ratioTxt: String): Option[String] =
    """"__data_fp":"([0-9a-zA-Z]+)"""".r.findFirstMatchIn(ratioTxt).map(_.group(1))

  /** Baselines are namespaced PER (data-fp, generator) key inside the
    * one SF1_RATIOS.json (r13 incident: the file used to hold exactly
    * one fp, so an sf0.001 SMOKE bench overwrote the committed sf0.1
    * baseline, and the next full run silently re-anchored against its
    * own values — the anti-ratchet freeze was destroyed by a run that
    * never intended to touch it). Format 2 is
    * `{"__format":2,"<fp>":{…flat ratios/abs…},…}`; a legacy
    * single-section file (`{"__data_fp":"<fp>", …flat…}`) reads as one
    * section under its own fp, so the first format-2 write migrates it
    * losslessly. Sections are flat numeric maps — the `[^{}]*` body
    * match is exact, not approximate. */
  private val SectionRe = """"([0-9a-zA-Z]+)":\{([^{}]*)\}""".r

  def baselineSections(ratioTxt: String): Map[String, String] =
    if (ratioTxt.contains("\"__format\":2"))
      SectionRe.findAllMatchIn(ratioTxt).map(m => m.group(1) -> m.group(2)).toMap
    else parsePrevFp(ratioTxt) match {
      case Some(fp) =>
        val body = ratioTxt.trim.stripPrefix("{").stripSuffix("}").trim
          .replaceAll(""""__data_fp":"[0-9a-zA-Z]+",?""", "")
          .stripSuffix(",")
        Map(fp -> body)
      case None => Map.empty
    }

  /** This fp's frozen section, if the file carries one. */
  def baselineSection(dataFp: String, ratioTxt: String): Option[String] =
    if (dataFp.isEmpty) None else baselineSections(ratioTxt).get(dataFp)

  /** Render the whole multi-section file with `dataFp`'s section
    * replaced by `sectionBody` (flat `"k":v,…` text, no braces) and
    * every OTHER fp's section preserved verbatim — the write path that
    * makes cross-SF clobbering structurally impossible. */
  def renderBaselineFile(prevTxt: String, dataFp: String,
                         sectionBody: String): String =
    (baselineSections(prevTxt) + (dataFp -> sectionBody)).toSeq.sortBy(_._1)
      .map { case (fp, b) => s""""$fp":{$b}""" }
      .mkString("""{"__format":2,""", ",", "}")

  /** True when a prior baseline file exists but carries NO section for
    * this (data bytes, generator version) key — start a fresh section
    * loudly instead of flagging every data-sensitive query as a plan
    * regression. Other fps' sections are unaffected either way. A
    * missing fingerprint disarms (nothing to compare). */
  def baselineReset(dataFp: String, ratioTxt: String): Boolean =
    dataFp.nonEmpty && ratioTxt.nonEmpty &&
      baselineSection(dataFp, ratioTxt).isEmpty

  /** The two-dimension regression rule (r8, unchanged): the ratio grew
    * >1.5× over the frozen baseline, the sf1 absolute is past the noise
    * floor, and — when the baseline carries absolutes — the absolute
    * itself grew >1.25×. */
  def trips(prevRatio: Option[Double], prevAbs: Option[Double],
            ratio: Double, abs: Double): Boolean =
    prevRatio.exists(p => p > 0 && ratio > p * 1.5) &&
      abs >= 1.0 &&
      prevAbs.forall(pa => abs > pa * 1.25)

  /** Concurrent-load factor observed by the sentinel during a confirm
    * window: how much slower the plan-stable probe ran than its own
    * clean measurement earlier in the same section. Never below 1 (a
    * faster-than-base sentinel is noise, not negative load); invalid
    * measurements (failed probe, missing base) mean "no evidence" → 1. */
  def sentinelDrift(sentinel: Double, sentinelBase: Double): Double =
    if (sentinel > 0 && sentinelBase > 0) math.max(1.0, sentinel / sentinelBase)
    else 1.0

  /** The confirm window's drift over MULTIPLE probe shapes (r13,
    * VERDICT r12 #1: the CPU/scan probe measured CALM through the load
    * that elevated the exchange-heavy p44 — shuffle/disk contention is
    * invisible to a probe that never shuffles). Load that only one
    * probe observes is still load, so the max wins; each input is
    * already floored at 1 by [[sentinelDrift]]. */
  def combinedDrift(drifts: Double*): Double =
    drifts.foldLeft(1.0)(math.max)

  /** A confirm rep with the sentinel's concurrent drift divided out —
    * the steady-state estimate the flag decision should see when the
    * window was loaded. Failed reps (<=0) pass through untouched. */
  def normalizedConfirm(confirm: Double, drift: Double): Double =
    if (confirm > 0) confirm / math.max(1.0, drift) else confirm

  /** How far past the sentinel drift a candidate's elevation may run
    * and still count as "explained by the window's load": beyond
    * drift × this, the elevation has an independent component and
    * dividing the drift out would self-clear a true regression that
    * happened to coincide with load (ADVICE r12 — the old
    * unconditional division was one-directional toward false
    * negatives). 1.5 mirrors the ratio trip line: the same margin that
    * separates "regression" from "noise" separates "load explains it"
    * from "load doesn't". */
  val ElevationTol = 1.5

  /** The effective sf1 absolute the final trip rule sees for a
    * confirmed candidate: the best clean evidence available — the raw
    * best-of (reps + confirm) or the sentinel-normalized confirm,
    * whichever is lower. A candidate whose elevation ≈ the sentinel's
    * drift normalizes back under the threshold and self-clears as
    * environment; a true regression re-measures slow against a calm
    * sentinel and stays flagged with three consistent reps on record.
    *
    * `elevation` = confirm / prev_abs when a prior baseline exists
    * (non-positive = unknown → normalize as before): normalization
    * applies only when the drift EXPLAINS the elevation
    * (elevation ≤ drift × [[ElevationTol]]) — a candidate running 4×
    * its baseline under a 1.3×-drifted window keeps its raw read. */
  def effectiveAbs(rawAbs: Double, confirm: Double, drift: Double,
                   elevation: Double = -1.0): Double = {
    val explained = elevation <= 0 || elevation <= drift * ElevationTol
    val norm = normalizedConfirm(confirm, drift)
    if (explained && norm > 0) math.min(rawAbs, norm) else rawAbs
  }

  /** Git provenance of the measuring tree, empty-safe: `head_sha` is ""
    * and `tree_dirty` None when git is unavailable (the record then
    * carries `"tree_dirty":null` — unknown, not clean). */
  def gitProvenance(repoDir: java.io.File = new java.io.File(".")): (String, Option[Boolean]) = {
    def run(cmd: Seq[String]): Option[String] =
      try {
        val p = new ProcessBuilder(cmd: _*).directory(repoDir)
          .redirectErrorStream(false).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        if (p.waitFor() == 0) Some(out) else None
      } catch { case _: Throwable => None }
    val sha = run(Seq("git", "rev-parse", "HEAD")).map(_.trim).getOrElse("")
    val dirty = run(Seq("git", "status", "--porcelain")).map(_.trim.nonEmpty)
    (sha, dirty)
  }
}
