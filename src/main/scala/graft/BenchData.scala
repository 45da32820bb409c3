package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived 10× scale-up of a driver test-data dir, for the bench's
  * sf1 section (VERDICT r4 #8): the clustering family's costs grow
  * with pair density, and a 10× run catches cliffs the measured SF
  * can't. The driver ships sf{0.001,0.01,0.1} only, so the bench
  * DERIVES a 10× corpus from the measured dir — replica k∈[0,10) of
  * every row with key spaces offset so joins stay consistent and
  * replicas don't collide:
  *
  *  - `documents`: replica text gets a per-replica BIJECTIVE token
  *    rename — non-stopword tokens map to a same-length hex token
  *    derived from md5(token‖k), stopwords stay verbatim. Word order
  *    and token lengths are untouched, so language ID, stop ratios,
  *    quality scores, token counts, repetition structure, and n_chars
  *    are preserved EXACTLY per replica, and within a replica two
  *    docs share an n-gram iff their originals did — pair density
  *    scales exactly linearly (replica k's pair set mirrors the
  *    original's). Across replicas the rename spaces are disjoint, so
  *    replicas share no n-grams with each other or the original.
  *    (The first cut sorted each doc's words by a GLOBAL md5(word‖k)
  *    key; that canonicalized word order corpus-wide, so every
  *    same-vocabulary doc pair became a near-dup — measured p03 at
  *    sf1 = 150 s, ~100× its sf0.1 time, an artifact not a cliff.)
  *  - `embeddings`: replica vectors are cyclically ROTATED by k —
  *    norm-preserving, cosine-decorrelated from the original, and
  *    exact-dup structure within a replica is preserved.
  *  - fact/dim tables: keys offset per replica (orderkey +k·10⁹,
  *    custkey/partkey +k·10⁷, suppkey +k·10⁵, user/event ids
  *    likewise) so every FK still resolves inside its replica;
  *    `region`/`nation` stay as-is (true dimensions).
  *
  * The derived dir is content-addressed by source dir and cached
  * under java.io.tmpdir; a `_SUCCESS` marker skips regeneration.
  * This is BENCH-ONLY data — correctness always runs on the driver's
  * own parquet.
  */
object BenchData {
  val Replicas = 10

  /** Version of the scale-up GENERATOR logic (scaled()/renamedText/
    * withK). Bump whenever derived bytes change for the same source
    * bytes (r10: the whitespace-run rename fix). Rides BOTH the
    * derived-dir key (ensureScaled) and — via [[BenchGuard.baselineKey]]
    * (r12, closing VERDICT r10 #4 for real) — the sf1 ratio-baseline
    * key persisted as SF1_RATIOS.json's `__data_fp`: a baseline frozen
    * on g_{n-1} derived bytes must not constrain g_n ratios, so a
    * version bump with unchanged source bytes hits the same loud-reset
    * path a driver data regeneration does (BenchGuardSpec pins it). */
  val GeneratorVersion = "g2"

  /** Build (or reuse) the 10× derived dir for `fromDir`; returns its
    * path. Tables are written as `<name>.parquet` DIRECTORIES, which
    * `Tables.load` reads transparently. */
  /** 64-bit content fingerprint of the source dir (also the suffix of
    * the derived-dir name). The sf1 ratio baseline is keyed on it: the
    * driver regenerates testdata between rounds, and sf1/sf0.1 ratios
    * are data-distribution-dependent — comparing a ratio measured on
    * last generation's bytes against this generation's is exactly the
    * ambiguity that stalled the r7 regression diagnosis. */
  def contentFingerprint(fromDir: String): String = {
    val tok = graft.util.Fingerprint.dirToken(fromDir)
    (if (tok.matches("[0-9a-f]{32}")) tok
     else java.security.MessageDigest.getInstance("MD5")
       .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .take(16)
  }

  def ensureScaled(spark: SparkSession, fromDir: String): String = {
    // content fingerprint in the derived-dir name: the driver
    // REGENERATES the source testdata between rounds, so a path-only
    // key would silently reuse a 10x corpus derived from last round's
    // bytes and the sf1 section would compare different corpora (the
    // SCALE.md immutable-snapshot-dir lesson, here for the bench)
    // first 16 hex chars of the md5 dir token (64 bits) — NOT a 32-bit
    // hashCode collapse, which would reopen the silent-collision class
    // the md5 token exists to close; non-directory fallback tokens
    // (remote schemes) md5 once more so the name stays path-safe
    // the derived bytes are a function of (source content, GENERATOR
    // version): a generation-logic change (r10: the whitespace-run
    // rename fix) must not silently reuse a prior build of the same
    // source bytes. The version rides the fp token so the sibling
    // eviction treats old-generator dirs as stale generations too.
    val fp = contentFingerprint(fromDir) + GeneratorVersion
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft-bench10x-" + new java.io.File(fromDir).getCanonicalPath
        .replaceAll("[^a-zA-Z0-9]", "_") + "-" + fp)
    val marker = new java.io.File(base, "_SUCCESS")
    if (!marker.isFile) {
      // evict SIBLING generations first: the fingerprint names a new
      // multi-hundred-MB dir per driver regeneration and nothing else
      // ever deletes the old ones — tmp would fill by GBs over rounds
      // until generation dies with ENOSPC mid-bench
      val prefix = base.getName.substring(0, base.getName.lastIndexOf('-') + 1)
      Option(base.getParentFile.listFiles()).foreach(_.foreach { f =>
        if (f.getName.startsWith(prefix) && f.getName != base.getName)
          graft.util.Fingerprint.deleteRecursively(f)
      })
      Tables.names.foreach { n =>
        // the source SF is often one file -> one partition; written
        // as-is the 10× table lands in ONE file/row-group and every
        // scan serializes on one core (measured: q16 14.3 s at sf1 =
        // 40× its sf0.1 time from a single 7 MB events file). Spread
        // to cores-many files so sf1 scans parallelize like real data.
        val df = scaled(spark, fromDir, n)
        val spread = if (n == "region" || n == "nation") df else df.repartition(32)
        spread.write.mode("overwrite").parquet(s"${base.getAbsolutePath}/$n.parquet")
      }
      marker.getParentFile.mkdirs()
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }
    base.getAbsolutePath
  }

  private def withK(df: DataFrame): DataFrame =
    df.withColumn("k", explode(sequence(lit(0L), lit(Replicas - 1L))))

  /** Deterministic per-replica bijective token rename: k=0 keeps the
    * original text; k>0 maps each non-stopword `^[a-z]+$` token to the
    * same-length prefix of repeat(md5(token‖'·'‖k)) — injective per
    * (length, k) up to md5-prefix collisions (negligible above 2-3
    * chars; the test corpus vocabulary is ~30 words). Stopword tokens
    * (the langid lexicons) and any token outside `^[a-z]+$` stay
    * verbatim, so language ID, stop ratios, quality scores, and
    * repetition structure are preserved exactly, while replica k's
    * n-gram match structure mirrors the original's (bijections
    * preserve n-gram equality) and replicas share nothing with each
    * other — EXCEPT all-stopword n-grams (stopwords stay verbatim in
    * every replica), whose candidate groups therefore grow ~Replicas²
    * rather than linearly; the driver corpora carry only a handful of
    * such shingles today, but a stopword-heavy regeneration would
    * reintroduce a superlinear sf1 artifact through this class — if a
    * ratio guard ever fires on a shingle query, check Σdf² of
    * stopword-only shingles (shingleCostStats) before blaming the plan. Tokens longer than 96 chars would truncate to 96 — none
    * exist in the driver corpora (max doc 577 chars). */
  private val StopWords: Seq[String] =
    graft.ops.TextOps.Lexicons.flatMap(_._2.split("\\|")).distinct

  private def renamedText(text: org.apache.spark.sql.Column,
                          k: org.apache.spark.sql.Column) =
    // split on the LITERAL single space, not \s+ (review r10): "\\s+"
    // collapsed whitespace RUNS in k>0 replicas, breaking the
    // length/n_chars-preserved invariant the header documents. With
    // " " the empty tokens of a run survive the round-trip ("a  b" →
    // ["a","","b"] → "a  b"), and a token carrying a tab/newline fails
    // ^[a-z]+$ so it stays verbatim (length preserved; it shares
    // across replicas like stopwords do — same documented class)
    when(k === 0, text).otherwise(
      concat_ws(" ", transform(split(text, " ", -1), w =>
        when(w.rlike("^[a-z]+$") && !w.isin(StopWords: _*),
          repeat(md5(concat(w, lit("·"), k)), 3).substr(lit(1), length(w)))
          .otherwise(w))))

  private[graft] def scaled(spark: SparkSession, dir: String, name: String): DataFrame = {
    val t = Tables.load(spark, dir, name)
    val k = col("k")
    name match {
      case "region" | "nation" => t // true dimensions: never scaled
      case "documents" =>
        // rename projected ONCE (review r10): the per-token md5 HOF is
        // the dominant generation cost and was evaluated again inside
        // length(); same-length rename + preserved separators keep
        // n_chars = length(text)
        withK(t).select(
          (col("doc_id") + k * 10000000L).as("doc_id"),
          renamedText(col("text"), k).as("text"),
          col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      case "embeddings" =>
        // rotate by k: concat(slice(v,k+1,n-k), slice(v,1,k))
        val v = col("embedding")
        withK(t).select(
          (col("vec_id") + k * 10000000L).as("vec_id"),
          when(k === 0, v).otherwise(concat(
            slice(v, (k + 1).cast("int"), (size(v) - k).cast("int")),
            slice(v, lit(1), k.cast("int")))).as("embedding"),
          col("label"))
      case "lineitem" =>
        withK(t).select(
          (col("l_orderkey") + k * 1000000000L).as("l_orderkey"),
          (col("l_partkey") + k * 10000000L).as("l_partkey"),
          (col("l_suppkey") + k * 100000L).as("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate"))
      case "orders" =>
        withK(t).select(
          (col("o_orderkey") + k * 1000000000L).as("o_orderkey"),
          (col("o_custkey") + k * 10000000L).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      case "customer" =>
        withK(t).select(
          (col("c_custkey") + k * 10000000L).as("c_custkey"),
          col("c_name"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment"))
      case "supplier" =>
        withK(t).select(
          (col("s_suppkey") + k * 100000L).as("s_suppkey"),
          col("s_name"), col("s_nationkey"), col("s_acctbal"))
      case "part" =>
        withK(t).select(
          (col("p_partkey") + k * 10000000L).as("p_partkey"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
          col("p_retailprice"))
      case "events" =>
        withK(t).select(
          (col("event_id") + k * 1000000000L).as("event_id"),
          col("ts"),
          (col("user_id") + k * 10000000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
      case other =>
        throw new IllegalArgumentException(s"no scale rule for table $other")
    }
  }
}
