package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash group-by), n-gram Jaccard (inverted-index
  * pair-join), MinHash+LSH (banded candidate generation → exact verify),
  * SimHash (banded Hamming), embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - every stage is a shuffle on a key with bounded fan-in (shingle,
  *    band hash) — no driver-side state, no collect;
  *  - MinHash/SimHash candidate generation is linear in corpus size and
  *    shuffles only (band, hash) pairs, not document text;
  *  - exact-verify joins happen only on the candidate set;
  *  - `maxShingleDf` drops hyper-frequent shingles (stop-shingles) to cap
  *    inverted-index skew at scale (off by default for oracle parity).
  */
object DedupOps {

  /** Exact dedup groups: one row per distinct text with the survivor id.
    * A pure hash aggregate — partial map-side combine, single shuffle. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dups"))

  /** doc_id → distinct n-gram (word) shingles, exploded. */
  def shingles(docs: DataFrame, n: Int = 3,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = TextOps.tokens(col(textCol))
    val sh = transform(
      sequence(lit(1), greatest(size(w) - (n - 1), lit(0))),
      i => concat_ws(" ", slice(w, i, lit(n))))
    docs.select(col(idCol).as("doc_id"), explode(array_distinct(sh)).as("s"))
  }

  /** Near-duplicate pairs by exact n-gram Jaccard ≥ tau.
    * Inverted index on shingle → pair counts → |A∩B| / (|A|+|B|-|A∩B|).
    * At 100 TB set maxShingleDf to drop stop-shingles before the pair join. */
  def ngramJaccardPairs(docs: DataFrame, tau: Double, n: Int = 3,
                        maxShingleDf: Option[Long] = None): DataFrame = {
    val sh = shingles(docs, n).cache()
    val pruned = maxShingleDf match {
      case Some(m) =>
        val hot = sh.groupBy("s").count().filter(col("count") > m).select("s")
        sh.join(hot, Seq("s"), "left_anti")
      case None => sh
    }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = pruned.as("a").join(pruned.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        (col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c"))).as("j"))
      .filter(col("j") >= tau)
  }

  /** DuckDB oracle for ngramJaccardPairs / minHashPairs (n=3). */
  def jaccardPairsSql(tau: Double, order: String = "da, db"): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') w FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(w) - 1, 1)), i -> w[i]||' '||w[i+1]||' '||w[i+2]))) s
       |  FROM toks),
       |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id da, b.doc_id db, count(*) c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da, db, round(c * 1.0 / (sa.n + sb.n - c), 6) AS j
       |FROM common
       |JOIN sizes sa ON sa.doc_id = da
       |JOIN sizes sb ON sb.doc_id = db
       |WHERE c * 1.0 / (sa.n + sb.n - c) >= $tau
       |ORDER BY $order""".stripMargin

  // ---- MinHash + LSH ----
  // 64 hash "permutations" h_i(x) = xxhash64(x, i) over xxhash64(shingle),
  // banded 16×4. Re-hashing with the index as salt avoids 64-bit multiply
  // overflow (Spark 4 ANSI mode) and is exactly as uniform.
  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  /** doc_id → minhash signature (array<long> of NumHashes mins). */
  def minHashSignatures(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = shingles(docs, n).withColumn("h", xxhash64(col("s")))
    val mins = (0 until NumHashes).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until NumHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: equal band hash in ≥1 of the 16 bands. */
  def minHashCandidates(sigs: DataFrame): DataFrame = {
    val bands = sigs.select(
      col("doc_id"),
      posexplode(array((0 until Bands).map(b =>
        xxhash64((b * RowsPerBand until (b + 1) * RowsPerBand)
          .map(i => col("sig")(i)): _*)): _*)).as(Seq("band", "bh")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs, exact-Jaccard-verified ≥ tau.
    * Candidate generation is O(corpus) + a band-key shuffle; the exact
    * verify join touches only candidates. */
  def minHashPairs(docs: DataFrame, tau: Double, n: Int = 3): DataFrame = {
    val cands = minHashCandidates(minHashSignatures(docs, n))
    val sh = shingles(docs, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = cands
      .join(sh.as("x"), col("da") === col("x.doc_id"))
      .join(sh.as("y"), col("db") === col("y.doc_id") && col("x.s") === col("y.s"))
      .groupBy("da", "db").agg(count(lit(1)).as("c"))
    common
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"),
        (col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c"))).as("j"))
      .filter(col("j") >= tau)
  }

  // ---- SimHash: 64-bit signature from token-hash bit votes ----

  /** doc_id → 64-bit simhash + the 4 16-bit bands used for pair search. */
  def simHashSignatures(docs: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val votes = (0 until 64).map(i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"v$i"))
    val sig = (0 until 64).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_.bitwiseOR(_))
    tok.groupBy("doc_id").agg(votes.head, votes.drop(1): _*)
      .select(col("doc_id"), sig.as("simhash"))
      .select(Seq(col("doc_id"), col("simhash")) ++
        (0 until 4).map(b =>
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as(s"band$b")): _*)
  }

  /** Pairs with Hamming distance ≤ maxDist (≤3 guaranteed found by the
    * 4×16 band pigeonhole). */
  def simHashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sigs = simHashSignatures(docs).cache()
    val bands = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b => col(s"band$b")): _*)).as(Seq("band", "bh")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Embedding-cosine near-duplicate pairs (exact, blocked self-join).
    * The LSH-bucketed scale path is SimilarityOps.hyperplaneBuckets. */
  def embeddingNearDupPairs(emb: DataFrame, tau: Double): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        SimilarityOps.cosine(col("a.embedding"), col("b.embedding")).as("sim"))
      .filter(col("sim") >= tau)
  }
}
