package graft.ops

import graft.SparkSpec
import graft.IncrementalPrepare
import org.apache.spark.sql.functions._

class IncrementalCorpusSpec extends SparkSpec {
  import spark.implicits._

  // corpus families à la CorpusPipelineSpec: each trigram appears in
  // >= 3 docs so the rare-n-gram gate passes; exact dups collapse in
  // the pipeline itself
  private val f1 = "the quick brown fox jumps over the lazy dog again"
  private val f3 = "every good boy does fine with proper mailbox data here"
  private val f4 = "seven silver ships sail slowly beyond calm harbor walls tonight"

  test("screen drops exact and near dups of the seen corpus, keeps new docs") {
    val corpus = (Seq(1L, 2L, 3L).map(_ -> f1)).toDF("doc_id", "text")
    val fps = IncrementalCorpus.fingerprints(corpus)
    val bands = DedupOps.corpusBandIndex(corpus)
    val shingles = DedupOps.corpusShingleSets(corpus)
    val batch = Seq(
      50L -> f1,                      // exact dup
      51L -> s"$f1 of to in is was",  // near dup (J > 0.5 vs f1)
      60L -> f4,                      // new
      70L -> "tiny"                   // too short to shingle: passes
    ).toDF("doc_id", "text")
    val kept = IncrementalCorpus.screen(batch, fps, bands, shingles, tau = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(60L, 70L), kept)
  }

  test("null-text duplicates do not slip the exact screen (review r10)") {
    // md5(null) is null and a null key never joins: with raw md5(text)
    // a null-text arrival duplicating a null-text corpus doc was 'kept'
    val corpus = Seq((1L, Option.empty[String]), (2L, Some(f1)))
      .toDF("doc_id", "text")
    val fps = IncrementalCorpus.fingerprints(corpus)
    val bands = DedupOps.corpusBandIndex(corpus)
    val shingles = DedupOps.corpusShingleSets(corpus)
    val batch = Seq((50L, Option.empty[String]), (51L, Some(f4)))
      .toDF("doc_id", "text")
    val kept = IncrementalCorpus.screen(batch, fps, bands, shingles, tau = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(51L), kept)
    val fates = IncrementalCorpus.screenReport(batch, fps, bands, shingles, 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fates == Map(50L -> "exact", 51L -> "kept"), fates)
  }

  test("corpus band index collapses exact-dup clusters; verdicts unchanged") {
    // 500 exact copies in the seen corpus (a stream-side mega-cluster):
    // the index must carry ONE row set per distinct text, not 500 —
    // otherwise every colliding arrival joins 500 identical entries
    val corpus = ((1 to 500).map(_.toLong -> f1) :+ (900L -> f3)).toDF("doc_id", "text")
    val bands = DedupOps.corpusBandIndex(corpus, collapseExact = true)
    assert(bands.count() == 2L * DedupOps.Bands) // 2 distinct texts x 16 bands
    assert(DedupOps.corpusShingleSets(corpus, collapseExact = true).count() == 2L)
    // representative ids follow the exactGroups min-id survivor contract
    assert(bands.select("corpus_id").distinct().as[Long].collect().toSet ==
      Set(1L, 900L))
    // and screening against the collapsed index gives the same fates
    val fps = IncrementalCorpus.fingerprints(corpus)
    val shingles = DedupOps.corpusShingleSets(corpus, collapseExact = true)
    val batch = Seq(50L -> f1, 51L -> s"$f1 of to in is was", 60L -> f4)
      .toDF("doc_id", "text")
    val fates = IncrementalCorpus
      .screenReport(batch, fps, bands, shingles, tau = 0.5)
      .as[(Long, String)].collect().toMap
    assert(fates == Map(50L -> "exact", 51L -> "near", 60L -> "kept"), fates)
  }

  test("screenReport assigns fates: exact wins over near, kept matches screen()") {
    val corpus = (Seq(1L, 2L, 3L).map(_ -> f1) :+ (4L -> f3)).toDF("doc_id", "text")
    val fps = IncrementalCorpus.fingerprints(corpus)
    val bands = DedupOps.corpusBandIndex(corpus)
    val shingles = DedupOps.corpusShingleSets(corpus)
    val batch = Seq(
      50L -> f1,                      // exact dup (ALSO a near dup: exact must win)
      51L -> s"$f1 of to in is was",  // near dup only
      60L -> f4,                      // new
      70L -> "tiny"                   // too short to shingle: kept vacuously
    ).toDF("doc_id", "text")
    val fates = IncrementalCorpus
      .screenReport(batch, fps, bands, shingles, tau = 0.5)
      .as[(Long, String)].collect().toMap
    assert(fates == Map(50L -> "exact", 51L -> "near", 60L -> "kept", 70L -> "kept"),
      fates)
    // the fate ledger and the survivor set are the same decision
    val kept = IncrementalCorpus.screen(batch, fps, bands, shingles, tau = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(fates.filter(_._2 == "kept").keySet == kept)
  }

  test("runs unchanged on a lakehouse table dir (metadata.json beside the parquet)") {
    val root = java.nio.file.Files.createTempDirectory("inclh").toString
    val part = s"$root/table/date=2024-01-01/hour=01"
    Seq(1L, 2L, 3L).map(_ -> f1).toDF("doc_id", "text")
      .write.mode("append").parquet(part)
    // the manifest the lakehouse writer leaves in every partition dir —
    // a naive parquet read attempts it as parquet and fails the round
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$part/metadata.json"),
      """{"type":"index","files":[]}""".getBytes("UTF-8"))
    val (r0, a0) = IncrementalPrepare.run(spark, s"$root/table", s"$root/state")
    assert(r0 == 0 && a0 == 3L)
    assert(spark.read.parquet(s"$root/state/chunks")
      .select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("band recall: candidates are a superset of true >=tau pairs (p49 corpus + split)") {
    // p49's oracle computes true ALL-PAIRS Jaccard while screenReport
    // only verifies band-colliding candidates — the differential check
    // relies on band recall being 1 at this tau/band config. Assert it
    // on the ACTUAL p49 inputs (driver documents table, same hash-gated
    // seen/new split, same exact-survivor gating), via a brute-force
    // all-pairs sweep over the same shingle sets.
    val tau = graft.queries.PipelineQueries.NearDupTau
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bucket = SampleOps.hashBucket(col("doc_id"))
    val seen = docs.filter(bucket < graft.queries.PipelineQueries.CrossSeenBuckets)
    val newb = docs.filter(bucket >= graft.queries.PipelineQueries.CrossSeenBuckets)
    val exactNew = newb.withColumn("__fp", md5(col("text")))
      .join(IncrementalCorpus.fingerprints(seen).select(col("fp").as("__fp")),
        Seq("__fp"), "left_anti").drop("__fp")
    val cands = IncrementalCorpus
      .bandCandidates(exactNew, DedupOps.corpusBandIndex(seen))
      .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
    val truePairs = DedupOps.shingleSets(exactNew)
      .select(col("doc_id"), col("sh").as("nsh"))
      .crossJoin(DedupOps.corpusShingleSets(seen))
      .withColumn("__i", size(array_intersect(col("nsh"), col("sh"))))
      .filter(col("__i").cast("double") /
        (size(col("nsh")) + size(col("sh")) - col("__i")) >= tau)
      .select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(truePairs.nonEmpty,
      "no true near pairs across the split — recall assertion would be vacuous")
    assert(truePairs.subsetOf(cands),
      s"band probe MISSED true near pairs: ${truePairs -- cands}")
  }

  test("rounds accumulate: only new content is pipelined; re-run of a crashed round is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("inc").toString
    val in = s"$root/docs"
    val state = s"$root/state"

    // round 0: families f1 and f3
    (Seq(1L, 2L, 3L).map(_ -> f1) ++ Seq(20L, 21L, 22L).map(_ -> f3))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    val (r0, a0) = IncrementalPrepare.run(spark, in, state)
    assert(r0 == 0 && a0 == 6L)
    val chunks0 = spark.read.parquet(s"$state/chunks")
      .select("doc_id").as[Long].collect().toSet
    assert(chunks0 == Set(1L, 20L), chunks0) // one keeper per family

    // round 1: a new file with an exact dup of f1, a near dup of f3,
    // and a genuinely new family f4
    (Seq(50L -> f1, 51L -> s"$f3 of to in is was") ++
      Seq(60L, 61L, 62L).map(_ -> f4))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    val (r1, a1) = IncrementalPrepare.run(spark, in, state)
    assert(r1 == 1 && a1 == 3L, s"only the f4 docs pass screening ($a1)")
    val chunks1 = spark.read.parquet(s"$state/chunks")
      .select("doc_id").as[Long].collect().toSet
    assert(chunks1 == Set(1L, 20L, 60L), chunks1)

    // nothing new: a no-op round that does not advance state
    val (r2, a2) = IncrementalPrepare.run(spark, in, state)
    assert(r2 == 2 && a2 == 0L)
    assert(spark.read.parquet(s"$state/processed")
      .agg(max(col("round"))).head().getInt(0) == 1)

    // crash simulation: delete round 1's commit marker; its orphaned
    // fps/band state must not screen out its own re-run
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    rm(java.nio.file.Paths.get(s"$state/processed/round=1"))
    val (r3, a3) = IncrementalPrepare.run(spark, in, state)
    assert(r3 == 1 && a3 == 3L, "replayed round reaches the same verdicts")
    val replayed = spark.read.parquet(s"$state/chunks")
      .select("doc_id").as[Long].collect().toSet
    assert(replayed == Set(1L, 20L, 60L), replayed)
    // state carries exactly one copy of round 1 (overwritten, not
    // doubled): the screened batch is three copies of f4 -> 1 distinct fp
    assert(spark.read.parquet(s"$state/fps").filter(col("round") === 1)
      .count() == 1L)
  }
}
