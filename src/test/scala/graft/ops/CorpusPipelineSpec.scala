package graft.ops

import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // tiny-corpus rare-n-gram gate: a trigram is "common" only at count
  // >= 3, so each text family appears in >= 3 docs (exact dups cluster
  // at J = 1 and collapse to one keeper — which is the point)
  private val f1 = "the quick brown fox jumps over the lazy dog again"
  private val f2 = "green ideas sleep furiously under warm bright suns mostly quietly"
  private val f2v = s"$f2 of to in is was" // stopword-rich near-dup of f2
  private val f3 = "every good boy does fine with a@b.co mailbox data here"

  private def md5hex(s: String) =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("prepare: gates junk, collapses dups to best quality, scrubs, chunks") {
    val docs = (Seq(1L, 2L, 3L).map(_ -> f1) ++
      Seq(10L, 11L, 12L).map(_ -> f2) ++ Seq(13L -> f2v) ++
      Seq(20L, 21L, 22L).map(_ -> f3) ++
      Seq(300L -> Seq.fill(12)("spam").mkString(" ")) ++ // repetition junk
      // a gram-less single-token doc: no rarity evidence -> passes the
      // rare gate VACUOUSLY (left join), must not silently vanish
      Seq(400L -> "standalone"))
      .toDF("doc_id", "text")

    val out = CorpusPipeline.prepare(docs, tau = 0.5)
      .orderBy("doc_id", "start_tok").collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> r).toMap

    // one keeper per family; junk gated; short doc survives; every
    // keeper is one chunk
    assert(byDoc.keySet == Set(1L, 13L, 20L, 400L), byDoc.keySet)
    assert(out.length == 4)
    assert(byDoc(400L).getAs[Long]("cluster_id") == 400L)
    assert(byDoc(400L).getAs[String]("chunk_text") == "standalone")

    // identical dups tie on quality -> min doc_id keeps (f1, f3)
    assert(byDoc(1L).getAs[Long]("cluster_id") == 1L)
    assert(byDoc(20L).getAs[Long]("cluster_id") == 20L)
    // f2's stopword-rich VARIANT outscores the triplet: the keeper is
    // 13 (quality argmax), while the cluster keeps min-id label 10
    assert(byDoc(13L).getAs[Long]("cluster_id") == 10L)

    // PII was scrubbed BEFORE the chunk fingerprint was taken
    val expected = md5hex(
      "every good boy does fine with <email> mailbox data here")
    assert(byDoc(20L).getAs[String]("chunk_fp") == expected)
  }

  test("prepare on an empty corpus yields no chunks (no-pair CC path)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusPipeline.prepare(empty).collect().isEmpty)
  }
}
