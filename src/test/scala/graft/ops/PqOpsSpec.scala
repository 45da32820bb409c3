package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PqOpsSpec extends SparkSpec {
  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("pqIndex encodes every non-zero vector with M codes in [0, Ksub)") {
    val idx = PqOps.pqIndex(emb, dims = 64)
    assert(idx.books.length == PqOps.M)
    assert(idx.books.forall(_.length == PqOps.Ksub))
    assert(idx.books.forall(_.forall(_.length == 64 / PqOps.M)))
    val codes = idx.codes.select("codes").collect()
      .map(_.getSeq[Int](0))
    assert(codes.nonEmpty)
    assert(codes.forall(_.length == PqOps.M))
    assert(codes.forall(_.forall(c => c >= 0 && c < PqOps.Ksub)))
  }

  test("pq training is deterministic for a fixed seed") {
    val a = PqOps.pqIndex(emb, dims = 64).books
    val b = PqOps.pqIndex(emb, dims = 64).books
    assert(a.length == b.length)
    for (j <- a.indices; c <- a(j).indices)
      assert(a(j)(c).sameElements(b(j)(c)), s"subspace $j centroid $c differs")
  }

  test("ADC top-k recall vs brute force clears the compressed-scan bar") {
    val q = emb.filter(col("vec_id") < 5)
    val idx = PqOps.pqIndex(emb, dims = 64)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(SimilarityOps.bruteForceTopK(emb, q, 10))
    val pq = hits(PqOps.pqTopKFrom(idx, q, 10, dims = 64))
    val recall = (exact & pq).size.toDouble / exact.size
    // ADC shortlist (RerankFactor*k) + exact re-rank: recall is bounded
    // by shortlist coverage only; 8-byte codes at 32x compression on
    // near-uniform random vectors still recover most true neighbors
    assert(recall >= 0.6, s"recall $recall")
  }

  test("re-ranked sims ARE the exact cosines (quantization only gates recall)") {
    val q = emb.filter(col("vec_id") < 5)
    val idx = PqOps.pqIndex(emb, dims = 64)
    val pq = PqOps.pqTopKFrom(idx, q, 10, dims = 64)
      .select("qid", "nid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = SimilarityOps.bruteForceTopK(emb, q, 500)
      .select("qid", "nid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pq.nonEmpty)
    pq.foreach { case (key, s) =>
      assert(exact.contains(key), s"$key missing from brute force")
      assert(math.abs(s - exact(key)) < 1e-9,
        s"$key: re-ranked $s vs exact ${exact(key)}")
    }
  }
}
