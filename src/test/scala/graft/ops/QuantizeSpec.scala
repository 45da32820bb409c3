package graft.ops

import graft.SparkSpec
import graft.functions.VectorExprs.dotl
import org.apache.spark.sql.functions._

/** int8 quantization + integer-domain similarity (SimilarityOps
  * .quantize/quantizedTopK, functions.DotProductLong). */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("dotl computes exact integer dot products (codegen path)") {
    val df = Seq((Array(1L, -2L, 3L), Array(4L, 5L, -6L))).toDF("a", "b")
    // 4 - 10 - 18 = -24
    assert(df.select(dotl($"a", $"b")).as[Long].head() == -24L)
    // large values stay exact where double accumulation would not
    val big = Seq((Array(1L << 40, 1L), Array(1L << 12, 3L))).toDF("a", "b")
    assert(big.select(dotl($"a", $"b")).as[Long].head() == (1L << 52) + 3L)
  }

  test("quantize maps max-abs to ±127, zeros stay zero, all-zero vector safe") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = df.select($"vec_id", SimilarityOps.quantize($"embedding").as("q"))
      .as[(Long, Array[Long])].collect().toMap
    // floor(x*127/1.0 + 0.5): 127, floor(-63.0)= -63 (floor(-63.5+0.5)), 0, floor(32.25)=32
    assert(q(1L).toSeq == Seq(127L, -63L, 0L, 32L))
    assert(q(2L).toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("quantizedTopK ranks by quantized cosine; recall vs exact is high") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = SimilarityOps.quantizedTopK(emb, k = 10, maxQid = 5)
    val rows = got.select($"qid", $"nid", $"sim", $"rn")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty && rows.forall { case (_, _, s, rn) =>
      rn >= 1 && rn <= 10 && s >= -1.0001 && s <= 1.0001 })
    // int8 quantization barely moves a 64-dim cosine: top-10 sets vs the
    // exact float scan must overlap strongly (recall ≥ 0.8 measured)
    val exact = SimilarityOps.bruteForceTopK(emb, emb.filter($"vec_id" < 5), k = 10)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val qset = rows.map { case (q, n, _, _) => (q, n) }.toSet
    val recall = qset.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall < 0.8")
  }

  test("quantized cosine stays within the int8 error bound of the float cosine") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = SimilarityOps.quantizedTopK(emb, k = 10, maxQid = 5)
      .select($"qid", $"nid", $"sim").as[(Long, Long, Double)].collect()
    val f = SimilarityOps.bruteForceTopK(emb, emb.filter($"vec_id" < 5), k = 500)
      .select($"qid", $"nid", $"sim").as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    // per-component error <= 0.5/127; over unit-ish vectors the cosine
    // error stays well under 0.05 — a loose but meaningful bound
    val errs = q.flatMap { case (a, b, s) => f.get((a, b)).map(x => math.abs(s - x)) }
    assert(errs.nonEmpty && errs.max < 0.05, s"max quantization error ${errs.max}")
  }

  test("ivfQuantizedTopK composes IVF pruning with quantized scoring") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val (km, assigned) = SimilarityOps.ivfIndex(emb, nlist = 8)
    val got = SimilarityOps.ivfQuantizedTopKWith(km, assigned, queries, k = 10, nprobe = 3)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty)
    // same pruning as the float IVF path at the same (nlist, nprobe):
    // quantization only reorders WITHIN the probed cells, so the result
    // set must overlap the float IVF top-k strongly
    val float = SimilarityOps.ivfTopKWith(km, assigned, queries, k = 10, nprobe = 3)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val overlap = got.count(float.contains).toDouble / float.size
    assert(overlap >= 0.8, s"quantized-vs-float IVF overlap $overlap < 0.8")
  }
}
