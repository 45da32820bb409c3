package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs() = Seq(
    (0L, "hello world this is a binary payload"),
    (1L, "another asset with different bytes"),
  ).toDF("doc_id", "text")

  test("asAssets carries binary media + typed metadata") {
    val a = MultimodalOps.asAssets(docs())
    assert(a.schema("media").dataType.typeName == "binary")
    val m = a.select($"meta.kind", $"meta.nbytes").as[(String, Int)].collect()
    assert(m.forall(_._1 == "text/plain") && m.head._2 == 36)
  }

  test("decodeFeatures (stub) is deterministic with fixed-width vectors") {
    val f1 = MultimodalOps.decodeFeatures(MultimodalOps.asAssets(docs()))
      .orderBy("doc_id").collect()
    val f2 = MultimodalOps.decodeFeatures(MultimodalOps.asAssets(docs()))
      .orderBy("doc_id").collect()
    assert(f1.sameElements(f2))
    assert(f1.forall(_.getAs[Seq[Float]]("features").length == MultimodalOps.FeatureDims))
    assert(f1.forall(r => r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 32))
  }

  test("sampleFrames cuts fixed-offset byte windows") {
    val fr = MultimodalOps.sampleFrames(MultimodalOps.asAssets(docs()), 3, 8)
      .filter($"doc_id" === 0).orderBy("frame")
      .select("frame_bytes").as[Array[Byte]].collect()
    assert(fr.length == 3)
    assert(new String(fr(0)) == "hello wo")
    assert(new String(fr(1)) == "rld this")
  }

  test("resizeAssets bounds media size, small assets pass through") {
    val assets = MultimodalOps.asAssets(
      Seq((1L, "x" * 100), (2L, "short")).toDF("doc_id", "text"))
    val r = MultimodalOps.resizeAssets(assets, maxBytes = 16)
      .select($"doc_id", octet_length($"media").as("n"), $"meta.resized")
      .as[(Long, Int, Boolean)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 16, true), (2L, 5, false)))
  }
}
