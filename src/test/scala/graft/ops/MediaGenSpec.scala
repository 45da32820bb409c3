package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** decode(synthesize(doc_id)) must equal the closed-form feature
  * formulas the DuckDB oracle replays (MediaGen.decodeSql) — per kind,
  * for every feature slot, bit-for-bit. This is what turns p11 from a
  * rows-only check into a hash-checked row. */
class MediaGenSpec extends SparkSpec {
  import spark.implicits._

  /** The same arithmetic decodeSql renders, evaluated in Scala. */
  private def expectedF(id: Long, i: Int): Float = (id % 3) match {
    case 0 => // image: 2×2-pixel cell mean, exact integer sum
      val row = i / 4; val col = i % 4
      val s = (for (y <- Seq(2 * row, 2 * row + 1); x <- Seq(2 * col, 2 * col + 1))
        yield 3L * MediaGen.pixel(id, x, y)).sum
      (s / (4 * 765.0)).toFloat
    case 1 => // audio: RMS of the window's 8 frames
      val s = (8 * i until 8 * i + 8).map { f =>
        val v = MediaGen.sample(id, f).toLong; v * v
      }.sum
      math.sqrt(s / (8 * 32768.0 * 32768.0)).toFloat
    case _ => // video: uniform-gray frame mean; absent frames exactly 0
      if (i >= MediaGen.GifFrames) 0f
      else {
        val npix = MediaGen.GifW * MediaGen.GifH
        ((npix * 3L * MediaGen.gifGray(id, i)) / (npix * 765.0)).toFloat
      }
  }

  test("synthetic assets are real media with the right kinds and bytes") {
    val docs = (0L until 6L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
    val a = MediaGen.syntheticAssets(docs).orderBy("doc_id").collect()
    assert(a.map(_.getAs[org.apache.spark.sql.Row]("meta").getString(0)).toSeq ==
      Seq("image/png", "audio/wav", "video/gif", "image/png", "audio/wav", "video/gif"))
    val png = a(0).getAs[Array[Byte]]("media")
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val wav = a(1).getAs[Array[Byte]]("media")
    assert(new String(wav.take(4)) == "RIFF")
    val gif = a(2).getAs[Array[Byte]]("media")
    assert(new String(gif.take(3)) == "GIF")
    assert(a.forall(r => r.getAs[org.apache.spark.sql.Row]("meta").getInt(1) ==
      r.getAs[Array[Byte]]("media").length))
  }

  test("decode(synthesize(id)) equals the oracle formulas bit-for-bit, all slots") {
    val docs = (0L until 12L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
    val decoded = MultimodalOps.decodeFeatures(MediaGen.syntheticAssets(docs))
      .orderBy("doc_id").collect()
    assert(decoded.length == 12)
    decoded.foreach { r =>
      val id = r.getLong(0)
      val (ew, eh) = (id % 3) match {
        case 0 => (MediaGen.ImgW, MediaGen.ImgH)
        case 1 => (MediaGen.AudioFrames, 1)
        case _ => (MediaGen.GifW, MediaGen.GifH)
      }
      assert(r.getAs[Int]("width") == ew && r.getAs[Int]("height") == eh,
        s"dims for doc $id: ${r.getAs[Int]("width")}x${r.getAs[Int]("height")}")
      val f = r.getAs[scala.collection.Seq[Float]]("features")
      (0 until MultimodalOps.FeatureDims).foreach { i =>
        assert(f(i) == expectedF(id, i),
          s"doc $id (${MediaGen.kindOf(id)}) f$i: ${f(i)} vs ${expectedF(id, i)}")
      }
    }
  }

  test("generation is deterministic (same id -> same bytes)") {
    Seq(0L, 1L, 2L, 300L, 301L, 302L).foreach { id =>
      assert(MediaGen.mediaFor(id).toSeq == MediaGen.mediaFor(id).toSeq, s"doc $id")
    }
  }
}
