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

  private def png(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeFeatures really decodes image/* via ImageIO (2x2 PNG, exact values)") {
    // (0,0) white, (1,0) black / (0,1) red, (1,1) green
    val bytes = png(Array(Array(0xffffff, 0x000000), Array(0xff0000, 0x00ff00)))
    val assets = Seq((7L, bytes)).toDF("doc_id", "media")
      .withColumn("meta", struct(lit("image/png").as("kind"),
        octet_length($"media").as("nbytes")))
    val r = MultimodalOps.decodeFeatures(assets).collect().head
    assert(r.getAs[Int]("width") == 2 && r.getAs[Int]("height") == 2)
    val f = r.getAs[scala.collection.Seq[Float]]("features")
    assert(f.length == MultimodalOps.FeatureDims)
    val third = (1.0 / 3.0).toFloat
    // 2x4 grid over a 2x2 image fills cells 0,2,4,6; the rest stay 0
    assert(f(0) == 1.0f && f(2) == 0.0f && f(4) == third && f(6) == third, f)
    assert(f(1) == 0f && f(3) == 0f && f(5) == 0f && f(7) == 0f)
  }

  test("undecodable image/* bytes yield nulls, not fake numbers") {
    val assets = Seq((1L, "not a png at all".getBytes)).toDF("doc_id", "media")
      .withColumn("meta", struct(lit("image/png").as("kind"),
        octet_length($"media").as("nbytes")))
    val r = MultimodalOps.decodeFeatures(assets).collect().head
    assert(r.isNullAt(r.fieldIndex("width")) && r.isNullAt(r.fieldIndex("features")))
  }

  test("image/* bytes with a valid signature but corrupt body yield nulls (reader throws)") {
    val good = png(Array(Array(0xffffff, 0x000000), Array(0xff0000, 0x00ff00)))
    // keep the PNG signature + IHDR intact, garbage the rest: ImageIO
    // recognizes the format, then THROWS mid-decode
    val corrupt = good.take(33) ++ Array.fill[Byte](64)(0x5a)
    val assets = Seq((2L, corrupt)).toDF("doc_id", "media")
      .withColumn("meta", struct(lit("image/png").as("kind"),
        octet_length($"media").as("nbytes")))
    val r = MultimodalOps.decodeFeatures(assets).collect().head
    assert(r.isNullAt(r.fieldIndex("width")) && r.isNullAt(r.fieldIndex("features")))
  }

  /** 16-bit signed little-endian mono WAV: 8 windows of 100 frames, each
    * holding the constant amplitude `amps(i)`. */
  private def wav(amps: Seq[Int], framesPerWindow: Int = 100): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val n = amps.length * framesPerWindow
    val data = new Array[Byte](n * 2)
    for (f <- 0 until n) {
      val a = amps(f / framesPerWindow)
      data(2 * f) = (a & 0xff).toByte
      data(2 * f + 1) = ((a >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeFeatures really decodes audio/* WAV via javax.sound (exact RMS per window)") {
    // amplitudes i*4000 have power-of-two denominators after /32768, so
    // per-window RMS is bit-exactly amp/32768
    val amps = (0 until MultimodalOps.FeatureDims).map(_ * 4000)
    val assets = Seq((9L, wav(amps))).toDF("doc_id", "media")
      .withColumn("meta", struct(lit("audio/wav").as("kind"),
        octet_length($"media").as("nbytes")))
    val r = MultimodalOps.decodeFeatures(assets).collect().head
    assert(r.getAs[Int]("width") == 800, "width carries the frame count")
    assert(r.getAs[Int]("height") == 1, "height carries the channel count")
    val f = r.getAs[scala.collection.Seq[Float]]("features")
    val expected = amps.map(a => (a / 32768.0).toFloat)
    assert(f == expected, s"$f vs $expected")
  }

  test("undecodable audio/* bytes yield nulls, not fake numbers") {
    val assets = Seq((3L, "definitely not RIFF".getBytes)).toDF("doc_id", "media")
      .withColumn("meta", struct(lit("audio/wav").as("kind"),
        octet_length($"media").as("nbytes")))
    val r = MultimodalOps.decodeFeatures(assets).collect().head
    assert(r.isNullAt(r.fieldIndex("width")) && r.isNullAt(r.fieldIndex("features")))
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
