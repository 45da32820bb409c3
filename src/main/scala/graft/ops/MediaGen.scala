package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Deterministic REAL-media synthesis: turns the driver's text-only
  * `documents` table into a corpus of genuine PNG / WAV / animated-GIF
  * payloads so the measured multimodal decode path (p11) exercises the
  * real JDK codecs end-to-end, not a stand-in.
  *
  * Every byte is a pure function of `doc_id`, and the constructions are
  * chosen so the DECODED features are exact integer arithmetic plus one
  * IEEE double division (and one IEEE sqrt for audio) — which makes p11
  * fully oracle-checkable: DuckDB replays the same formulas bit-for-bit
  * (`decodeSql`), no rounding slop needed.
  *
  * Generation runs batched per partition on executors (mapPartitions),
  * exactly like decode — at 100 TB this slot is "read blobs from the
  * object store", and nothing downstream knows the difference.
  */
object MediaGen {
  /** Synthetic image dims: 8×4 so the decoder's 2×4 luminance grid gets
    * exactly 2×2 pixels per cell. */
  val ImgW = 8
  val ImgH = 4

  /** Synthetic WAV length: 64 mono 16-bit frames → 8 frames per RMS
    * window. */
  val AudioFrames = 64

  /** Synthetic "video": a 4-frame animated GIF (a real multi-frame
    * container the JDK can both write and read). Frames are 8×8: the
    * JDK's GIF LZW encoder drops the final row of frames shorter than
    * ~6 px (verified empirically: 8×4/16×4/8×2 all lose row h-1, 8×6
    * and up round-trip exactly). */
  val GifFrames = 4
  val GifW = 8
  val GifH = 8

  /** Gray value of image pixel (x, y) — spread over the full 0..255
    * range so cell means vary per document. */
  def pixel(docId: Long, x: Int, y: Int): Int =
    ((docId * 31 + x * 7 + y * 13) % 256).toInt

  /** Signed 16-bit PCM sample for frame f. */
  def sample(docId: Long, f: Int): Int =
    ((docId * 7919 + f * 104729L) % 65536).toInt - 32768

  /** Uniform gray of GIF frame i. */
  def gifGray(docId: Long, frame: Int): Int =
    ((docId * 17 + frame * 29) % 256).toInt

  def kindOf(docId: Long): String = (docId % 3) match {
    case 0 => "image/png"
    case 1 => "audio/wav"
    case _ => "video/gif"
  }

  /** A real PNG: TYPE_INT_RGB grayscale pixels, losslessly round-trips
    * through the JDK PNG codec. */
  def pngBytes(docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      ImgW, ImgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        val g = pixel(docId, x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A real RIFF/WAVE file: 16-bit signed little-endian mono PCM. */
  def wavBytes(docId: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](AudioFrames * 2)
    var f = 0
    while (f < AudioFrames) {
      val s = sample(docId, f)
      data(2 * f) = (s & 0xff).toByte
      data(2 * f + 1) = ((s >> 8) & 0xff).toByte
      f += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, AudioFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** 256-entry gray ramp palette: index g ↔ color (g,g,g), so indexed
    * GIF frames round-trip grays exactly (the writer keeps an explicit
    * input palette verbatim; handing it RGB input instead would quantize
    * through a fixed web palette and shift values). */
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** A real animated GIF: GifFrames full-size frames, each a single
    * uniform gray, written indexed over the exact gray-ramp palette. */
  def gifBytes(docId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var i = 0
      while (i < GifFrames) {
        val g = gifGray(docId, i)
        val img = new java.awt.image.BufferedImage(GifW, GifH,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < GifH) {
          var x = 0
          while (x < GifW) { raster.setSample(x, y, 0, g); x += 1 }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        i += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  def mediaFor(docId: Long): Array[Byte] = (docId % 3) match {
    case 0 => pngBytes(docId)
    case 1 => wavBytes(docId)
    case _ => gifBytes(docId)
  }

  private val assetSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("nbytes", IntegerType))))))

  /** documents → (doc_id, media binary, meta struct) with REAL codec
    * bytes. Batched per partition; codecs init once per batch. */
  def syntheticAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select("doc_id").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per encode
      rows.map { r =>
        val id = r.getLong(0)
        val media = mediaFor(id)
        Row(id, media, Row(kindOf(id), media.length))
      }
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** DuckDB replay of decode(synthesize(doc_id)) — the full p11 oracle.
    *
    * Exactness argument, per kind (see MultimodalOps decoders — all
    * feature math is an exact integer sum, ONE double division, and for
    * audio one IEEE-correctly-rounded sqrt; float narrowing replicated
    * via CAST AS REAL):
    *  - image: cell c of the 2×4 grid over 8×4 sums (r+g+b)=3·pixel of
    *    its 2×2 pixels → f_c = 3·Σg / (4·765.0)
    *  - audio: window w sums s² of its 8 frames → f_w = sqrt(Σs² / (8·32768²))
    *  - video: frame i is uniform gray → f_i = (32·3·g) / (32·765.0),
    *    frames ≥ GifFrames stay exactly 0
    */
  /** Integer (r+g+b) pixel-sum terms of grid cell c — the ONE
    * synthetic-pixel spelling the decode oracle (p11) and the aHash
    * oracle (p78) share (review r10: a formula change applied to one
    * copy would make the two oracles disagree about the same bytes). */
  private def imgCellTerms(c: Int): String = {
    val row = c / 4; val col = c % 4
    val terms = for (y <- Seq(2 * row, 2 * row + 1); x <- Seq(2 * col, 2 * col + 1))
      yield s"3*((doc_id*31 + ${x * 7 + y * 13}) % 256)"
    s"(${terms.mkString(" + ")})"
  }

  /** Exact integer Σs² terms of audio window w — shared by the decode
    * (p11) and energy-hash (p79) oracles, same rationale. */
  private def audioWinTerms(w: Int): String = {
    val terms = for (f <- (8 * w) until (8 * w + 8)) yield {
      val s = s"((doc_id*7919 + ${f * 104729L}) % 65536 - 32768)"
      s"$s*$s"
    }
    s"(${terms.mkString(" + ")})"
  }

  def decodeSql(fIdx: Seq[Int]): String = {
    def imgCell(c: Int): String =
      s"CAST(CAST(${imgCellTerms(c)} / (4*765.0) AS REAL) AS DOUBLE)"
    def audioWin(w: Int): String =
      s"CAST(CAST(sqrt(${audioWinTerms(w)} / (8*32768.0*32768.0)) AS REAL) AS DOUBLE)"
    def gifFrame(i: Int): String =
      if (i >= GifFrames) "CAST(0.0 AS DOUBLE)"
      else s"CAST(CAST((${GifW * GifH}*3*((doc_id*17 + ${i * 29}) % 256)) " +
        s"/ (${GifW * GifH}*765.0) AS REAL) AS DOUBLE)"
    val feats = fIdx.map(i =>
      s"""CASE doc_id % 3 WHEN 0 THEN ${imgCell(i)}
         |    WHEN 1 THEN ${audioWin(i)}
         |    ELSE ${gifFrame(i)} END AS f$i""".stripMargin)
    s"""SELECT doc_id,
       |  CASE doc_id % 3 WHEN 0 THEN $ImgW WHEN 1 THEN $AudioFrames ELSE $GifW END AS width,
       |  CASE doc_id % 3 WHEN 0 THEN $ImgH WHEN 1 THEN 1 ELSE $GifH END AS height,
       |  ${feats.mkString(",\n  ")}
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Shared oracle shape for the fingerprint queries: bit w = 1 iff
    * 8·part_w > total (the equal-count form of the exact
    * cross-multiplied mean compare the real decoders use). */
  private def fingerprintSql(partSum: Int => String, kindMod: Int,
                             table: String): String = {
    val total = (0 until 8).map(partSum).mkString(" + ")
    val bits = (0 until 8)
      .map(c => s"(CASE WHEN 8*${partSum(c)} > ($total) THEN ${1 << c} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH h AS (
       |  SELECT doc_id, CAST($bits AS BIGINT) AS ahash
       |  FROM $table WHERE doc_id % 3 = $kindMod),
       |g AS (SELECT ahash, count(*) AS n_same FROM h GROUP BY ahash)
       |SELECT h.doc_id, h.ahash, g.n_same FROM h JOIN g USING (ahash)
       |ORDER BY h.doc_id""".stripMargin
  }

  /** DuckDB oracle for the image aHash query (p78): per grid cell the
    * INTEGER luminance-triple sum of its 2×2 synthetic pixels, bit c =
    * 8·sum_c > total (the equal-cell-count form of the exact
    * cross-multiplied mean compare the real decoder uses), then group
    * sizes per hash. The REAL ImageIO decode must land on exactly these
    * integers — the p11 inductive pattern, extended from features to
    * the dedup KEY. */
  def imageAHashSql(table: String = "documents"): String =
    fingerprintSql(imgCellTerms, kindMod = 0, table)

  /** Oracle for the audio energy fingerprint (p79): window w's exact
    * integer Σs² from the synthetic PCM formula. */
  def audioEnergyHashSql(table: String = "documents"): String =
    fingerprintSql(audioWinTerms, kindMod = 1, table)
}
