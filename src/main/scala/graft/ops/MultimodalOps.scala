package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct. The Spark-side dataflow
  * (schema, partitioning, per-partition batch decode) is real, and so are
  * ALL the measured codecs: images via JDK ImageIO (PNG/BMP/JPEG/GIF),
  * WAV/PCM audio via javax.sound.sampled, and multi-frame "video" via
  * ImageIO's frame reader (animated GIF — the one multi-frame container
  * the JDK decodes natively). Video containers the JDK has no codec for
  * (mp4 …) yield null features, honestly — a production deployment drops
  * an ffmpeg-style codec into the same per-partition init slot.
  *
  * Feature math is integer accumulation + one double division per cell
  * (order-independent, exactly replayable in SQL — see MediaGen.decodeSql,
  * which makes the p11 correctness row hash-checked end-to-end).
  *
  * At 100 TB: binary payloads stay columnar in parquet, metadata predicates
  * prune before any decode, and decode runs once per partition batch via
  * mapPartitions (the Scala analog of mapInPandas batching) — never per-row
  * driver code.
  */
object MultimodalOps {

  /** Wrap a text table as a binary "asset" table: (id, media binary,
    * meta struct<kind, nbytes>). Stands in for reading real media blobs. */
  def asAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        lit("text/plain").as("kind"),
        octet_length(col("text").cast("binary")).as("nbytes")).as("meta"))

  /** Per-asset stats via pure column ops (oracle-checkable): byte length
    * and the hex of the first 8 *characters* re-encoded (char-based so the
    * DuckDB rendering is byte-identical for any UTF-8 input). */
  def assetStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      octet_length(col("text").cast("binary")).as("nbytes"),
      hex(substring(col("text"), 1, 8).cast("binary")).as("head8"))

  val FeatureDims = 8

  /** Mean luminance per 2×4 grid cell of one frame, accumulated as exact
    * integer (r+g+b) sums with ONE double division per cell — order-
    * independent and bit-replayable in SQL. Cells outside a tiny image
    * stay 0. */
  /** Exact integer (r+g+b) luminance sums + pixel counts per 2×4 grid
    * cell — the ONE cell-accumulation spelling the feature face
    * (luminanceGrid) and the dedup-key face (imageAHash) both build on
    * (review r10: it existed twice; the oracles assume one grid
    * definition). */
  private def cellSums(
      img: java.awt.image.BufferedImage): (Array[Long], Array[Long]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = new Array[Long](FeatureDims)
    val cnt = new Array[Long](FeatureDims)
    var y = 0
    while (y < h) {
      val row = (y * 2) / h // 2 grid rows
      var x = 0
      while (x < w) {
        val cell = row * 4 + (x * 4) / w // 4 grid cols
        val rgb = img.getRGB(x, y)
        sum(cell) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    (sum, cnt)
  }

  /** Guarded ImageIO decode — None for unrecognized/corrupt bytes (the
    * ONE decode spelling; review r10: it was inlined four times). */
  private[ops] def safeImageRead(
      media: Array[Byte]): Option[java.awt.image.BufferedImage] =
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media)))

  private def luminanceGrid(img: java.awt.image.BufferedImage): Array[Float] = {
    val (sum, cnt) = cellSums(img)
    Array.tabulate(FeatureDims)(i =>
      if (cnt(i) == 0) 0f else (sum(i) / (cnt(i) * 765.0)).toFloat)
  }

  /** REAL image decode via the JDK's ImageIO (PNG/BMP/JPEG/GIF readers
    * ship with the JVM — zero extra dependencies). Features are the mean
    * luminance of a 2×4 pixel grid, one float in [0,1] per cell. Returns
    * None when the bytes are not a decodable image (unrecognized OR
    * corrupt: a valid signature with a broken body makes the reader THROW
    * rather than return null — the contract is one bad asset degrades to
    * null features, never a failed job). */
  private[ops] def imageDecode(media: Array[Byte]): Option[(Int, Int, Array[Float])] = try {
    safeImageRead(media).map(img =>
      (img.getWidth, img.getHeight, luminanceGrid(img)))
  } catch { // IIOException on corrupt body; some plugins throw unchecked
    case _: java.io.IOException | _: RuntimeException => None
  }

  /** REAL multi-frame "video" decode via ImageIO's sequence reader —
    * covers animated GIF, the one multi-frame container with a built-in
    * JDK codec. Feature i is the mean luminance of frame i (first
    * FeatureDims frames; missing frames stay exactly 0); width/height
    * come from frame 0. Returns None for containers the JDK can't read
    * (mp4 …) or corrupt bytes. */
  /** Run `f` against ImageIO's sequence reader for `media`, holding the
    * reader lifecycle (input stream, setInput, dispose/close ordering)
    * in ONE place (review r10: videoDecode and extractFrames carried
    * verbatim copies). None when no installed reader claims the bytes.
    * `f`'s result must be fully materialized before returning — the
    * reader is disposed on exit; decode exceptions propagate to the
    * caller's catch. */
  private def withFrameReader[T](media: Array[Byte])(
      f: javax.imageio.ImageReader => T): Option[T] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(media))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try { reader.setInput(iis); Some(f(reader)) }
        finally reader.dispose()
      }
    } finally iis.close()
  }

  private[ops] def videoDecode(media: Array[Byte]): Option[(Int, Int, Array[Float])] = try {
    withFrameReader(media) { reader =>
      val n = reader.getNumImages(true)
      if (n <= 0) None
      else {
        var w0 = 0; var h0 = 0
        val feat = new Array[Float](FeatureDims)
        var i = 0
        while (i < n && i < FeatureDims) {
          val img = reader.read(i)
          if (i == 0) { w0 = img.getWidth; h0 = img.getHeight }
          // per-frame mean luminance: exact integer sum, one division
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          feat(i) = (sum / (img.getWidth.toLong * img.getHeight * 765.0)).toFloat
          i += 1
        }
        Some((w0, h0, feat))
      }
    }.flatten
  } catch {
    case _: java.io.IOException | _: RuntimeException => None
  }

  /** REAL audio decode for WAV/PCM via the JDK's javax.sound.sampled —
    * zero extra dependencies. The frame stream splits into FeatureDims
    * equal windows; feature i is the RMS energy of window i across all
    * channels, normalized to [0,1]. Returns (frames, channels, features);
    * None when the bytes are not decodable 8/16-bit PCM audio. */
  /** The shared REAL PCM decode: per-window exact integer Σs² and
    * sample counts (plus the bit-depth denominator) — the ONE loop the
    * RMS features and the energy fingerprint both consume, so the two
    * faces can never drift. */
  private[ops] def audioRaw(media: Array[Byte])
      : Option[(Int, Int, Double, Array[Long], Array[Long])] = try {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(media))
    try {
      import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      if ((enc != PCM_SIGNED && enc != PCM_UNSIGNED) || (bits != 8 && bits != 16) ||
          fmt.getFrameSize <= 0) None
      else {
        val bytes = in.readAllBytes()
        val channels = fmt.getChannels
        val frameSize = fmt.getFrameSize
        val bytesPerSample = bits / 8
        val frames = bytes.length / frameSize
        val den = (1L << (bits - 1)).toDouble
        val sumSq = new Array[Long](FeatureDims)
        val cnt = new Array[Long](FeatureDims)
        var f = 0
        while (f < frames) {
          val win = ((f.toLong * FeatureDims) / frames).toInt
          var c = 0
          while (c < channels) {
            val off = f * frameSize + c * bytesPerSample
            val s =
              if (bits == 8) {
                if (enc == PCM_UNSIGNED) (bytes(off) & 0xff) - 128
                else bytes(off).toInt
              } else {
                val (hi, lo) =
                  if (fmt.isBigEndian) (bytes(off), bytes(off + 1))
                  else (bytes(off + 1), bytes(off))
                val raw = (hi.toInt << 8) | (lo & 0xff)
                if (enc == PCM_UNSIGNED) (raw & 0xffff) - 32768 else raw
              }
            sumSq(win) += s.toLong * s; cnt(win) += 1
            c += 1
          }
          f += 1
        }
        Some((frames, channels, den, sumSq, cnt))
      }
    } finally in.close()
  } catch {
    case _: javax.sound.sampled.UnsupportedAudioFileException |
         _: java.io.IOException | _: RuntimeException => None
  }

  private[ops] def audioDecode(media: Array[Byte]): Option[(Int, Int, Array[Float])] =
    audioRaw(media).map { case (frames, channels, den, sumSq, cnt) =>
      // exact integer Σs² per window + ONE double division + IEEE
      // sqrt: order-independent, bit-replayable in SQL (s² ≤ 2^30,
      // so a window stays exact below 2^33 samples)
      val feat = Array.tabulate(FeatureDims)(i =>
        if (cnt(i) == 0) 0f
        else math.sqrt(sumSq(i) / (cnt(i) * den * den)).toFloat)
      (frames, channels, feat)
    }

  /** Energy-envelope fingerprint of a PCM clip: bit w = 1 iff window
    * w's mean energy (Σs²/count) exceeds the whole-clip mean, compared
    * by exact 128-bit integer cross-multiplication (the image aHash's
    * audio sibling — loudness scaling that preserves envelope ordering
    * keeps the hash; exact at any clip length). */
  private[ops] def audioEnergyHash(media: Array[Byte]): Option[Int] =
    audioRaw(media).map { case (_, _, _, sumSq, cnt) =>
      val ts = sumSq.sum
      val tc = cnt.sum
      var bits = 0
      var w = 0
      while (w < FeatureDims) {
        if (cnt(w) > 0 && cmpProd(sumSq(w), tc, cnt(w), ts) > 0) bits |= 1 << w
        w += 1
      }
      bits
    }

  /** Batched per-partition decode: binary media → (width, height,
    * feature vector). `meta.kind` routes the codec, and every route is a
    * REAL decoder: image kinds → ImageIO still-image decode, audio kinds
    * → javax.sound WAV/PCM decode, video kinds → ImageIO multi-frame
    * decode (animated GIF). Undecodable bytes — corrupt payloads, containers
    * with no JDK codec, unknown kinds — yield nulls, never fake numbers.
    * mapPartitions keeps codec init per-batch, not per-row. */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val rdd = assets.select(col("doc_id"), col("media"), col("meta.kind"))
      .rdd.mapPartitions { rows =>
        // codec init, once per batch: ImageIO otherwise backs EVERY
        // in-memory decode with a temp-file cache (per-row disk I/O)
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val media = r.getAs[Array[Byte]]("media")
          val kind = r.getString(2)
          val decoded: Option[(Int, Int, Array[Float])] =
            if (media == null || kind == null) None
            else if (kind.startsWith("image/")) imageDecode(media)
            else if (kind.startsWith("audio/")) audioDecode(media)
            else if (kind.startsWith("video/")) videoDecode(media)
            else None
          decoded match {
            case Some((w, h, f)) => Row(r.getLong(0), w, h, f)
            case None => Row(r.getLong(0), null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** a·b vs c·d for non-negative longs in FULL 128-bit precision — the
    * cross-multiplied mean compares below stay exact at ANY image/clip
    * size (a 12000² image's sum_c·totalCnt overflows a bare long). */
  private def cmpProd(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = java.lang.Math.multiplyHigh(a, b)
    val hi2 = java.lang.Math.multiplyHigh(c, d)
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }

  /** Perceptual average-hash (aHash) of a decoded image over the SAME
    * 2×4 luminance grid the feature decoder uses: bit c = 1 iff cell
    * c's mean luminance exceeds the whole-image mean, compared by exact
    * 128-bit integer cross-multiplication (sum_c·totalCnt >
    * cnt_c·totalSum — no division, no overflow, so the REAL-decode face
    * and the arithmetic oracle can never disagree on a boundary).
    * Identical structural light/dark layout ⇒ identical hash at any
    * brightness scale shift that preserves ordering — the classic
    * near-dup key for image dedup. */
  private[ops] def imageAHash(media: Array[Byte]): Option[Int] = try {
    safeImageRead(media).map { img =>
      val (sum, cnt) = cellSums(img)
      val totalSum = sum.sum
      val totalCnt = cnt.sum
      var bits = 0
      var c = 0
      while (c < FeatureDims) {
        if (cnt(c) > 0 && cmpProd(sum(c), totalCnt, cnt(c), totalSum) > 0)
          bits |= 1 << c
        c += 1
      }
      bits
    }
  } catch {
    case _: java.io.IOException | _: RuntimeException => None
  }

  /** (doc_id, ahash) for every decodable asset of `kindPrefix`, hashed
    * by `hash` — batched per-partition like decodeFeatures; other kinds
    * and corrupt bytes contribute no rows. */
  private def fingerprints(assets: DataFrame, kindPrefix: String,
                           hash: Array[Byte] => Option[Int]): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ahash", LongType)))
    val rdd = assets.select(col("doc_id"), col("media"), col("meta.kind"))
      .rdd.mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val media = r.getAs[Array[Byte]]("media")
          val kind = r.getString(2)
          if (media == null || kind == null || !kind.startsWith(kindPrefix)) None
          else hash(media).map(h => Row(r.getLong(0), h.toLong))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Perceptual image hashes (see [[imageAHash]]). */
  def imageAHashes(assets: DataFrame): DataFrame =
    fingerprints(assets, "image/", imageAHash)

  /** Audio energy-envelope hashes (see [[audioEnergyHash]]). */
  def audioEnergyHashes(assets: DataFrame): DataFrame =
    fingerprints(assets, "audio/", audioEnergyHash)

  /** (doc_id, mkind, ahash) for every decodable image AND audio asset
    * in ONE decode pass — Dataset-typed mapPartitions instead of the
    * RDD path, so the SAME operator runs over a batch frame or an
    * unbounded STREAMING frame (stateless; RDDs don't exist on a
    * stream). `mkind` ∈ {image, audio} namespaces the two 8-bit hash
    * families so a match join can't cross modalities. Corrupt bytes
    * and other kinds contribute no rows, as in [[imageAHashes]]. */
  def mediaFingerprints(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("media"), col("meta.kind").as("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, media, kind) =>
          if (media == null || kind == null) None
          else if (kind.startsWith("image/"))
            imageAHash(media).map(h => (id, "image", h.toLong))
          else if (kind.startsWith("audio/"))
            audioEnergyHash(media).map(h => (id, "audio", h.toLong))
          else None
        }
      }.toDF("doc_id", "mkind", "ahash")
  }

  /** REAL video-frame extraction: decode each video asset's frames via
    * the ImageIO sequence reader (animated GIF), re-encode every sampled
    * frame as a standalone PNG, and explode to one row per frame —
    * (doc_id, frame, frame_media, width, height). `step` keeps every
    * step-th frame (frame sampling); undecodable assets contribute no
    * rows. Runs batched per partition like decode. */
  def extractFrames(assets: DataFrame, step: Int = 1): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame", IntegerType),
      StructField("frame_media", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val rdd = assets.select(col("doc_id"), col("media"), col("meta.kind"))
      .rdd.mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val media = r.getAs[Array[Byte]]("media")
          val kind = r.getString(2)
          if (media == null || kind == null || !kind.startsWith("video/")) Iterator.empty
          else try {
            withFrameReader(media) { reader =>
              val n = reader.getNumImages(true)
              // materialize inside the reader's lifetime: the rows must
              // not be produced lazily after reader.dispose()
              (0 until n by step).map { i =>
                val src = reader.read(i)
                // normalize onto a plain sRGB canvas: encoding the
                // reader's palette image directly makes the JDK PNG
                // writer emit a gAMA chunk that shifts every pixel
                // (85 -> 156) on the next decode
                val img = new java.awt.image.BufferedImage(src.getWidth,
                  src.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g2 = img.createGraphics()
                g2.drawImage(src, 0, 0, null)
                g2.dispose()
                val out = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(img, "png", out)
                Row(r.getLong(0), i, out.toByteArray, img.getWidth, img.getHeight)
              }
            }.map(_.iterator).getOrElse(Iterator.empty)
          } catch {
            case _: java.io.IOException | _: RuntimeException => Iterator.empty
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** REAL image resize: decode image kinds, downscale anything wider or
    * taller than `maxDim` (aspect preserved, bilinear), re-encode as
    * PNG, and update the metadata. Non-image kinds and small images pass
    * through untouched (`resized = false`); undecodable image bytes
    * degrade to a null media column. The metadata predicate shape still
    * prunes before any codec work. */
  def resizeImages(assets: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("kind", StringType),
        StructField("nbytes", IntegerType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("resized", BooleanType))))))
    val rdd = assets.select(col("doc_id"), col("media"), col("meta.kind"))
      .rdd.mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val media = r.getAs[Array[Byte]]("media")
          val kind = r.getString(2)
          def passThrough = Row(r.getLong(0), media, Row(kind,
            if (media == null) 0 else media.length, null, null, false))
          if (media == null || kind == null || !kind.startsWith("image/")) passThrough
          else {
            val decoded =
              try safeImageRead(media)
              catch { case _: java.io.IOException | _: RuntimeException => None }
            decoded match {
              case None => Row(r.getLong(0), null, Row(kind, 0, null, null, false))
              case Some(img) if img.getWidth <= maxDim && img.getHeight <= maxDim =>
                Row(r.getLong(0), media, Row(kind, media.length,
                  img.getWidth, img.getHeight, false))
              case Some(img) =>
                val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
                val (nw, nh) = (math.max(1, (img.getWidth * scale).round.toInt),
                  math.max(1, (img.getHeight * scale).round.toInt))
                val bytes = bilinearPng(img, nw, nh)
                Row(r.getLong(0), bytes, Row("image/png", bytes.length, nw, nh, true))
            }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame sampling: cut `frames` fixed-offset byte windows per asset —
    * the video-frame-extraction dataflow shape (explode → per-frame rows,
    * all columnar; a real codec would seek keyframes instead of offsets). */
  def sampleFrames(assets: DataFrame, frames: Int, frameBytes: Int): DataFrame = {
    // frames=0 would NOT be empty: sequence(0, -1) descends (default
    // step -1) and emits two bogus frame rows per asset with negative-
    // offset substring garbage (review r10; the sibling ops' require
    // precedent)
    require(frames > 0, "sampleFrames: frames must be positive")
    require(frameBytes > 0, "sampleFrames: frameBytes must be positive")
    assets.select(col("doc_id"), col("media"),
        explode(sequence(lit(0), lit(frames - 1))).as("frame"))
      .filter(octet_length(col("media")) > col("frame") * frameBytes)
      .select(col("doc_id"), col("frame"),
        expr(s"substring(media, frame * $frameBytes + 1, $frameBytes)").as("frame_bytes"))
  }

  /** Bilinear downscale + PNG re-encode — the one pixel resampler both
    * resize faces share (JDK-only: Graphics2D bilinear interpolation). */
  private def bilinearPng(img: java.awt.image.BufferedImage,
                          nw: Int, nh: Int): Array[Byte] = {
    val dst = new java.awt.image.BufferedImage(nw, nh,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = dst.createGraphics()
    g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g2.drawImage(img, 0, 0, nw, nh, null)
    g2.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", out)
    out.toByteArray
  }

  /** Fit an image into a byte budget: scale dims by √(budget/actual)
    * (PNG size tracks pixel count to first order), bilinear-resample,
    * re-encode; halve again while the encoding still overflows. Returns
    * None when even 1×1 doesn't fit or the bytes don't decode. */
  private def resampleToBudget(media: Array[Byte],
                               maxBytes: Int): Option[(Array[Byte], Int, Int)] =
    try {
      safeImageRead(media)
        .flatMap { img =>
          var scale = math.min(1.0, math.sqrt(maxBytes.toDouble / media.length))
          var res: Option[(Array[Byte], Int, Int)] = None
          var attempts = 0
          while (res.isEmpty && attempts < 12) {
            val nw = math.max(1, (img.getWidth * scale).round.toInt)
            val nh = math.max(1, (img.getHeight * scale).round.toInt)
            val bytes = bilinearPng(img, nw, nh)
            if (bytes.length <= maxBytes) res = Some((bytes, nw, nh))
            else if (nw == 1 && nh == 1) attempts = 12 // floor reached: give up
            else { scale /= 2; attempts += 1 }
          }
          res
        }
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Resize plumbing: media → fixed-budget media' + updated metadata.
    * Image kinds get a REAL pixel resample (bilinear downscale sized to
    * the byte budget, PNG re-encode — resampleToBudget); non-image kinds
    * fall back to proportional byte subsampling (same bounded-output
    * contract — a real audio/video transcoder slots in per kind). Runs
    * batched per partition like decode, and the metadata predicate
    * (`meta.nbytes <= maxBytes` passes through untouched) prunes before
    * any codec work. */
  def resizeAssets(assets: DataFrame, maxBytes: Int): DataFrame = {
    require(maxBytes >= 1, s"maxBytes must be >= 1, got $maxBytes")
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("kind", StringType),
        StructField("nbytes", IntegerType),
        StructField("resized", BooleanType))))))
    val rdd = assets.select("doc_id", "media", "meta.kind").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per decode
      def subsample(media: Array[Byte]): Array[Byte] = {
        val step = media.length.toDouble / maxBytes
        Array.tabulate(maxBytes)(i => media((i * step).toInt))
      }
      rows.map { r =>
        val media = r.getAs[Array[Byte]]("media")
        val kind = r.getString(2)
        if (media == null) Row(r.getLong(0), null, Row(kind, 0, false))
        else if (media.length <= maxBytes)
          Row(r.getLong(0), media, Row(kind, media.length, false))
        else if (kind != null && kind.startsWith("image/"))
          resampleToBudget(media, maxBytes) match {
            case Some((bytes, _, _)) =>
              // re-encoded as PNG — the kind follows the bytes
              Row(r.getLong(0), bytes, Row("image/png", bytes.length, true))
            case None => // undecodable or budget below a 1x1 PNG
              val out = subsample(media)
              Row(r.getLong(0), out, Row(kind, out.length, true))
          }
        else {
          val out = subsample(media)
          Row(r.getLong(0), out, Row(kind, out.length, true))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
