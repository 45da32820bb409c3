package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct. The Spark-side dataflow
  * (schema, partitioning, per-partition batch decode) is real; image
  * decode (JDK ImageIO) and WAV/PCM audio decode (javax.sound.sampled)
  * are REAL too — only the video codec is a deterministic, clearly
  * marked stand-in (no video codec ships with the JDK or container).
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

  /** REAL image decode via the JDK's ImageIO (PNG/BMP/JPEG/GIF readers
    * ship with the JVM — zero extra dependencies). Features are the mean
    * luminance of a 2×4 pixel grid, one float in [0,1] per cell; a grid
    * cell outside a tiny image stays 0. Returns None when the bytes are
    * not a decodable image (unrecognized OR corrupt: a valid signature
    * with a broken body makes the reader THROW rather than return null —
    * the contract is one bad asset degrades to null features, never a
    * failed job). */
  private[ops] def imageDecode(media: Array[Byte]): Option[(Int, Int, Array[Float])] = try {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val sum = new Array[Double](FeatureDims)
      val cnt = new Array[Long](FeatureDims)
      var y = 0
      while (y < h) {
        val row = (y * 2) / h // 2 grid rows
        var x = 0
        while (x < w) {
          val cell = row * 4 + (x * 4) / w // 4 grid cols
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
          sum(cell) += lum; cnt(cell) += 1
          x += 1
        }
        y += 1
      }
      val feat = Array.tabulate(FeatureDims)(i =>
        if (cnt(i) == 0) 0f else (sum(i) / cnt(i)).toFloat)
      Some((w, h, feat))
    }
  } catch { // IIOException on corrupt body; some plugins throw unchecked
    case _: java.io.IOException | _: RuntimeException => None
  }

  /** REAL audio decode for WAV/PCM via the JDK's javax.sound.sampled —
    * zero extra dependencies. The frame stream splits into FeatureDims
    * equal windows; feature i is the RMS energy of window i across all
    * channels, normalized to [0,1]. Returns (frames, channels, features);
    * None when the bytes are not decodable 8/16-bit PCM audio. */
  private[ops] def audioDecode(media: Array[Byte]): Option[(Int, Int, Array[Float])] = try {
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
        if (frames == 0) Some((0, channels, new Array[Float](FeatureDims)))
        else {
          val sum = new Array[Double](FeatureDims)
          val cnt = new Array[Long](FeatureDims)
          var f = 0
          while (f < frames) {
            val win = ((f.toLong * FeatureDims) / frames).toInt
            var c = 0
            while (c < channels) {
              val off = f * frameSize + c * bytesPerSample
              val s =
                if (bits == 8) {
                  if (enc == PCM_UNSIGNED) ((bytes(off) & 0xff) - 128) / 128.0
                  else bytes(off) / 128.0
                } else {
                  val (hi, lo) =
                    if (fmt.isBigEndian) (bytes(off), bytes(off + 1))
                    else (bytes(off + 1), bytes(off))
                  val raw = (hi.toInt << 8) | (lo & 0xff)
                  val v = if (enc == PCM_UNSIGNED) (raw & 0xffff) - 32768 else raw
                  v / 32768.0
                }
              sum(win) += s * s; cnt(win) += 1
              c += 1
            }
            f += 1
          }
          val feat = Array.tabulate(FeatureDims)(i =>
            if (cnt(i) == 0) 0f else math.sqrt(sum(i) / cnt(i)).toFloat)
          Some((frames, channels, feat))
        }
      }
    } finally in.close()
  } catch {
    case _: javax.sound.sampled.UnsupportedAudioFileException |
         _: java.io.IOException | _: RuntimeException => None
  }

  /** STUB — deterministic fake "decode" for VIDEO (and unknown) kinds: a
    * real implementation would decode the container and emit frame
    * features (no video codec ships with the JDK). Image and audio kinds
    * decode for REAL above. The Spark plumbing (binary in, fixed-width
    * float vector + dims out, batched per partition) is the real
    * contract; only `fakeDecode` is fake. */
  private def fakeDecode(media: Array[Byte]): (Int, Int, Array[Float]) = {
    // ??? real codec goes here; deterministic stand-in below
    var h = 1125899906842597L
    media.foreach(b => h = h * 31 + b)
    val w = 16 + math.floorMod(h, 16).toInt
    val ht = 16 + math.floorMod(h >> 8, 16).toInt
    val feat = Array.tabulate(FeatureDims) { i =>
      val z = h * (2 * i + 1) + i
      (math.floorMod(z, 1000).toInt / 1000.0f)
    }
    (w, ht, feat)
  }

  /** Batched per-partition decode: binary media → (width, height,
    * feature vector). `meta.kind` routes the codec: image kinds (prefix
    * "image/") through the REAL ImageIO decoder, audio kinds (prefix
    * "audio/") through the REAL javax.sound WAV/PCM decoder — for both,
    * undecodable bytes yield nulls, not fake numbers; remaining (video)
    * kinds keep the deterministic stand-in.
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
            if (media == null) None
            else if (kind != null && kind.startsWith("image/")) imageDecode(media)
            else if (kind != null && kind.startsWith("audio/")) audioDecode(media)
            else Some(fakeDecode(media))
          decoded match {
            case Some((w, h, f)) => Row(r.getLong(0), w, h, f)
            case None => Row(r.getLong(0), null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame sampling: cut `frames` fixed-offset byte windows per asset —
    * the video-frame-extraction dataflow shape (explode → per-frame rows,
    * all columnar; a real codec would seek keyframes instead of offsets). */
  def sampleFrames(assets: DataFrame, frames: Int, frameBytes: Int): DataFrame =
    assets.select(col("doc_id"), col("media"),
        explode(sequence(lit(0), lit(frames - 1))).as("frame"))
      .filter(octet_length(col("media")) > col("frame") * frameBytes)
      .select(col("doc_id"), col("frame"),
        expr(s"substring(media, frame * $frameBytes + 1, $frameBytes)").as("frame_bytes"))

  /** Resize plumbing: media → fixed-budget media' + updated metadata.
    * STUB resample (proportional byte subsampling stands in for a pixel
    * resampler — same contract: bounded output size, metadata reflects
    * the new dimensions); runs batched per partition like decode, and
    * the metadata predicate (`meta.nbytes <= maxBytes` passes through
    * untouched) prunes before any "codec" work. */
  def resizeAssets(assets: DataFrame, maxBytes: Int): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("kind", StringType),
        StructField("nbytes", IntegerType),
        StructField("resized", BooleanType))))))
    val rdd = assets.select("doc_id", "media", "meta.kind").rdd.mapPartitions { rows =>
      // per-partition codec init would happen here
      rows.map { r =>
        val media = r.getAs[Array[Byte]]("media")
        if (media == null) Row(r.getLong(0), null, Row(r.getString(2), 0, false))
        else {
          val out =
            if (media.length <= maxBytes) media
            else { // ??? real resampler goes here; proportional subsample stand-in
              val step = media.length.toDouble / maxBytes
              Array.tabulate(maxBytes)(i => media((i * step).toInt))
            }
          Row(r.getLong(0), out, Row(r.getString(2), out.length, media.length > maxBytes))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
