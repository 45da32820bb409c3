package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct. The Spark-side dataflow
  * (schema, partitioning, per-partition batch decode) is real; the codec
  * itself is STUBBED with a deterministic fake (this container has no
  * image/audio libraries) and clearly marked below.
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

  /** STUB — deterministic fake "decode": a real implementation would
    * decode image/audio bytes and emit features. The Spark plumbing
    * (binary in, fixed-width float vector + dims out, batched per
    * partition) is the real contract; only `fakeDecode` is fake. */
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
    * feature vector). mapPartitions keeps codec init per-batch, not
    * per-row. */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val rdd = assets.select("doc_id", "media").rdd.mapPartitions { rows =>
      // per-partition codec init would happen here
      rows.map { r =>
        val media = r.getAs[Array[Byte]]("media")
        if (media == null) Row(r.getLong(0), null, null, null)
        else {
          val (w, h, f) = fakeDecode(media)
          Row(r.getLong(0), w, h, f)
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
