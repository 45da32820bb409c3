package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.ingest.IngestWriter
import graft.lineproto.LineProtocolParser
import graft.lineproto.LineProtocolParser.{FieldType, Precision}

/** The 100 TB ingest path: Structured Streaming over a landing directory
  * of line-protocol text, parsed *in executors* (the parser is pure Scala
  * with no driver state), micro-batched by the trigger exactly like the
  * reference's 1 s flush ticker (reference merge_tree_service.go:201-213
  * — its "streaming" IS micro-batched buffered ingest, SURVEY §2.5; no
  * watermarks/event-time state exist in the reference surface).
  *
  * Unlike the driver-buffered BufferedIngest (reference-shaped), parsing,
  * row materialization AND the sorted parquet write here scale with
  * executor count: each micro-batch keeps its executor partitioning and
  * every task writes its own sorted file (IngestWriter singleFile=false);
  * only the manifest commit is driver-coordinated.
  */
object StreamIngest {

  /** Declared stream schema: (name, reference type name) pairs — a
    * production firehose has a fixed measurement schema; dynamic-schema
    * streams go through the HTTP path.
    *
    * Contract: each stream OWNS its landing directory. Unprefixed lines
    * in it belong to this stream's (db, table); `db.table`-prefixed
    * lines for anything else are dropped. Pointing two streams with
    * different specs at one landing dir double-claims unprefixed
    * traffic — give each stream its own dir (the reference equivalently
    * scopes its WAL per table). */
  final case class StreamSpec(db: String, table: String,
                              columns: Seq[(String, String)])

  def sparkField(nameType: (String, String)): StructField =
    StructField(nameType._1, graft.catalog.GraftTypes.sparkType(nameType._2))

  /** Parse a partition of raw lines into rows of the declared schema —
    * runs inside executors via mapPartitions. Lines addressed to a
    * different (db, table) than the stream's spec are dropped, not
    * silently coerced into the target table (a stray measurement in the
    * landing dir must not corrupt the stream's table). */
  private[streaming] def parsePartition(lines: Iterator[String],
                                        schema: StructType,
                                        db: String, table: String): Iterator[Row] = {
    val byName = schema.fieldNames.zipWithIndex.toMap
    lines.flatMap { text =>
      // parse with the stream's db as default so UNPREFIXED lines route to
      // this stream's database; only genuinely foreign (db.table-prefixed
      // for someone else) lines are dropped
      LineProtocolParser.parse(text, defaultDb = db)
        .filter(b => b.database == db && b.table == table)
        .flatMap(_.rows.iterator.map { line =>
        val arr = new Array[Any](schema.length)
        line.tags.foreach { case (k, v) => byName.get(k).foreach(arr(_) = v) }
        line.fields.foreach { case (k, v, t) =>
          byName.get(k).foreach { i =>
            arr(i) = if (t == FieldType.U64) v.asInstanceOf[BigDecimal].bigDecimal else v
          }
        }
        byName.get("time").foreach(arr(_) = line.timeNs)
        Row.fromSeq(arr.toIndexedSeq)
      })
    }
  }

  /** Start the stream: landing dir of text files → parsed typed rows →
    * per-micro-batch durable ingest (partitioned parquet + index). */
  def start(spark: SparkSession, writer: IngestWriter, spec: StreamSpec,
            landingDir: String, trigger: Trigger = Trigger.ProcessingTime("1 second"),
            checkpointDir: Option[String] = None): StreamingQuery = {
    val schema = StructType(spec.columns.map(sparkField))
    val enc = Encoders.row(schema)
    val parsed = spark.readStream
      .text(landingDir)
      .select("value").as(Encoders.STRING)
      .mapPartitions(it => parsePartition(it, schema, spec.db, spec.table))(enc)
    val q = parsed.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        // singleFile = false: each executor task sorts and writes its own
        // slice (no coalesce(1) bottleneck) — the write scales with cores
        // and the compactor merges the per-task files
        if (!df.isEmpty)
          writer.storeDataFrame(spec.db, spec.table, df, singleFile = false): Unit
      }
    checkpointDir.foreach(d => q.option("checkpointLocation", d))
    q.start()
  }
}
