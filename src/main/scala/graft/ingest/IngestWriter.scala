package graft.ingest

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.{TableCatalog, TableSpec}
import graft.index.{FileEntry, MetadataIndex}
import graft.lineproto.LineProtocolParser.{Batch, FieldType}
import graft.sources.ObjectStore

/** The schema-on-write ingest path (reference write pipeline §3.1):
  * line-protocol batch → typed DataFrame → `__timestamp` injection →
  * per-row date/hour partition derivation → sorted parquet in
  * `{root}/{db}/{table}/date=YYYY-MM-DD/hour=HH/{uuid}.1.parquet` →
  * metadata.json index update.
  *
  * Differences from the reference, by design (SURVEY §2.1 quirks):
  *  - date AND hour derive per-row from `__timestamp` (the reference
  *    buckets by day but labels with the first row's hour);
  *  - bool fields are stored (BooleanType);
  *  - UInt64 → Decimal(20,0).
  *
  * Scale path: this writer handles the reference-style driver-buffered
  * micro-batches. For sustained 100 TB/day firehose ingest the same
  * transform chain runs under Structured Streaming
  * (graft.streaming.StreamIngest) where parallel parse happens in
  * executors, not the driver.
  */
final class IngestWriter(spark: SparkSession, root: String, catalog: TableCatalog,
                         nowNs: () => Long = () => System.currentTimeMillis() * 1000000L) {

  /** Reference type names per FieldType (data_types.go:26-51). */
  private def typeName(t: FieldType): String = t match {
    case FieldType.I64 => "INT64"
    case FieldType.U64 => "UINT64"
    case FieldType.F64 => "FLOAT64"
    case FieldType.Str => "STRING"
    case FieldType.Bool => "BOOL"
  }

  def sparkType(name: String): DataType = graft.catalog.GraftTypes.sparkType(name)

  /** Line-proto batch → DataFrame with the batch's own schema.
    * parallelize (not the java-List createDataFrame): the List path
    * embeds every row in a LocalRelation, converting the whole batch
    * eagerly during plan BUILD on the flush thread and dragging the rows
    * through plan serialization; the RDD path converts lazily inside the
    * write job. (The downstream coalesce(1) fuses slices into one task,
    * so this is about keeping rows out of the plan, not parallelism.) */
  def toDataFrame(batch: Batch): DataFrame = {
    val fields = batch.schema.map { case (n, t) => StructField(n, sparkType(typeName(t))) }
    val schema = StructType(fields)
    val byName = batch.schema.map(_._1).zipWithIndex.toMap
    val rows = batch.rows.map { line =>
      val arr = new Array[Any](fields.length)
      line.tags.foreach { case (k, v) => arr(byName(k)) = v }
      line.fields.foreach { case (k, v, t) =>
        arr(byName(k)) = if (t == FieldType.U64) v.asInstanceOf[BigDecimal] else v
      }
      arr(byName("time")) = line.timeNs
      Row.fromSeq(arr.toIndexedSeq)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Store one parsed batch: evolve schema (first-type-wins), add
    * `__timestamp`, write partitioned+sorted, index. Returns URIs written. */
  def store(batch: Batch): Seq[String] = {
    val spec0 = catalog.evolve(batch.database, batch.table,
      batch.schema.map { case (n, t) => (n, typeName(t)) } :+ ("__timestamp" -> "INT64"))
    write(spec0, toDataFrame(batch).withColumn("__timestamp", lit(nowNs())))
  }

  /** Store an arbitrary DataFrame (NDJSON/createDataFrame ingest path).
    * Schema must be line-proto-compatible types.
    *
    * `singleFile = true` (HTTP/buffered flushes) keeps the reference's
    * one-file-per-flush shape via a single sort task. `singleFile =
    * false` (the StreamIngest firehose path) keeps the DataFrame's
    * existing executor partitioning — no shuffle, no single-task
    * bottleneck: each task sorts its slice by (partition cols ++
    * orderBy) and writes its own sorted file per (date, hour); the
    * L1→L2 compactor merges the extra files, which is exactly what it
    * exists for. (Repartitioning on (date, hour) would NOT scale here:
    * at firehose rates nearly all rows share the current hour, so that
    * key hashes the whole batch back into one task.) */
  def storeDataFrame(db: String, table: String, df: DataFrame,
                     singleFile: Boolean = true): Seq[String] = {
    val cols = df.schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => "INT64"
        case _: DecimalType => "UINT64"
        case DoubleType => "FLOAT64"
        case StringType => "STRING"
        case BooleanType => "BOOL"
        case other => throw new IllegalArgumentException(
          s"unsupported ingest type ${other.simpleString} for column ${f.name}")
      }
      (f.name, t)
    }
    val spec = catalog.evolve(db, table, cols.toSeq :+ ("__timestamp" -> "INT64"))
    val withTs = if (df.columns.contains("__timestamp")) df
      else df.withColumn("__timestamp", lit(nowNs()))
    write(spec, withTs, singleFile)
  }

  private def write(spec: TableSpec, dfIn: DataFrame,
                    singleFile: Boolean = true): Seq[String] = {
    val tableDir = catalog.tableDir(spec.database, spec.name)
    // null-pad to the table's full first-seen schema (reference
    // data_store.go:109-141 back-fill)
    val full = catalog.get(spec.database, spec.name).get
    val df = full.columns.foldLeft(dfIn) { case (d, (n, t)) =>
      if (d.columns.contains(n)) d else d.withColumn(n, lit(null).cast(sparkType(t)))
    }.select(full.columns.map(c => col(c._1)): _*)

    val hive = spec.engine == "HiveMerge"
    val tsUs = expr("__timestamp DIV 1000")
    val partitioned =
      if (hive)
        df.withColumn("date", date_format(timestamp_micros(tsUs), "yyyy-MM-dd"))
          .withColumn("hour", date_format(timestamp_micros(tsUs), "HH"))
      else df

    // stage via Spark, then publish with reference-style names. Local
    // tables: atomic move. Object-store tables (spec.dataUrl): bytes are
    // copied to their FINAL key and the metadata.json manifest is the
    // commit — no rename exists on S3 (reference save_service_s3.go:55-88).
    val staging = tableDir.resolve("tmp").resolve(UUID.randomUUID().toString)
    Files.createDirectories(staging)
    // coalesce(1), not repartition(1): reads inputs straight into the
    // single sort task instead of adding a round-robin exchange first.
    // Parallel (streaming) path: sort each existing task's slice with
    // the hive partition cols leading so every written file is still
    // internally ordered by orderBy within its (date, hour) dir.
    val sorted =
      if (singleFile)
        partitioned.coalesce(1).sortWithinPartitions(spec.orderBy.map(col): _*)
      else {
        val keys = (if (hive) Seq("date", "hour") else Nil) ++ spec.orderBy
        partitioned.sortWithinPartitions(keys.distinct.map(col): _*)
      }
    val writer = sorted.write.mode("append")
    (if (hive) writer.partitionBy("date", "hour") else writer)
      .parquet(staging.toString)

    val remoteRoot = spec.dataUrl.map(u =>
      ObjectStore.resolveDataRoot(spark, u) + s"/${spec.database}/${spec.name}")
    val written = Files.walk(staging).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
    val out = written.map { part =>
      val rel = staging.relativize(part).getParent // date=../hour=.. or null
      val relStr = if (rel == null) "" else rel.toString.replace('\\', '/')
      // partition dir always exists locally: it holds metadata.json
      val destDir = if (rel == null) tableDir else tableDir.resolve(rel.toString)
      Files.createDirectories(destDir)
      val name = s"${UUID.randomUUID()}.1.parquet"
      val uri = remoteRoot match {
        case Some(r) =>
          val u = r + (if (relStr.isEmpty) "" else "/" + relStr) + "/" + name
          ObjectStore.copyPublish(spark, part, u)
          u
        case None =>
          val dest = destDir.resolve(name)
          Files.move(part, dest, StandardCopyOption.ATOMIC_MOVE)
          dest.toString
      }
      (destDir, name, uri)
    }
    deleteRecursively(staging)

    // index each published file from its parquet footer stats; for remote
    // tables this manifest write IS what makes the file visible
    out.foreach { case (dir, name, uri) =>
      MetadataIndex.batch(dir, spec.name,
        add = Seq(ParquetStats.manifestEntry(spark, uri, name)))
    }
    catalog.bumpVersion(spec.database, spec.name)
    out.map(_._3)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

/** Footer-level stats for one parquet file (no data scan). */
object ParquetStats {
  final case class Stats(rowCount: Long, minTime: Long, maxTime: Long,
                         colRanges: Map[String, (Long, Long)] = Map.empty)

  /** Manifest entry for a published file — the ONE place encoding the
    * stats invariants (min_time/max_time = server __timestamp arrival
    * stats; data_min/max_time = client `time` stats, unbounded when the
    * column is absent). Used by both ingest and compaction so the two
    * can never drift. */
  def manifestEntry(spark: SparkSession, uri: String, name: String): FileEntry = {
    val stats = read(spark, uri, "__timestamp", extraCols = Seq("time"))
    val (dmin, dmax) = stats.colRanges.getOrElse("time", (Long.MinValue, Long.MaxValue))
    FileEntry(
      id = 0, path = name,
      sizeBytes = ObjectStore.sizeOf(spark, uri),
      rowCount = stats.rowCount,
      chunkTime = stats.minTime,
      minTime = stats.minTime, maxTime = stats.maxTime,
      dataMinTime = dmin, dataMaxTime = dmax)
  }

  /** Row count + min/max of `timeCol`, plus ranges of any `extraCols`
    * that are present with int64 stats (absent → not in the map →
    * callers must treat as unknown/unbounded). */
  def read(spark: SparkSession, file: String, timeCol: String,
           extraCols: Seq[String] = Nil): Stats = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(file), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      var rows = 0L
      val mins = scala.collection.mutable.Map.empty[String, Long]
      val maxs = scala.collection.mutable.Map.empty[String, Long]
      val wanted = (timeCol +: extraCols).toSet
      blocks.foreach { b =>
        rows += b.getRowCount
        b.getColumns.asScala.filter(c => wanted(c.getPath.toDotString)).foreach { c =>
          val name = c.getPath.toDotString
          val st = c.getStatistics
          if (st != null && st.hasNonNullValue) {
            st.genericGetMin match {
              case l: java.lang.Long =>
                mins(name) = math.min(mins.getOrElse(name, Long.MaxValue), l)
                maxs(name) = math.max(maxs.getOrElse(name, Long.MinValue),
                  st.genericGetMax.asInstanceOf[java.lang.Long])
              case _ =>
            }
          }
        }
      }
      val ranges = mins.keys.map(k => k -> (mins(k), maxs(k))).toMap
      val (minT, maxT) = ranges.getOrElse(timeCol, (0L, 0L))
      Stats(rows, minT, maxT, ranges - timeCol)
    } finally reader.close()
  }
}
