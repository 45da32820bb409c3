package graft.server

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Content-Type → body parser registry (reference merge/parsers/
  * parsers.go:10-46: prefix match on the Content-Type, empty string
  * defaults to line protocol). The reference registers an NDJSON parser
  * that is `not implemented` (ndjson_insert_parser.go:17-90, dead code);
  * ours is a working strict-superset feature per SURVEY §2.1 N3/N4.
  */
object BodyParsers {
  sealed trait Kind
  case object LineProtocol extends Kind
  case object NdJson extends Kind

  /** Prefix-matched like the reference's GetParser. */
  def dispatch(contentType: String): Kind = {
    val ct = contentType.toLowerCase.trim
    if (ct.startsWith("application/x-ndjson") || ct.startsWith("application/ndjson") ||
      ct.startsWith("application/jsonl")) NdJson
    else LineProtocol // "" and text/* default to line protocol
  }
}

/** NDJSON (one JSON object per line) → typed DataFrame for the ingest
  * writer. Types follow the reference's 4+1 model: integral JSON numbers
  * → INT64, other numbers → FLOAT64, strings → STRING, booleans → BOOL;
  * an integral `time` field is int64 ns (the reference time model).
  * First-type-wins across lines, consistent with schema-on-write.
  */
object NdJsonParser {
  def toDataFrame(spark: SparkSession, body: String): DataFrame = {
    val lines = body.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    require(lines.nonEmpty, "empty NDJSON body")
    // ORDERED pairs, not a Map: column discovery below must see the
    // client's own key order — a HashMap's iteration order would
    // scramble the table's permanent first-seen schema for any object
    // with more than 4 keys
    val parsed: Vector[Vector[(String, Any)]] = lines.map { l =>
      JsonMethods.parse(l) match {
        case JObject(kvs) => kvs.flatMap {
          case (k, JInt(v)) =>
            // BigInt.longValue silently wraps outside int64 — reject loudly,
            // same policy as nested values below
            if (!v.isValidLong) throw new IllegalArgumentException(
              s"NDJSON field '$k' integer $v is outside int64 range")
            Some(k -> v.longValue)
          case (k, JLong(v)) => Some(k -> v)
          case (k, JDouble(v)) => Some(k -> v)
          case (k, JDecimal(v)) => Some(k -> v.toDouble)
          case (k, JString(v)) => Some(k -> v)
          case (k, JBool(v)) => Some(k -> v)
          case (_, JNull | JNothing) => None // JSON null -> SQL null
          case (k, other) => throw new IllegalArgumentException(
            // nested shapes must error loudly, not silently become null
            s"NDJSON field '$k' has unsupported ${other.getClass.getSimpleName
              .stripPrefix("J").toLowerCase} value (flat scalars only)")
        }.toVector
        case other => throw new IllegalArgumentException(
          s"NDJSON line is not an object: ${other.getClass.getSimpleName}")
      }
    }
    // first-seen column order; first-seen type wins (later conflicts cast
    // where lossless, else rejected by the catalog's evolve check)
    val columns = Vector.newBuilder[(String, DataType)]
    val seen = scala.collection.mutable.Map.empty[String, DataType]
    parsed.foreach(_.foreach { case (k, v) =>
      if (!seen.contains(k)) {
        val t = v match {
          case _: Long => LongType
          case _: Double => DoubleType
          case _: Boolean => BooleanType
          case _ => StringType
        }
        seen(k) = t
        columns += (k -> t)
      }
    })
    val schema = StructType(columns.result().map { case (n, t) => StructField(n, t) })
    val rows = parsed.map { kvs =>
      val m = kvs.toMap
      Row.fromSeq(schema.fields.toIndexedSeq.map { f =>
        m.get(f.name) match {
          case None => null
          case Some(v: Long) if f.dataType == DoubleType => v.toDouble
          case Some(v) =>
            val ok = (v, f.dataType) match {
              case (_: Long, LongType) | (_: Double, DoubleType) |
                   (_: Boolean, BooleanType) | (_: String, StringType) => true
              case _ => false
            }
            if (!ok) throw new IllegalArgumentException(
              s"column '${f.name}' type conflict: first-seen ${f.dataType.simpleString}, " +
                s"got ${v.getClass.getSimpleName}")
            v
        }
      })
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}
