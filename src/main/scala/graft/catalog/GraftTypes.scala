package graft.catalog

import org.apache.spark.sql.types._

/** The reference's 4+1 storage types (data_types.go:26-51 + BOOL
  * strict-superset) → Spark types. UInt64 → Decimal(20,0): Spark has no
  * unsigned (the reference's own UBIGINT arrow path is broken — SURVEY
  * §2.1 quirks). */
object GraftTypes {
  def sparkType(name: String): DataType = name match {
    case "INT64" => LongType
    case "UINT64" => DecimalType(20, 0)
    case "FLOAT64" => DoubleType
    case "STRING" => StringType
    case "BOOL" => BooleanType
    case other => throw new IllegalArgumentException(s"unknown type $other")
  }
}
