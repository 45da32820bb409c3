package graft.ingest

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.TableCatalog
import graft.lineproto.LineProtocolParser
import graft.lineproto.LineProtocolParser.{Batch, FieldType, Line}

/** Pins the r13 driver-side UnsafeRow conversion (IngestWriter.toDataFrame):
  * the hot buffered-flush path builds flat UnsafeRow byte chunks on the
  * driver and hands InternalRows straight to Spark, so a conversion bug
  * here is silent row corruption on EVERY ingested value. Covers all five
  * field types at their edges, unicode strings, and the multi-chunk
  * fork-join path (row counts above ConvertChunkRows). */
class UnsafeConvertSpec extends SparkSpec {

  private def writer() = {
    val root = Files.createTempDirectory("graft-uconv-")
    val cat = new TableCatalog(root.toString)
    new IngestWriter(spark, root.toString, cat)
  }

  test("all five field types round-trip values and schema exactly") {
    val w = writer()
    val text =
      "m,tag=vé中 i=-9223372036854775808i,u=18446744073709551615u," +
        "f=2.5,s=\"café \\\"q\\\"\",b=true 1700000000000000001\n" +
        "m,tag=plain i=9223372036854775807i,u=0u,f=-0.125,s=\"\",b=false 1700000000000000002"
    val batch = LineProtocolParser.parse(text).toSeq.head
    val df = w.toDataFrame(batch)

    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq("tag" -> "string", "i" -> "bigint", "u" -> "decimal(20,0)",
        "f" -> "double", "s" -> "string", "b" -> "boolean", "time" -> "bigint"))

    val rows = df.orderBy("time").collect()
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getString(0) == "vé中")
    assert(r0.getLong(1) == Long.MinValue)
    assert(r0.getDecimal(2).toBigInteger.toString == "18446744073709551615")
    assert(r0.getDouble(3) == 2.5)
    assert(r0.getString(4) == "café \"q\"")
    assert(r0.getBoolean(5))
    assert(r0.getLong(6) == 1700000000000000001L)
    val r1 = rows(1)
    assert(r1.getLong(1) == Long.MaxValue)
    assert(r1.getDecimal(2).toBigInteger.toString == "0")
    assert(r1.getString(4) == "")
    assert(!r1.getBoolean(5))
  }

  test("multi-chunk parallel build: every row lands once with its own values") {
    val w = writer()
    // enough rows for several fork-join chunks (> ConvertChunkRows each)
    val n = w.ConvertChunkRows * 3 + 17
    val schema = Vector("host" -> FieldType.Str, "seq" -> FieldType.I64,
      "time" -> FieldType.I64)
    val rows = Vector.tabulate(n) { i =>
      Line("default", "mc", Vector("host" -> s"h${i % 7}"),
        Vector(("seq", i.toLong, FieldType.I64)), 1700000000000000000L + i)
    }
    val df = w.toDataFrame(Batch("default", "mc", schema, rows))
    assert(df.count() == n)
    // exactly-once, order-preserving content: seq i carries time base+i
    assert(df.filter(col("seq") + lit(1700000000000000000L) =!= col("time")).count() == 0)
    assert(df.agg(countDistinct("seq")).collect().head.getLong(0) == n)
    val mm = df.agg(min("seq"), max("seq")).collect().head
    assert(mm.getLong(0) == 0 && mm.getLong(1) == n - 1)
  }
}
