package graft.server

import graft.SparkSpec

class NdJsonParserSpec extends SparkSpec {

  test("randomized: typed objects round-trip with first-seen schema (seeded sweep)") {
    val rnd = new scala.util.Random(5)
    def value(): Any = rnd.nextInt(4) match {
      case 0 => rnd.nextLong() / 2
      case 1 => rnd.nextDouble() * 1e9
      case 2 => "s" + rnd.alphanumeric.take(8).mkString
      case _ => rnd.nextBoolean()
    }
    (1 to 25).foreach { _ =>
      val cols = (0 until 1 + rnd.nextInt(5)).map(i => s"c$i" -> value())
      val nLines = 1 + rnd.nextInt(8)
      // same first-seen type per column; later lines drop a random subset
      val lines = (0 until nLines).map { _ =>
        cols.filter(_ => rnd.nextDouble() > 0.3)
      }.filter(_.nonEmpty)
      if (lines.nonEmpty) {
        val body = lines.map(_.map {
          case (k, v: String) => s""""$k":${JsonOut.str(v)}"""
          case (k, v) => s""""$k":$v"""
        }.mkString("{", ",", "}")).mkString("\n")
        val df = NdJsonParser.toDataFrame(spark, body)
        assert(df.count() == lines.length)
        val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
        lines.flatten.foreach { case (k, v) =>
          val expect = v match {
            case _: Long => "long"
            case _: Double => "double"
            case _: Boolean => "boolean"
            case _ => "string"
          }
          assert(types(k) == expect, s"col $k: ${types(k)} != $expect")
        }
        // absent fields read back as nulls, present ones as values
        assert(df.collect().length == lines.length)
      }
    }
  }

  test("column order is the client's own key order, even past 4 keys") {
    // >4 keys once collapsed into a HashMap before discovery, so the
    // table's PERMANENT first-seen schema order came out hash-scrambled
    val df = NdJsonParser.toDataFrame(spark,
      """{"zz":1,"m":2,"aa":3,"q":4,"b":5,"x":6,"c":7}""")
    assert(df.columns.toSeq == Seq("zz", "m", "aa", "q", "b", "x", "c"))
  }

  test("type conflict across lines is a clear error") {
    val e = intercept[IllegalArgumentException] {
      NdJsonParser.toDataFrame(spark, "{\"a\": 1}\n{\"a\": \"oops\"}").collect()
    }
    assert(e.getMessage.contains("type conflict"))
  }

  test("integer outside int64 range is rejected, not silently wrapped") {
    val e = intercept[IllegalArgumentException] {
      // 2^70: BigInt.longValue would wrap to a wrong Long
      NdJsonParser.toDataFrame(spark, "{\"a\": 1180591620717411303424}")
    }
    assert(e.getMessage.contains("int64"))
    // boundary values still pass
    val df = NdJsonParser.toDataFrame(spark,
      s"""{"a": ${Long.MaxValue}}\n{"a": ${Long.MinValue}}""")
    assert(df.collect().map(_.getLong(0)).toSet == Set(Long.MaxValue, Long.MinValue))
  }

  test("integral doubles and int64 interplay: first-seen double widens longs") {
    val df = NdJsonParser.toDataFrame(spark, "{\"x\": 1.5}\n{\"x\": 2}")
    assert(df.schema("x").dataType.typeName == "double")
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.5, 2.0))
  }
}
