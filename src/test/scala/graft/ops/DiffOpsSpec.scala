package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiffOpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies all four statuses correctly") {
    val oldS = Seq((0L, "same"), (1L, "was this"), (2L, "gone")).toDF("doc_id", "text")
    val newS = Seq((0L, "same"), (1L, "now this"), (3L, "fresh")).toDF("doc_id", "text")
    val r = DiffOps.snapshotDiff(oldS, newS).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(0L -> "unchanged", 1L -> "changed",
      2L -> "removed", 3L -> "added"))
  }

  test("planted snapshots produce the statuses their construction implies") {
    val docs = (0L until 100L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val r = DiffOps.snapshotDiff(
      DiffOps.snapshotA(docs), DiffOps.snapshotB(docs)).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    for (i <- 0L until 100L) {
      val expected =
        if (i % 7 == 0 && i % 13 == 0) None // in neither snapshot
        else if (i % 7 == 0) Some("added")
        else if (i % 13 == 0) Some("removed")
        else if (i % 11 == 0) Some("changed")
        else Some("unchanged")
      assert(r.get(i) == expected, s"doc $i: got ${r.get(i)}, want $expected")
    }
  }

  test("null text is presence, not absence (review r10)") {
    // md5(null) is null: with hash-nullness as the presence proxy a
    // null-text doc read as absent-from-its-own-side
    val oldS = Seq((1L, Option.empty[String]), (2L, Some("x")),
      (3L, Option.empty[String])).toDF("doc_id", "text")
    val newS = Seq((2L, Option.empty[String]), (3L, Option.empty[String]),
      (4L, Option.empty[String])).toDF("doc_id", "text")
    val r = DiffOps.snapshotDiff(oldS, newS).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(
      1L -> "removed",   // null text, old only — NOT 'added'
      2L -> "changed",   // "x" -> null is a content change
      3L -> "unchanged", // null -> null
      4L -> "added"))
  }

  test("diff never shuffles document text, only hashes") {
    val docs = (0L until 50L).map(i => (i, s"t $i")).toDF("doc_id", "text")
    val plan = DiffOps.snapshotDiff(DiffOps.snapshotA(docs),
      DiffOps.snapshotB(docs)).queryExecution.executedPlan.toString
    // the exchanges carry (doc_id, md5) projections; text never appears
    // downstream of the scans
    assert(!plan.contains("text#") ||
      plan.indexOf("Exchange") < 0 ||
      !plan.substring(plan.indexOf("Exchange")).contains("text#"),
      plan)
  }
}
