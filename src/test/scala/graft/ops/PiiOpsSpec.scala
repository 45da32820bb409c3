package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiOpsSpec extends SparkSpec {
  import spark.implicits._

  test("piiStats counts and redacts each PII kind") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org or jo@ex.io thanks"),
      (2L, "call 555-123-4567 and 555-999-0000 now"),
      (3L, "server 192.168.1.250 and 10.0.0.1 are up"),
      (4L, "ssn 123-45-6789 on file"),
      (5L, "no pii here at all"),
    ).toDF("doc_id", "text")
    val out = PiiOps.piiStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_email") == 2)
    assert(out(2L).getAs[Int]("n_phone") == 2)
    assert(out(3L).getAs[Int]("n_ip") == 2)
    assert(out(4L).getAs[Int]("n_ssn") == 1)
    assert(out(5L).getAs[Boolean]("has_pii") == false)
    assert((1L to 4L).forall(out(_).getAs[Boolean]("has_pii")))
  }

  test("redact rewrites all occurrences with their tags, nothing else") {
    val r = Seq(("a@b.co calls 555-123-4567 from 10.1.2.3, ssn 123-45-6789 ok"))
      .toDF("text").select(PiiOps.redact(col("text"))).head.getString(0)
    assert(r == "<EMAIL> calls <PHONE> from <IP>, ssn <SSN> ok")
  }

  test("counts match the rewrite chain when patterns nest (phone inside email)") {
    // the email regex swallows the whole address; the phone-shaped local
    // part must NOT be double-counted — counts are staged on the
    // already-redacted text, so n_phone sweeps '<EMAIL>'
    val out = PiiOps.piiStats(
      Seq((1L, "reach me at 555-123-4567@example.com ok"),
        (2L, "ip-ish 1.2.3.4@ex.co here")).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_email") == 1)
    assert(out(1L).getAs[Int]("n_phone") == 0)
    assert(out(2L).getAs[Int]("n_email") == 1)
    assert(out(2L).getAs[Int]("n_ip") == 0)
  }

  test("phone and SSN patterns don't cross-match each other") {
    val r = Seq(("p 555-123-4567 s 123-45-6789"))
      .toDF("text").select(PiiOps.redact(col("text"))).head.getString(0)
    assert(r == "p <PHONE> s <SSN>")
  }

  test("property: nothing PII-shaped survives redaction on random mixed docs") {
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "beta", "gamma", "x1", "data", "ok")
    def pii() = rnd.nextInt(4) match {
      case 0 => s"u${rnd.nextInt(99)}@ex${rnd.nextInt(9)}.org"
      case 1 => f"${rnd.nextInt(900) + 100}%d-${rnd.nextInt(900) + 100}%d-${rnd.nextInt(9000) + 1000}%d"
      case 2 => s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
      case _ => f"${rnd.nextInt(900) + 100}%d-${rnd.nextInt(90) + 10}%d-${rnd.nextInt(9000) + 1000}%d"
    }
    val docs = (0 until 200).map { i =>
      val toks = Seq.fill(rnd.nextInt(12) + 1)(
        if (rnd.nextInt(3) == 0) pii() else words(rnd.nextInt(words.size)))
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val red = docs.select(PiiOps.redact(col("text")).as("r")).as[String].collect()
    // after redaction, NO pattern matches anywhere (tags carry no
    // digits/@, so they can't recreate a match)
    PiiOps.Patterns.foreach { case (kind, re, _) =>
      val p = java.util.regex.Pattern.compile(re)
      assert(!red.exists(t => p.matcher(t).find()), s"$kind survives redaction")
    }
    // and counts equal the tags actually written
    val stats = PiiOps.piiStats(docs).collect()
    val totalCounts = PiiOps.Patterns.map { case (k, _, _) =>
      k -> stats.map(_.getAs[Int](s"n_$k").toLong).sum
    }.toMap
    val tagTotals = PiiOps.Patterns.map { case (k, _, tag) =>
      k -> red.map(t => t.sliding(tag.length).count(_ == tag)).sum.toLong
    }.toMap
    assert(totalCounts == tagTotals, (totalCounts, tagTotals))
  }

  test("null text degrades to null stats, never a crash") {
    val out = PiiOps.piiStats(
      Seq((1L, null: String), (2L, "a@b.co")).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).isNullAt(out(1L).fieldIndex("n_email")))
    assert(out(1L).isNullAt(out(1L).fieldIndex("redacted_fp")))
    assert(out(2L).getAs[Int]("n_email") == 1)
  }

  test("withSyntheticPii plants by residue class, deterministically") {
    val docs = Seq((105L, "base"), (1L, "base")).toDF("doc_id", "text")
    val aug = PiiOps.withSyntheticPii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // 105 = 3·5·7: email + phone + ip, no ssn (105 % 11 != 0)
    assert(aug(105L) == "base contact user105@example.com call 555-867-0105" +
      " host 10.105.85.105")
    assert(aug(1L) == "base")
    // planted values are detected by the matching patterns
    val stats = PiiOps.piiStats(PiiOps.withSyntheticPii(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(stats(105L).getAs[Int]("n_email") == 1)
    assert(stats(105L).getAs[Int]("n_phone") == 1)
    assert(stats(105L).getAs[Int]("n_ip") == 1)
    assert(stats(105L).getAs[Int]("n_ssn") == 0)
  }
}
