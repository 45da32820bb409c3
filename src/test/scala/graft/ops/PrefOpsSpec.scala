package graft.ops

import graft.SparkSpec

class PrefOpsSpec extends SparkSpec {
  import spark.implicits._

  // A beats B twice, B beats A once, A beats C once, C beats B once
  private def matches() = Seq(
    ("A", "B"), ("A", "B"), ("B", "A"), ("A", "C"), ("C", "B"),
  ).toDF("winner", "loser")

  test("bradleyTerry: hand-computed two-step MM pin") {
    // p0 = 1e6 each; t = n*1e9 DIV (pi+pj); p' = (W*1e9) DIV Σt
    // step1: A: D=2000 -> 1,500,000; B: D=2000 -> 500,000; C: D=1000 -> 1,000,000
    // step2: A: 1500+400=1900 -> 1,578,947; B: 1500+666=2166 -> 461,680;
    //        C: 400+666=1066 -> 938,086
    val byItem = PrefOps.bradleyTerry(matches(), iters = 2)
      .collect().map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getLong(3))).toMap
    assert(byItem("A") == ((4L, 3L, 1578947L)))
    assert(byItem("B") == ((4L, 1L, 461680L)))
    assert(byItem("C") == ((2L, 1L, 938086L)))
  }

  test("bradleyTerry orders strengths with win dominance") {
    // round-robin: A beats everyone, B beats C, converged ordering must
    // be A > B > C at default iterations
    val m = Seq(("A", "B"), ("A", "B"), ("A", "C"), ("A", "C"),
      ("B", "C"), ("B", "C"), ("C", "B")).toDF("winner", "loser")
    val p = PrefOps.bradleyTerry(m).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(p("A") > p("B") && p("B") > p("C"), p)
  }

  test("never-winner floors at 1 ppm and never poisons later steps") {
    val m = Seq(("A", "B"), ("A", "B"), ("A", "B")).toDF("winner", "loser")
    val p = PrefOps.bradleyTerry(m, iters = 4).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(p("B") == 1L)
    assert(p("A") > 1000000L) // all-winner strengthens past p0
  }

  test("a single-source corpus yields no matches and an empty leaderboard") {
    val docs = Seq(
      (0L, "alpha beta gamma words", "only"),
      (1L, "delta epsilon zeta words", "only"),
    ).toDF("doc_id", "text", "source")
    val m = PrefOps.syntheticMatches(docs)
    assert(m.count() == 0)
    assert(PrefOps.bradleyTerry(m).count() == 0) // no items, no error
  }

  test("matchCells rejects self-matches instead of double-counting (ADVICE r14)") {
    // streamed/artifact input can carry winner == loser records; an
    // x==y cell would count games = 2n in bradleyTerry's dir union
    val m = Seq(("A", "B"), ("A", "A"), ("A", "A"), ("B", "A"))
      .toDF("winner", "loser")
    val cells = PrefOps.matchCells(m).as[(String, String, Long, Long)].collect()
    assert(cells.toSeq == Seq(("A", "B", 2L, 1L)), cells.toSeq)
    val bt = PrefOps.bradleyTerry(m)
      .select("source", "games").as[(String, Long)].collect().toMap
    assert(bt == Map("A" -> 2L, "B" -> 2L), bt) // not inflated by self-games
  }

  test("syntheticMatches pairs adjacent cross-source docs deterministically") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon common words appear here", "s1"),
      (1L, "alpha beta gamma delta epsilon common words appear here", "s2"), // tie -> doc 0 wins
      (2L, "short", "s3"),                                                    // 1 beats 2 on quality
      (3L, "short", "s3"),                                                    // same source: no match
    ).toDF("doc_id", "text", "source")
    val m = PrefOps.syntheticMatches(docs)
      .as[(String, String)].collect().toSeq.sorted
    // (0,1) tie -> earlier doc's source s1 wins; (1,2) longer text wins -> s2; (2,3) skipped
    assert(m == Seq(("s1", "s2"), ("s2", "s3")), m)
  }
}
