package graft.operators

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies inserted/deleted/changed/unchanged per key") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    val current = Seq((1L, "a", 10.0),           // unchanged
      (2L, "b", 21.0),                           // changed value
      (4L, "D", 40.0),                           // changed string
      (5L, "e", 50.0)                            // inserted; 3 deleted
    ).toDF("k", "s", "v")
    val got = Diff.snapshotDiff(old, current, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "deleted",
      4L -> "changed", 5L -> "inserted"))
    val summary = Diff.diffSummary(old, current, Seq("k"))
      .as[(String, Long)].collect().toMap
    assert(summary === Map("unchanged" -> 1L, "changed" -> 2L,
      "deleted" -> 1L, "inserted" -> 1L))
  }

  test("diff join shuffles hashes, not payloads: exchanges carry key + 8-byte hash only") {
    val old = Seq((1L, "payload_string_a", 1.0)).toDF("k", "s", "v")
    val current = Seq((1L, "payload_string_b", 2.0)).toDF("k", "s", "v")
    val plan = Diff.snapshotDiff(old, current, Seq("k"))
      .queryExecution.executedPlan.toString
    val exchangeLines = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    // payload columns are hashed away BEFORE the join: no exchange may
    // reference the payload columns themselves
    assert(exchangeLines.nonEmpty)
    assert(!exchangeLines.exists(l => l.contains("s#") || l.contains("v#")),
      s"payload crossed the shuffle:\n$plan")
  }
}
