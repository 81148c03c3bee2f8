package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  // change log: key "a" flips x twice with a no-op replay in the middle;
  // "b" never changes; "c" has a null-attribute run (null == null must
  // compact, not produce phantom versions)
  private def log(): DataFrame = Seq(
    ("a", 1L, 10L, Some("x1"), 1.0),
    ("a", 2L, 20L, Some("x1"), 2.0), // no-op change
    ("a", 3L, 30L, Some("x2"), 3.0),
    ("a", 4L, 40L, Some("x1"), 4.0),
    ("b", 5L, 10L, Some("y1"), 5.0),
    ("c", 6L, 10L, None, 6.0),
    ("c", 7L, 20L, None, 7.0),       // null == null: no-op
    ("c", 8L, 30L, Some("z1"), 8.0)
  ).toDF("k", "eid", "ts", "attr", "v")

  test("latestByKey keeps the newest payload per key via max_by") {
    val out = Scd.latestByKey(log(), Seq("k"), "ts", "eid")
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 4L), ("b", 5L), ("c", 8L)))
    assert(out.head.getAs[String]("attr") === "x1" && out.head.getAs[Double]("v") === 4.0)
  }

  test("changeCompact drops no-op updates, null-safely") {
    val kept = Scd.changeCompact(log(), Seq("k"), "ts", "eid", Seq("attr"))
      .select("eid").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 3L, 4L, 5L, 6L, 8L))
  }

  test("scdHistory tiles [from, to) ranges with a single current version per key") {
    val h = Scd.scdHistory(log(), Seq("k"), "ts", "eid", Seq("attr"))
    val a = h.filter($"k" === "a").orderBy("version")
      .select("version", "attr", "effective_from", "effective_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    assert(a === Seq((1L, "x1", 10L, 30L, false), (2L, "x2", 30L, 40L, false),
      (3L, "x1", 40L, -1L, true)))
    // exactly one current version per key; ranges abut exactly
    val cur = h.filter($"is_current").groupBy("k").count()
      .as[(String, Long)].collect().toMap
    assert(cur === Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("scdMerge is idempotent and batch-split-invariant") {
    val attrs = Seq("attr")
    val full = Scd.scdHistory(log(), Seq("k"), "ts", "eid", attrs)
    val (b1, b2) = (log().filter($"ts" <= 20), log().filter($"ts" > 20))
    val h1 = Scd.scdHistory(b1.select("k", "eid", "ts", "attr"), Seq("k"), "ts", "eid", attrs)
    val merged = Scd.scdMerge(h1, b2.select("k", "eid", "ts", "attr"), Seq("k"), "ts", "eid", attrs)
    val fullProj = full.select("k", "version", "attr", "effective_from", "effective_to")
    assert(merged.select("k", "version", "attr", "effective_from", "effective_to")
      .exceptAll(fullProj).isEmpty && fullProj.exceptAll(
        merged.select("k", "version", "attr", "effective_from", "effective_to")).isEmpty)
    // replaying an already-applied batch changes nothing
    val replay = Scd.scdMerge(merged, b2.select("k", "eid", "ts", "attr"), Seq("k"), "ts", "eid", attrs)
    assert(replay.select("k", "version", "attr", "effective_from", "effective_to")
      .exceptAll(fullProj).isEmpty)
  }

  test("windowDedup suppresses repeats inside the gap window, first of each burst survives") {
    val ev = Seq(
      // key "a": burst at 0/5/9 (collapse to 0), then 25 (gap 16 > 10)
      ("a", 1L, 0L), ("a", 2L, 5L), ("a", 3L, 9L), ("a", 4L, 25L),
      // key "b": evenly spaced beyond the window — all survive
      ("b", 5L, 0L), ("b", 6L, 11L), ("b", 7L, 22L)
    ).toDF("k", "eid", "us")
    val kept = Scd.windowDedup(ev, Seq("k"), "us", "eid", windowMicros = 10L)
      .select("eid").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 4L, 5L, 6L, 7L))
  }

  test("scdHistory plans a single exchange: compaction + both windows share it") {
    val h = Scd.scdHistory(log(), Seq("k"), "ts", "eid", Seq("attr"))
    val plan = h.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
  }
}
