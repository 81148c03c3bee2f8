package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("withinTolerance matches exactly the pairs inside the window, per key") {
    val l = Seq(
      (1, ts("2024-01-01 10:00:00"), "e1"),
      (1, ts("2024-01-01 12:00:00"), "e2"),
      (2, ts("2024-01-01 10:00:30"), "e3"),
    ).toDF("k", "ts", "lid")
    val r = Seq(
      (1, ts("2024-01-01 10:00:50"), "p1"),   // 50s from e1 -> match
      (1, ts("2024-01-01 10:02:00"), "p2"),   // 120s from e1 -> boundary match
      (1, ts("2024-01-01 10:02:01"), "p3"),   // 121s -> no
      (2, ts("2024-01-01 10:00:00"), "p4"),   // 30s from e3 but key 2 -> match
      (1, ts("2024-01-01 10:00:00"), "p5"),   // key 1, 0s from e1 -> match
    ).toDF("k", "ts", "rid")
    val got = RangeJoin.withinTolerance(l, r, Seq("k"), "ts", "ts", 120)
      .select($"l_lid", $"r_rid").as[(String, String)].collect().toSet
    assert(got == Set(("e1", "p1"), ("e1", "p2"), ("e1", "p5"), ("e3", "p4")), got)
  }

  test("bucket replication does not duplicate pairs") {
    val l = Seq((1, ts("2024-01-01 10:01:59"), "x")).toDF("k", "ts", "lid")
    val r = Seq((1, ts("2024-01-01 10:02:01"), "y")).toDF("k", "ts", "rid")
    val got = RangeJoin.withinTolerance(l, r, Seq("k"), "ts", "ts", 120)
    assert(got.count() == 1)
  }
}
