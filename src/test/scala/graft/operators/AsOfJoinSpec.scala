package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks the latest right row at or before left ts, per key") {
    val quotes = Seq(
      (1, ts("2024-01-01 10:00:00"), 100.0),
      (1, ts("2024-01-01 10:05:00"), 101.0),
      (1, ts("2024-01-01 10:10:00"), 102.0),
      (2, ts("2024-01-01 10:00:00"), 200.0),
    ).toDF("k", "ts", "price")
    val trades = Seq(
      (1, ts("2024-01-01 10:07:00"), "t1"),   // -> 101.0 (10:05)
      (1, ts("2024-01-01 10:10:00"), "t2"),   // -> 102.0 (equal ts inclusive)
      (1, ts("2024-01-01 09:00:00"), "t3"),   // -> no match (null)
      (2, ts("2024-01-01 11:00:00"), "t4"),   // -> 200.0
      (3, ts("2024-01-01 10:00:00"), "t5"),   // key with no quotes -> null
    ).toDF("k", "ts", "trade_id")

    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", "ts", Seq("price"))
      .select($"trade_id", $"price").as[(String, Option[Double])]
      .collect().toMap
    assert(out("t1").contains(101.0))
    assert(out("t2").contains(102.0))
    assert(out("t3").isEmpty)
    assert(out("t4").contains(200.0))
    assert(out("t5").isEmpty)
  }

  test("forward as-of join picks the earliest right row at or after left ts, per key") {
    val quotes = Seq(
      (1, ts("2024-01-01 10:00:00"), 100.0),
      (1, ts("2024-01-01 10:05:00"), 101.0),
      (1, ts("2024-01-01 10:10:00"), 102.0),
      (2, ts("2024-01-01 10:00:00"), 200.0),
    ).toDF("k", "ts", "price")
    val trades = Seq(
      (1, ts("2024-01-01 10:02:00"), "t1"),   // -> 101.0 (10:05 next)
      (1, ts("2024-01-01 10:05:00"), "t2"),   // -> 101.0 (equal ts inclusive)
      (1, ts("2024-01-01 11:00:00"), "t3"),   // nothing after -> null
      (2, ts("2024-01-01 09:00:00"), "t4"),   // -> 200.0
      (3, ts("2024-01-01 10:00:00"), "t5"),   // key with no quotes -> null
    ).toDF("k", "ts", "trade_id")

    val out = AsOfJoin.forward(trades, quotes, Seq("k"), "ts", "ts", Seq("price"))
      .select($"trade_id", $"price").as[(String, Option[Double])]
      .collect().toMap
    assert(out("t1").contains(101.0))
    assert(out("t2").contains(101.0))
    assert(out("t3").isEmpty)
    assert(out("t4").contains(200.0))
    assert(out("t5").isEmpty)
  }

  test("nearest as-of join resolves by distance, ties backward, one-sided gaps to the other side") {
    val quotes = Seq(
      (1, ts("2024-01-01 10:00:00"), 100.0),
      (1, ts("2024-01-01 10:10:00"), 101.0),
    ).toDF("k", "ts", "price")
    val trades = Seq(
      (1, ts("2024-01-01 10:03:00"), "t1"),   // 3 min back vs 7 fwd -> 100.0
      (1, ts("2024-01-01 10:08:00"), "t2"),   // 8 back vs 2 fwd -> 101.0
      (1, ts("2024-01-01 10:05:00"), "t3"),   // exact tie -> backward 100.0
      (1, ts("2024-01-01 09:00:00"), "t4"),   // only forward exists -> 100.0
      (1, ts("2024-01-01 12:00:00"), "t5"),   // only backward exists -> 101.0
    ).toDF("k", "ts", "trade_id")

    val out = AsOfJoin.nearest(trades, quotes, Seq("k"), "ts", "ts", Seq("price"))
      .select($"trade_id", $"price").as[(String, Option[Double])]
      .collect().toMap
    assert(out("t1").contains(100.0))
    assert(out("t2").contains(101.0))
    assert(out("t3").contains(100.0))
    assert(out("t4").contains(100.0))
    assert(out("t5").contains(101.0))
  }

  test("nearest plans a single exchange for both directional windows") {
    val l = Seq((1, ts("2024-01-01 10:00:00"), "x")).toDF("k", "ts", "v")
    val r = Seq((1, ts("2024-01-01 09:00:00"), "y")).toDF("k", "ts", "p")
    val plan = AsOfJoin.nearest(l, r, Seq("k"), "ts", "ts", Seq("p"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("tied right rows at one (key, ts): both directions pick the min payload — layout-invariant") {
    val quotes = Seq(
      (1, ts("2024-01-01 10:00:00"), 100.0),
      (1, ts("2024-01-01 10:00:00"), 101.0),  // same key AND ts
    ).toDF("k", "ts", "price")
    val trades = Seq((1, ts("2024-01-01 10:30:00"), "t1"),
      (1, ts("2024-01-01 09:30:00"), "t2")).toDF("k", "ts", "trade_id")
    for (parts <- Seq(1, 7)) {
      val q = quotes.repartition(parts)
      // one tie convention for every direction: the frame edge lands on
      // the SMALLEST payload struct whether read by last() (backward,
      // __rv desc) or first() (forward, __rv asc)
      val back = AsOfJoin.backward(trades, q, Seq("k"), "ts", "ts", Seq("price"))
        .select($"trade_id", $"price").as[(String, Option[Double])].collect().toMap
      assert(back("t1").contains(100.0), s"parts=$parts got $back")
      val fwd = AsOfJoin.forward(trades, q, Seq("k"), "ts", "ts", Seq("price"))
        .select($"trade_id", $"price").as[(String, Option[Double])].collect().toMap
      assert(fwd("t2").contains(100.0), s"parts=$parts got $fwd")
    }
  }

  test("unorderable (map) right payloads fall back to ts/side ordering instead of failing analysis") {
    import org.apache.spark.sql.functions.{lit, map}
    val r = Seq((1, ts("2024-01-01 09:00:00"), "y"))
      .toDF("k", "ts", "v")
      .select($"k", $"ts", map(lit("a"), $"v").as("attrs"))
    val l = Seq((1, ts("2024-01-01 10:00:00"), "x")).toDF("k", "ts", "w")
    val out = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("attrs"))
    assert(out.select("attrs").head().getMap[String, String](0).get("a").contains("y"))
  }

  test("name collision on right value column gets suffixed") {
    val l = Seq((1, ts("2024-01-01 10:00:00"), "x")).toDF("k", "ts", "v")
    val r = Seq((1, ts("2024-01-01 09:00:00"), "y")).toDF("k", "ts", "v")
    val out = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "ts", "v", "v_right"))
    assert(out.select("v_right").as[String].head() == "y")
  }

  test("null timestamps match nothing: null-ts left rows survive unmatched, null-ts right rows never match") {
    val quotes = Seq(
      (1, Option(ts("2024-01-01 10:00:00")), 100.0),
      (1, Option.empty[Timestamp], 999.0),      // must never be picked
    ).toDF("k", "ts", "price")
    val trades = Seq(
      (1, Option(ts("2024-01-01 09:00:00")), "t_fwd"),  // forward -> 100.0
      (1, Option(ts("2024-01-01 11:00:00")), "t_back"), // backward -> 100.0
      (1, Option.empty[Timestamp], "t_null"),           // no match, any direction
    ).toDF("k", "ts", "trade_id")
    for (dir <- Seq(AsOfJoin.backward _, AsOfJoin.forward _, AsOfJoin.nearest _)) {
      val out = dir(trades, quotes, Seq("k"), "ts", "ts", Seq("price"), "_right")
        .select($"trade_id", $"price").as[(String, Option[Double])]
        .collect().toMap
      assert(out.size == 3, "left-outer: every trade survives")
      assert(out("t_null").isEmpty, "null left ts must not match")
      assert(!out.values.flatten.exists(_ == 999.0), "null right ts must not be picked")
    }
  }

  test("right rows tied on (key, ts): every direction picks the same smallest payload") {
    val t0 = ts("2024-01-01 10:00:00")
    val quotes = Seq((1, t0, 100.0), (1, t0, 101.0), (1, t0, 102.0))
      .toDF("k", "ts", "price")
    val trades = Seq((1, t0, "t_eq")).toDF("k", "ts", "trade_id")
    for (dir <- Seq(AsOfJoin.backward _, AsOfJoin.forward _, AsOfJoin.nearest _)) {
      val out = dir(trades, quotes, Seq("k"), "ts", "ts", Seq("price"), "_right")
        .select($"price").as[Double].collect().toSeq
      assert(out == Seq(100.0), s"expected min-payload pick, got $out")
    }
  }
}
