package graft.pipeline

import graft.SparkSpec
import graft.zones.Zones
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Golden end-to-end test of the landing→staging→analytical pipeline
  * (SURVEY.md §5.3) on reference-shaped fixtures (FIXTURES.md B.2):
  * multi-hashtag fan-out, empty-hashtag drop, duplicate dedup, dirty
  * text, audit rows, and re-run semantics.
  */
class EtlJobSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureLanding = Seq(
    // record_id, timestamp, created, tweet_id, user_name, rt_count, hashtags, text
    ("r1", "2024-03-05 10:00:00", "2024-03-05 09:59:00", "t1", "alice", 120,
      "Spark BigData", "RT Spark is great https://t.co/x \"quoted\" !!"),
    ("r2", "2024-03-05 10:01:00", "2024-03-05 09:58:00", "t2", "bob", 250,
      "Spark", "terrible awful day &amp; broken pipeline"),
    // duplicate of r1's (record_id, tweet_id, hashtag) triple -> deduped
    ("r1", "2024-03-05 10:00:00", "2024-03-05 09:59:00", "t1", "alice", 120,
      "Spark", "RT Spark is great https://t.co/x \"quoted\" !!"),
    // hashtags that clean to empty -> dropped by F6
    ("r3", "2024-03-05 10:02:00", "2024-03-05 09:57:00", "t3", "carol", 999,
      "!!! ???", "some text with no usable hashtags"),
  ).toDF("record_id", "timestamp", "created", "tweet_id", "user_name",
    "rt_count", "hashtags", "text")

  private def tmp(): String = Files.createTempDirectory("graft-e2e").toString

  test("golden e2e: explode, clean, dedup, partition, audit") {
    val root = tmp()
    Zones.writeLandingDay(fixtureLanding, s"$root/landing", 2024, 3, 5)

    val res = EtlJob.run(spark, s"$root/landing", s"$root/staging",
      s"$root/analytical", s"$root/log", 2024, 3, 5, "2024-03-05 11:00:00")

    // r1: Spark+BigData (2 tags), r2: Spark (1), r1-dup: Spark (deduped),
    // r3: empty tags dropped => 3 staged rows
    assert(res.stagingLog.recordsInserted == 3)
    assert(res.analyticalLog.map(_.recordsInserted).contains(3L))

    val analytical = Zones.readAnalytical(spark, s"$root/analytical")
    assert(analytical.count() == 3)
    // positional rename contract: staging text -> analytical text_clean
    val texts = analytical.select("text_clean").as[String].collect()
    assert(texts.forall(t => !t.contains("https") && !t.contains("\"")))
    // partition columns derive from arrival timestamp
    val parts = analytical.select("year", "month", "day").distinct().collect()
    assert(parts.length == 1 && parts(0).getInt(0) == 2024
      && parts(0).getInt(1) == 3 && parts(0).getInt(2) == 5)
    // sentiment: r2's text is negative
    val p2 = analytical.filter($"record_id" === "r2")
      .select("polarity").as[Float].head()
    assert(p2 < 0)

    // audit log: two rows (staging + analytical), partitioned
    val log = Zones.readLog(spark, s"$root/log")
    assert(log.count() == 2)
    val tables = log.select("table_name").as[String].collect().toSet
    assert(tables == Set("staging.hashtags_proc", "analytical.hashtag_data"))
  }

  test("reference parity: plain re-run appends duplicates; idempotent re-run is a no-op") {
    val root = tmp()
    Zones.writeLandingDay(fixtureLanding, s"$root/landing", 2024, 3, 5)

    EtlJob.run(spark, s"$root/landing", s"$root/staging",
      s"$root/analytical", s"$root/log", 2024, 3, 5, "2024-03-05 11:00:00")
    // reference semantics: analytical is append-only, re-run duplicates
    EtlJob.run(spark, s"$root/landing", s"$root/staging",
      s"$root/analytical", s"$root/log", 2024, 3, 5, "2024-03-05 12:00:00")
    assert(Zones.readAnalytical(spark, s"$root/analytical").count() == 6)

    // idempotent variant: third run inserts 0
    val res3 = EtlJob.run(spark, s"$root/landing", s"$root/staging",
      s"$root/analytical", s"$root/log", 2024, 3, 5, "2024-03-05 13:00:00",
      idempotent = true)
    assert(res3.analyticalLog.map(_.recordsInserted).contains(0L))
    assert(Zones.readAnalytical(spark, s"$root/analytical").count() == 6)
  }

  test("S12 refresh hook: cached analytical plans see post-append rows") {
    val root = tmp()
    Zones.writeLandingDay(fixtureLanding, s"$root/landing", 2024, 3, 5)
    EtlJob.run(spark, s"$root/landing", s"$root/staging",
      s"$root/analytical", s"$root/log", 2024, 3, 5, "2024-03-05 11:00:00")

    // a downstream consumer caches the analytical table (BI-style)
    val consumer = Zones.readAnalytical(spark, s"$root/analytical").cache()
    assert(consumer.count() == 3)
    try {
      // a second load appends 3 more rows; run() fires the refresh hook,
      // so a re-read through the SAME cached plan must see 6, not the
      // stale cache entry
      EtlJob.run(spark, s"$root/landing", s"$root/staging",
        s"$root/analytical", s"$root/log", 2024, 3, 5, "2024-03-05 12:00:00")
      assert(Zones.readAnalytical(spark, s"$root/analytical").count() == 6)
    } finally consumer.unpersist()
  }

  test("empty landing day: staging log records 0, analytical load is gated off") {
    val root = tmp()
    Zones.writeLandingDay(fixtureLanding.limit(0), s"$root/landing", 2024, 3, 6)
    val res = EtlJob.run(spark, s"$root/landing", s"$root/staging",
      s"$root/analytical", s"$root/log", 2024, 3, 6, "2024-03-06 11:00:00")
    assert(res.stagingLog.recordsInserted == 0)
    assert(res.analyticalLog.isEmpty)
    assert(!new java.io.File(s"$root/analytical").exists())
  }

  test("F5 lookback: modifiedAfter skips files older than the horizon") {
    val root = tmp()
    Zones.writeLandingDay(fixtureLanding, s"$root/landing", 2024, 3, 5)
    Zones.writeLandingDay(fixtureLanding.limit(1), s"$root/landing2", 2024, 3, 5)
    // pin mtimes explicitly (no sleeps, no wall-clock race): old files an
    // hour ago, fresh files now, cutoff in between
    val now = System.currentTimeMillis()
    new java.io.File(s"$root/landing/2024/03/05").listFiles()
      .foreach(_.setLastModified(now - 3600 * 1000))
    new java.io.File(s"$root/landing2/2024/03/05").listFiles()
      .foreach(_.setLastModified(now))
    val cutoff = java.time.LocalDateTime.now().minusMinutes(30)
    // fresh dir read with a cutoff BEFORE its mtime: included
    val fresh = Zones.readLanding(spark, s"$root/landing2/2024/03/05", Some(cutoff))
    assert(fresh.count() == 1)
    // old dir read with a cutoff AFTER its mtime: excluded by file listing
    val stale = Zones.readLanding(spark, s"$root/landing/2024/03/05", Some(cutoff))
    assert(stale.count() == 0)
  }

  test("landing roundtrip: header-less CSV with imposed schema") {
    val root = tmp()
    Zones.writeLandingDay(fixtureLanding, s"$root/landing", 2024, 3, 5)
    val back = Zones.readLandingDay(spark, s"$root/landing", 2024, 3, 5)
    assert(back.count() == 4)
    assert(back.schema.fieldNames.toSeq == graft.Schemas.landing.fieldNames.toSeq)
    assert(back.filter($"rt_count" === 250).select("user_name").as[String].head() == "bob")
  }
}
