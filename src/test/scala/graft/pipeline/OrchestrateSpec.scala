package graft.pipeline

import graft.SparkSpec
import graft.zones.Zones
import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer

class OrchestrateSpec extends SparkSpec {
  import spark.implicits._

  test("withRetry: transient failures retried on the 5s/10s backoff schedule, then succeeds") {
    var calls = 0
    val delays = ArrayBuffer.empty[Long]
    val out = Orchestrate.withRetry(sleep = delays += _) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"transient #$calls")
      "ok"
    }
    assert(out == "ok")
    assert(calls == 3)
    // reference policy: IntervalSeconds 5, BackoffRate 2.0
    assert(delays.toSeq == Seq(5000L, 10000L))
  }

  test("withRetry: gives up after maxAttempts and rethrows the last failure") {
    var calls = 0
    val delays = ArrayBuffer.empty[Long]
    val e = intercept[RuntimeException] {
      Orchestrate.withRetry(sleep = delays += _) {
        calls += 1
        throw new RuntimeException(s"attempt $calls")
      }
    }
    assert(calls == 3)
    assert(e.getMessage == "attempt 3")
    assert(delays.toSeq == Seq(5000L, 10000L)) // no sleep after the final attempt
  }

  test("withRetry: fatal errors propagate immediately, no retry") {
    var calls = 0
    intercept[InterruptedException] {
      Orchestrate.withRetry(sleep = _ => ()) {
        calls += 1
        throw new InterruptedException("fatal")
      }
    }
    assert(calls == 1)
  }

  test("withRetry: first-attempt success never sleeps") {
    val delays = ArrayBuffer.empty[Long]
    assert(Orchestrate.withRetry(sleep = delays += _)(42) == 42)
    assert(delays.isEmpty)
  }

  test("runEtlWithRetry: transient stage failure recovers and the retried run stays exact") {
    val root = Files.createTempDirectory("graft-retry").toString
    val landing = Seq(
      ("r1", "2024-03-05 10:00:00", "2024-03-05 09:59:00", "t1", "alice", 120,
        "Spark BigData", "Spark is great"),
    ).toDF("record_id", "timestamp", "created", "tweet_id", "user_name",
      "rt_count", "hashtags", "text")
    Zones.writeLandingDay(landing, s"$root/landing", 2024, 3, 5)

    // Inject one transient failure AROUND the stage the way an
    // orchestrated deployment sees them (the stage itself is all-Spark):
    // first attempt dies, second runs the real job.
    var attempts = 0
    val delays = ArrayBuffer.empty[Long]
    val res = Orchestrate.withRetry(sleep = delays += _) {
      attempts += 1
      if (attempts == 1) throw new RuntimeException("simulated executor loss")
      EtlJob.run(spark, s"$root/landing", s"$root/staging", s"$root/analytical",
        s"$root/log", 2024, 3, 5, "2024-03-05 11:00:00", idempotent = true)
    }
    assert(attempts == 2)
    assert(delays.toSeq == Seq(5000L))
    assert(res.analyticalLog.map(_.recordsInserted).contains(2L)) // Spark + BigData

    // a full replay through the retry wrapper is a no-op (idempotent mode)
    val res2 = Orchestrate.runEtlWithRetry(spark, s"$root/landing",
      s"$root/staging", s"$root/analytical", s"$root/log", 2024, 3, 5,
      "2024-03-05 12:00:00", sleep = _ => ())
    assert(res2.analyticalLog.map(_.recordsInserted).contains(0L))
    assert(Zones.readAnalytical(spark, s"$root/analytical").count() == 2)
  }
}
