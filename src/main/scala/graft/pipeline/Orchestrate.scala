package graft.pipeline

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Driver-side retry/backoff — the reference's Step Functions retry
  * policy (KinesisLandingStateMachine.json:8-17 and
  * LandingAnalyticalStateMachine.json:10-18: retry `States.ALL`,
  * MaxAttempts 3, IntervalSeconds 5, BackoffRate 2.0) re-expressed as a
  * function combinator. Step Functions retried whole Lambda stages; here
  * any driver-side stage (an [[EtlJob.run]], a zone write, a stream
  * drain) can be wrapped.
  *
  * Retrying a stage is safe exactly when the stage is idempotent — which
  * is what the staging overwrite-write and [[EtlJob.run]]'s
  * `idempotent = true` anti-join exist for. Wrap those; don't wrap blind
  * appends.
  */
object Orchestrate {

  /** Runs `body`, retrying transient (non-fatal) failures with
    * exponential backoff. Defaults mirror the reference policy: 3 total
    * attempts, 5 s first interval, ×2 per retry.
    *
    * @param sleep   injectable delay (tests pass a recorder; production
    *                uses `Thread.sleep`)
    * @param onRetry observability hook invoked before each backoff with
    *                (attempt just failed, 1-based; the error)
    */
  def withRetry[T](maxAttempts: Int = 3,
                   baseDelayMs: Long = 5000L,
                   backoffRate: Double = 2.0,
                   sleep: Long => Unit = Thread.sleep,
                   onRetry: (Int, Throwable) => Unit = (_, _) => ())(body: => T): T = {
    require(maxAttempts >= 1, s"maxAttempts=$maxAttempts must be >= 1")
    var attempt = 1
    var delayMs = baseDelayMs.toDouble
    while (attempt < maxAttempts) {
      try return body
      catch {
        case NonFatal(e) =>
          onRetry(attempt, e)
          sleep(delayMs.toLong)
          delayMs *= backoffRate
          attempt += 1
      }
    }
    body // last attempt: let any failure propagate
  }

  /** [[EtlJob.run]] under the reference retry policy. `idempotent`
    * defaults to true here (unlike the raw run): a retried attempt that
    * already appended must not double-load the analytical zone. */
  def runEtlWithRetry(spark: SparkSession, landingRoot: String,
                      stagingPath: String, analyticalPath: String,
                      logPath: String, year: Int, month: Int, day: Int,
                      runTime: String, idempotent: Boolean = true,
                      maxAttempts: Int = 3, baseDelayMs: Long = 5000L,
                      backoffRate: Double = 2.0,
                      sleep: Long => Unit = Thread.sleep): EtlJob.RunResult =
    withRetry(maxAttempts, baseDelayMs, backoffRate, sleep) {
      EtlJob.run(spark, landingRoot, stagingPath, analyticalPath, logPath,
        year, month, day, runTime, idempotent)
    }
}
