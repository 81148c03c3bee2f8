package graft.pipeline

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability without extra passes: `Dataset.observe` plants a
  * CollectMetrics node in the plan, so audit statistics (row counts,
  * sums) are computed by the WRITE's own execution instead of a separate
  * `count()` job re-deriving the transform. At 100 TB the difference is
  * re-reading the table once per audit metric vs reading it zero extra
  * times.
  *
  * Batch-side capture: observed metrics surface on the completed
  * execution's `observedMetrics`, delivered asynchronously through the
  * listener bus — [[capture]] registers a temporary QueryExecutionListener
  * around the action and waits (bounded) for the metric row.
  */
object Observe {

  /** Tag `df` so the next action over it also produces a row count. */
  def withRowCount(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("n_rows"))

  /** Run `action` and return the observed-metric row `name` from the
    * action's own execution. None if no execution carrying the metric
    * completes within `timeoutSec` (listener delivery is async). */
  def capture(spark: SparkSession, name: String, timeoutSec: Long = 60)
             (action: => Unit): Option[Row] = {
    @volatile var got: Option[Row] = None
    val latch = new CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach { row =>
          got = Some(row); latch.countDown()
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      action
      latch.await(timeoutSec, TimeUnit.SECONDS)
      got
    } finally spark.listenerManager.unregister(listener)
  }

  private val captureSeq = new java.util.concurrent.atomic.AtomicLong()

  /** [[withRowCount]] + [[capture]] around a write: returns the number of
    * rows the action consumed, falling back to a counted second pass only
    * if the metric was not delivered. The metric name is suffixed with a
    * per-call sequence number so concurrent captures on the same session
    * (another thread, a running stream) cannot satisfy each other's
    * listener with the wrong execution's row. */
  def countedAction(spark: SparkSession, df: DataFrame, name: String)
                   (action: DataFrame => Unit): Long = {
    val unique = s"${name}_${captureSeq.incrementAndGet()}"
    val tagged = withRowCount(df, unique)
    capture(spark, unique)(action(tagged))
      .map(_.getAs[Long]("n_rows"))
      .getOrElse(df.count())
  }
}
