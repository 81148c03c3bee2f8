package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared home for the localCheckpoint release protocol (ADVICE r11:
  * Graphs, Similarity, Dedup and SuffixDedup each carried a private
  * verbatim copy — one owner removes the divergence risk if the
  * unpersist protocol ever changes with a Spark upgrade).
  *
  * Iterative operators (prefix-doubling ranks, NN-Descent rounds,
  * HyperBall, incremental dedup) `localCheckpoint` each round to cut
  * lineage, then free the PREDECESSOR round's blocks once the
  * successor is materialized. Plain `Dataset.unpersist` only talks to
  * the cache manager, not to the checkpointed RDD, so the release has
  * to reach through the analyzed plan to the `LogicalRDD` and
  * unpersist that RDD directly. */
private[graft] object Checkpoints {

  /** Frees the storage blocks behind a `localCheckpoint`ed frame.
    * Safe once the successor round is materialized. */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
