package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._
  import CdcStream.Update

  test("streaming latestByKey: winners update across batches, late updates lose, no-ops stay silent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Update]
    val root = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val view = CdcStream.latestByKey(mem.toDS())

    val sink = new java.util.concurrent.ConcurrentLinkedQueue[Update]()
    def drain(): Unit = {
      val q = view.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Update], _: Long) =>
          batch.collect().foreach(sink.add); ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    mem.addData(Update(1, 10, 1, "a1"), Update(1, 20, 2, "a2"), Update(2, 5, 3, "b1"))
    drain()
    // batch 1: key 1 emits only its winner (ord 20), key 2 emits b1
    assert(sink.size === 2)
    assert(sink.toArray(Array.empty[Update]).toSet ===
      Set(Update(1, 20, 2, "a2"), Update(2, 5, 3, "b1")))

    sink.clear()
    // late update for key 1 (ord 15 < stored 20) must NOT emit or win;
    // key 2 advances and emits
    mem.addData(Update(1, 15, 4, "late"), Update(2, 9, 5, "b2"))
    drain()
    assert(sink.toArray(Array.empty[Update]).toSeq === Seq(Update(2, 9, 5, "b2")))

    sink.clear()
    // replaying the exact stored winner is a no-op (nothing emitted)
    mem.addData(Update(2, 9, 5, "b2"))
    drain()
    assert(sink.isEmpty)

    // stream result converges to the batch operator on the same updates
    val all = Seq(Update(1, 10, 1, "a1"), Update(1, 20, 2, "a2"),
      Update(2, 5, 3, "b1"), Update(1, 15, 4, "late"), Update(2, 9, 5, "b2"))
    val batch = graft.operators.Scd.latestByKey(all.toDF(), Seq("key"), "ord", "tie")
      .as[Update].collect().toSet
    assert(batch === Set(Update(1, 20, 2, "a2"), Update(2, 9, 5, "b2")))
  }
}
