package graft.zones

import graft.SparkSpec

class LenientReadSpec extends SparkSpec {

  test("readLandingLenient quarantines malformed lines, keeps clean rows intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lenient")
    val good1 = "r1,2024-03-05 10:00:00,2024-03-05 09:59:00,t1,alice,5,Spark BigData,great stuff"
    val good2 = "r2,2024-03-05 10:01:00,2024-03-05 10:00:30,t2,bob,0,,plain text"
    val badType = "r3,2024-03-05 10:02:00,2024-03-05 10:01:00,t3,carol,NOT_A_NUMBER,X,y"
    val badArity = "r4,only,three"
    java.nio.file.Files.write(dir.resolve("part-0.csv"),
      Seq(good1, good2, badType, badArity).mkString("\n").getBytes("UTF-8"))

    val lenient = Zones.readLandingLenient(spark, dir.toString)
    val (clean, corrupt) = (lenient.clean, lenient.corrupt)
    val cleanRows = clean.collect()
    assert(cleanRows.length === 2, cleanRows.mkString("\n"))
    assert(cleanRows.map(_.getAs[String]("record_id")).toSet === Set("r1", "r2"))
    assert(cleanRows.find(_.getAs[String]("record_id") == "r1")
      .get.getAs[Int]("rt_count") === 5)

    val corruptLines = corrupt.collect().map(_.getString(0)).toSet
    assert(corruptLines === Set(badType, badArity), corruptLines)

    // release frees the shared parse's cached blocks — the collects above
    // materialized the cache, so it MUST be registered before release
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    assert(cachedBefore > 0, "expected the lenient parse to be cached")
    lenient.release()
    assert(spark.sparkContext.getPersistentRDDs.size < cachedBefore)
  }
}
