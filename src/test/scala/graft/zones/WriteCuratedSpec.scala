package graft.zones

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WriteCuratedSpec extends SparkSpec {
  import spark.implicits._

  test("writeCurated: partition layout, file-size cap, and zone-map-friendly sort order") {
    val root = java.nio.file.Files.createTempDirectory("graft-curated").toString
    val df = spark.range(1000).select(col("id"),
      concat(lit("s"), pmod(col("id"), lit(2))).as("source"))
      // scramble so the sink's sortWithinPartitions has real work to do
      .orderBy(sha2(col("id").cast("string"), 256))
      .coalesce(2)
    Zones.writeCurated(df, root, partitionCols = Seq("source"),
      sortCols = Seq("id"), maxRecordsPerFile = 100L)

    // partition pruning layout on disk
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("source=s0", "source=s1"))

    // roundtrip is lossless
    val back = spark.read.parquet(root)
    assert(back.count() === 1000)
    assert(back.select("id").exceptAll(df.select("id")).isEmpty)

    // every file respects the record cap
    val perFile = back.groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
      .as[(String, Long, Long, Long)].collect()
    assert(perFile.forall(_._2 <= 100), perFile.map(_._2).mkString(","))
    // clustering + sortWithinPartitions: each partition DIRECTORY is one
    // sorted run of capped files, so its [lo, hi] ranges must not
    // overlap AT ALL — that's what makes parquet min/max stats prune
    // point/range reads (zone maps)
    perFile.groupBy(_._1.split("/").init.last).foreach { case (dir, files) =>
      val runs = files.sortBy(_._3).toSeq
      runs.sliding(2).foreach {
        case Seq((_, _, _, hiA), (_, _, loB, _)) =>
          assert(hiA < loB, s"$dir file ranges overlap:\n${runs.mkString("\n")}")
        case _ => ()
      }
    }
  }
}
