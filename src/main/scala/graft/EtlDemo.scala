package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.EtlJob
import graft.streaming.Ingest
import graft.zones.Zones
import java.nio.file.Files

/** Runnable end-to-end demo of the zone pipeline + streaming ingest —
  * doubles as the verification drive for the library surface. Writes to
  * a temp dir, prints the resulting tables and audit log.
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("graft-demo").toString
    println(s"[demo] working under $root")

    // --- 1. streaming ingest: JSON records as a file-based stream source
    val rawDir = s"$root/raw"
    new java.io.File(rawDir).mkdirs()
    val records = Seq(
      """{"record_id":"r1","ts":"2024-03-05 10:00:00","payload":"{\"created\":\"2024-03-05 09:59:00\",\"tweet_id\":\"t1\",\"user_name\":\"alice\",\"rt_count\":150,\"hashtags\":\"Spark BigData\",\"text\":\"RT Spark is great https://t.co/x !!\"}"}""",
      """{"record_id":"r2","ts":"2024-03-05 10:01:00","payload":"{\"created\":\"2024-03-05 09:58:00\",\"tweet_id\":\"t2\",\"user_name\":\"bob\",\"rt_count\":50,\"hashtags\":\"Low\",\"text\":\"filtered out\"}"}""",
      """{"record_id":"r3","ts":"2024-03-05 10:02:00","payload":"{\"created\":\"2024-03-05 09:57:00\",\"tweet_id\":\"t3\",\"user_name\":\"carol\",\"rt_count\":300,\"hashtags\":\"terrible awful\",\"text\":\"terrible awful day broken pipeline\"}"}""",
    )
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$rawDir/batch1.json"),
      records.mkString("\n").getBytes)

    val rawSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("record_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(rawSchema).json(rawDir)
      .withColumn("ts", to_timestamp(col("ts"), "yyyy-MM-dd HH:mm:ss"))
    val parsed = Ingest.parseRecords(stream).filter(Ingest.listenerFilter)
    val q = Ingest.ingestToLanding(parsed, s"$root/landing_p", s"$root/ckpt")
    q.awaitTermination(120000)
    println("[demo] streamed landing partitions:")
    spark.read.schema(Schemas.landing).option("header", "false")
      .csv(s"$root/landing_p/year=2024/month=3/day=5").show(false)

    // --- 2. batch ETL over a reference-shaped landing day
    val landing = Seq(
      ("r1", "2024-03-05 10:00:00", "2024-03-05 09:59:00", "t1", "alice", 150,
        "Spark BigData", "RT Spark is great https://t.co/x !!"),
      ("r3", "2024-03-05 10:02:00", "2024-03-05 09:57:00", "t3", "carol", 300,
        "terrible awful", "terrible awful day broken pipeline"),
      ("r3", "2024-03-05 10:02:00", "2024-03-05 09:57:00", "t3", "carol", 300,
        "terrible", "terrible awful day broken pipeline"),  // dup (r3,t3,terrible)
    ).toDF("record_id", "timestamp", "created", "tweet_id", "user_name",
      "rt_count", "hashtags", "text")
    Zones.writeLandingDay(landing, s"$root/landing", 2024, 3, 5)

    val res = EtlJob.run(spark, s"$root/landing", s"$root/staging",
      s"$root/analytical", s"$root/log", 2024, 3, 5, "2024-03-05 11:00:00")
    println(s"[demo] run 1: staging=${res.stagingLog.recordsInserted} " +
      s"analytical=${res.analyticalLog.map(_.recordsInserted)}")

    val res2 = EtlJob.run(spark, s"$root/landing", s"$root/staging",
      s"$root/analytical", s"$root/log", 2024, 3, 5, "2024-03-05 12:00:00",
      idempotent = true)
    println(s"[demo] run 2 (idempotent): analytical inserts=" +
      s"${res2.analyticalLog.map(_.recordsInserted)}")

    println("[demo] analytical table:")
    Zones.readAnalytical(spark, s"$root/analytical")
      .select("hash_id", "record_id", "hashtag", "polarity", "text_clean", "year", "month", "day")
      .show(false)
    println("[demo] audit log:")
    Zones.readLog(spark, s"$root/log").orderBy("time_stamp", "table_name").show(false)

    // --- 2b. unified streaming ETL: same raw stream straight to analytical
    val setl1 = graft.streaming.StreamingEtl.run(spark,
      spark.readStream.schema(rawSchema).json(rawDir)
        .withColumn("ts", to_timestamp(col("ts"), "yyyy-MM-dd HH:mm:ss")),
      s"$root/sa", s"$root/slog", s"$root/sckpt")
    setl1.awaitTermination(120000)
    println("[demo] streaming-etl analytical:")
    Zones.readAnalytical(spark, s"$root/sa")
      .select("record_id", "hashtag", "polarity").orderBy("record_id", "hashtag").show(false)
    // re-drain with no new data: idempotent no-op
    val setl2 = graft.streaming.StreamingEtl.run(spark,
      spark.readStream.schema(rawSchema).json(rawDir)
        .withColumn("ts", to_timestamp(col("ts"), "yyyy-MM-dd HH:mm:ss")),
      s"$root/sa", s"$root/slog", s"$root/sckpt")
    setl2.awaitTermination(120000)
    println(s"[demo] streaming-etl rows after re-drain: " +
      Zones.readAnalytical(spark, s"$root/sa").count())

    // --- 2c. landing compaction: many small files -> few
    val beforeFiles = new java.io.File(s"$root/landing/2024/03/05")
      .listFiles().count(_.getName.endsWith(".csv"))
    Zones.compactLandingDay(spark, s"$root/landing", 2024, 3, 5)
    val afterFiles = new java.io.File(s"$root/landing/2024/03/05")
      .listFiles().count(_.getName.endsWith(".csv"))
    println(s"[demo] compaction: $beforeFiles csv files -> $afterFiles; " +
      s"rows=${Zones.readLandingDay(spark, s"$root/landing", 2024, 3, 5).count()}")

    // --- 3. probe: empty day gates off the analytical load
    val res3 = EtlJob.run(spark, s"$root/landing", s"$root/staging2",
      s"$root/analytical2", s"$root/log", 2024, 3, 9, "2024-03-09 11:00:00")
    println(s"[demo] empty-day probe: staging=${res3.stagingLog.recordsInserted} " +
      s"analytical=${res3.analyticalLog} (expect 0 / None)")

    // --- 4. LLM curation pipeline over the testdata documents table:
    // gate -> exact dedup -> near-dup -> decontaminate -> mixture ->
    // pack -> z-ordered sink, audit counts riding each stage's write
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val benchmark = docs.orderBy("doc_id").limit(3).select("text")
    val cur = graft.pipeline.CurationPipeline.run(spark, docs, benchmark,
      s"$root/curation", mixtureScale = 4.0, packCapacity = 2048L)
    println("[demo] curation audit ledger:")
    cur.audits.foreach(a => println(f"[demo]   ${a.stage}%-18s ${a.rows}%6d rows"))
    println(s"[demo] curated table at ${cur.outPath}: " +
      s"${spark.read.parquet(cur.outPath).count()} rows")

    spark.stop()
    println("[demo] DONE")
  }
}
