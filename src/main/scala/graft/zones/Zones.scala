package graft.zones

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Schemas

/** Readers and writers for the four zone tables (SURVEY.md §1.1, §2.1).
  *
  * Zones are path-based partitioned tables. At cluster scale the paths
  * are object-store URIs and the writes are the only shuffle-adjacent
  * stages (partitioned write = one file set per (year,month,day)); on
  * the test host they are local dirs. Nothing here caches or collects.
  */
object Zones {

  /** S5: header-less CSV multi-file read with imposed schema. Spark's
    * file index handles the multi-file union natively — the reference's
    * per-object loop + pd.concat (staging-transform.py:125-143)
    * disappears. `modifiedAfter` (S3/F5) pushes the freshness horizon
    * into file listing, before any bytes are read. */
  def readLanding(spark: SparkSession, path: String,
                  modifiedAfter: Option[java.time.LocalDateTime] = None): DataFrame = {
    val r = spark.read.schema(Schemas.landing).option("header", "false")
    modifiedAfter.fold(r)(ts => r.option("modifiedAfter", ts.toString))
      .csv(path)
  }

  /** S4: partition-pruned read of one calendar day's landing prefix
    * (`landing/YYYY/MM/DD/` in the reference, staging-transform.py:216-221).
    * A day with no prefix at all (consumer wrote nothing) reads as an
    * empty batch — the reference crashes on that case
    * (analytical-transform.py:123-125 UnboundLocalError, a bug we don't
    * replicate; SURVEY.md §7.4). */
  def readLandingDay(spark: SparkSession, root: String,
                     year: Int, month: Int, day: Int): DataFrame = {
    val path = f"$root/$year%04d/$month%02d/$day%02d"
    if (!pathExists(spark, path))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Schemas.landing)
    else readLanding(spark, path)
  }

  /** Existence check through the Hadoop FileSystem API — correct for
    * local paths and object stores alike. */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Number of data files currently under a parquet table path — the
    * compaction-trigger metric for per-batch-append tables. */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(_.getPath.getName.startsWith("part-"))
  }

  /** Crash-safe full-table rewrite: `write` lands the new contents in a
    * sibling temp dir, which then swaps in via delete + directory rename.
    * Dying before the rename leaves the original intact (the half-written
    * temp dir is deleted on the next attempt); dying between delete and
    * rename leaves no table — ONLY callers whose table is DERIVED data
    * (band tables) may use this, because they rebuild it from the source
    * of truth at startup. Source-of-truth tables (signature/vector
    * tables) must use [[replaceKeepingBackup]], which never leaves zero
    * copies on disk. */
  def replaceAtomically(spark: SparkSession, path: String)
                       (write: String => Unit): Unit = {
    val hc = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hc)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    fs.delete(tmp, true)
    write(tmp.toString)
    fs.delete(p, true)
    if (!fs.rename(tmp, p))
      sys.error(s"replaceAtomically: rename $tmp -> $p failed")
    spark.catalog.refreshByPath(path)
  }

  /** Source-of-truth-safe full-table rewrite: unlike [[replaceAtomically]]
    * there is NO instant at which zero copies of the table exist on disk.
    * Sequence: write tmp → rename current to `path__old` → rename tmp to
    * `path` → delete `path__old`. Every crash window leaves either the
    * old table (at `path` or at `__old`) or the complete new one; callers
    * run [[recoverBackup]] at startup to close the mid-swap window.
    * Rename results are checked — a failed rename aborts loudly rather
    * than proceeding into data loss. */
  def replaceKeepingBackup(spark: SparkSession, path: String)
                          (write: String => Unit): Unit = {
    val hc = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hc)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(tmp, true)
    write(tmp.toString)
    // a stale __old can only be the remnant of a COMPLETED prior swap
    // (recoverBackup restores an interrupted one before we get here)
    fs.delete(old, true)
    if (fs.exists(p) && !fs.rename(p, old))
      sys.error(s"replaceKeepingBackup: rename $p -> $old failed")
    if (!fs.rename(tmp, p))
      sys.error(s"replaceKeepingBackup: rename $tmp -> $p failed")
    fs.delete(old, true)
    spark.catalog.refreshByPath(path)
  }

  /** Startup recovery for [[replaceKeepingBackup]]'s mid-swap crash
    * window. If `path` is missing but `path__old` exists, the process
    * died between the two renames — restore the backup. If both exist,
    * the swap completed but the cleanup delete didn't — drop the stale
    * backup. A half-written `path__compacting` is deleted either way
    * (the next rewrite starts fresh). */
  def recoverBackup(spark: SparkSession, path: String): Unit = {
    val hc = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hc)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(new org.apache.hadoop.fs.Path(path + "__compacting"), true)
    if (fs.exists(old)) {
      if (!fs.exists(p)) {
        if (!fs.rename(old, p))
          sys.error(s"recoverBackup: rename $old -> $p failed")
        spark.catalog.refreshByPath(path)
      } else fs.delete(old, true)
    }
  }

  /** Compact a landing day's files to ~`targetFileBytes` outputs.
    * Streaming ingest produces one small file per micro-batch per
    * partition; at 100 TB that turns every downstream scan into a
    * file-listing storm. Compaction rewrites the prefix with
    * ceil(bytes/target) files via an atomic-ish tmp-write + swap.
    * Run it out-of-band (the reference's DeleteStagingOld slot). */
  def compactLandingDay(spark: SparkSession, root: String,
                        year: Int, month: Int, day: Int,
                        targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val path = f"$root/$year%04d/$month%02d/$day%02d"
    if (!pathExists(spark, path)) return
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    readLanding(spark, path)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).option("header", "false")
      .csv(tmp.toString)
    fs.delete(hPath, true)
    fs.rename(tmp, hPath)
  }

  /** S7: landing sink — header-less CSV under the date prefix. */
  def writeLandingDay(df: DataFrame, root: String,
                      year: Int, month: Int, day: Int): Unit =
    df.select(Schemas.landing.fieldNames.toSeq.map(col): _*)
      .write.mode(SaveMode.Append).option("header", "false")
      .csv(f"$root/$year%04d/$month%02d/$day%02d")

  /** Staging write: overwrite per run ("DeleteStagingOld" +
    * "ProcessDataToStaging" states, LandingAnalyticalStateMachine.json:5-39
    * — old staging data is purged before each load). */
  def writeStaging(df: DataFrame, path: String): Unit =
    df.select(Schemas.staging.fieldNames.toSeq.map(col): _*)
      .write.mode(SaveMode.Overwrite).option("header", "false").csv(path)

  def readStaging(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.staging).option("header", "false").csv(path)

  /** S8 + J3: append staging into the analytical ORC table. The
    * staging→analytical column mapping is POSITIONAL in the reference
    * (`INSERT INTO analytical SELECT * FROM staging`,
    * analytical-transform.py:25-26): staging `text` lands in analytical
    * `text_clean`. We keep the contract but make it visible — an explicit
    * positional rename, then a partitioned append. */
  def appendAnalytical(staged: DataFrame, path: String): Unit = {
    val renamed = staged.toDF(Schemas.analytical.fieldNames.toSeq: _*)
    renamed.write.mode(SaveMode.Append)
      .partitionBy("year", "month", "day")
      .orc(path)
  }

  def readAnalytical(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.analytical).orc(path)

  /** Lenient landing read for malformed drops: PERMISSIVE parsing routes
    * unparseable lines (wrong arity, type mismatches like a non-numeric
    * rt_count) into a `_corrupt_record` column instead of failing the
    * job — the engine-side analogue of the reference consumer's
    * per-record try/except (kinesis-consumer-s3.py's record loop). The
    * caller gets (clean rows, corrupt raw lines) and decides whether to
    * quarantine or fail on a threshold. The parsed frame is cached:
    * Spark refuses to filter on the corrupt column of an unmaterialized
    * lazy parse (internal-corrupt-record limitation), and the quarantine
    * split reads it twice anyway. Call `release()` once both frames are
    * consumed — the cache belongs to the shared parse, so unpersisting a
    * child frame would not free it, and a per-day pipeline that never
    * releases pins every day's parse for the session lifetime. */
  final case class LenientLanding(clean: DataFrame, corrupt: DataFrame,
                                  release: () => Unit)

  def readLandingLenient(spark: SparkSession, path: String): LenientLanding = {
    val withCorrupt = org.apache.spark.sql.types.StructType(
      Schemas.landing.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType))
    val raw = spark.read.schema(withCorrupt)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .cache()
    LenientLanding(
      raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.filter(col("_corrupt_record").isNotNull).select(col("_corrupt_record")),
      () => { raw.unpersist(); () })
  }

  /** Curated-corpus parquet sink with the three knobs that decide whether
    * a 100 TB table is readable afterwards:
    *  - `partitionCols`: coarse pruning dimensions (source, date, split);
    *  - `sortCols`: rows are sorted BEFORE the write, so each file covers
    *    a narrow range and parquet min/max row-group stats turn
    *    point/range reads into file skips (zone-map pruning);
    *  - `maxRecordsPerFile`: caps file size — a small-file-storm (or a
    *    10 GB monolith) is an operational failure at scale even when the
    *    data is correct.
    * With `cluster = true` (default) rows are first hash-clustered on
    * `partitionCols`: each partition value is written by ONE task, so a
    * partition directory holds a single sorted run of capped files with
    * globally non-overlapping ranges — without clustering, a 1000-task
    * input writing 50 partition values emits up to 50,000 files whose
    * ranges overlap across tasks. The clustering shuffle is the price; a
    * heavily skewed partition value serializes into one task, so pass
    * `cluster = false` (sort-within-existing-partitions only) when the
    * upstream layout is already partition-aligned or skew dominates.
    */
  def writeCurated(df: DataFrame, path: String, partitionCols: Seq[String],
                   sortCols: Seq[String], maxRecordsPerFile: Long,
                   cluster: Boolean = true): Unit = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    val placed = if (cluster && partitionCols.nonEmpty)
      df.repartition(partitionCols.map(col): _*)
    else df
    placed.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** S12: post-load refresh hook — the engine-side analogue of the
    * reference's BI dataset refresh (UpdateQuicksight state,
    * update-quicksight-dataset.py:21-56). In Spark the consumers that can
    * go stale after an append are cached plans and cached file listings
    * over the table path; `refreshByPath` invalidates both, so every
    * downstream reader re-lists and sees the new files. Synchronous, so
    * the reference's ingestion-status polling loop has no equivalent. */
  def refreshAnalytical(spark: SparkSession, path: String): Unit =
    spark.catalog.refreshByPath(path)

  /** S9: single-row audit append — a typed 1-row DataFrame, not
    * string-interpolated SQL (the reference's f-string INSERT at
    * update-data-log.py:19 is injection-prone; SURVEY.md §7.4). */
  def appendLog(spark: SparkSession, path: String, timeStamp: String,
                tableName: String, recordsInserted: Int,
                year: Int, month: Int, day: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val row = org.apache.spark.sql.Row(
      timeStamp, tableName, recordsInserted, year, month, day)
    spark.createDataFrame(Seq(row).asJava, Schemas.updateLog)
      .write.mode(SaveMode.Append)
      .partitionBy("year", "month", "day")
      .orc(path)
  }

  def readLog(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.updateLog).orc(path)
}
