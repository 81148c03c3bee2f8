package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Tables are parquet, one file-set per scale factor directory
  * (`/root/testdata/sf0.001` etc.). At production scale these would be
  * partitioned tables on object storage; the loaders keep the call sites
  * identical (`Tables.lineitem(spark, dir)`), so swapping in a catalog
  * table or a partitioned path is a one-line change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has drifted across fixture generations: parquet
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — we read
    * nanos as long via the legacy flag and rebuild), then
    * TIMESTAMP_MICROS with isAdjustedToUTC=0 (which loads as
    * TIMESTAMP_NTZ). Rather than assume one encoding, branch on the
    * *loaded* dataType so any of the three shapes normalizes to a
    * session-local TimestampType `ts`:
    *   - LongType           → nanos-as-long fixture; rebuild via integer
    *                          DIV 1000 (not `/` — double division loses
    *                          precision above 2^53 ns)
    *   - TimestampNTZType   → micros fixture, naive; reinterpret as UTC
    *                          instants (session TZ is UTC, matching the
    *                          DuckDB oracle's naive-timestamp semantics)
    *   - TimestampType      → already an instant; pass through
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // Every entrypoint (Verify/Bench/tests) pins the session TZ to
        // UTC, so this cast maps each naive micros value to the
        // identical UTC instant.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as unexpected type $other — fixture drift; " +
            "extend Tables.events to normalize it")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
