package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift tripwire (VERDICT r6 #2).
  *
  * The driver regenerates `/root/testdata` between rounds and has twice
  * changed a column's physical encoding under us (round 4: q74 dtype;
  * round 6: events.ts TIMESTAMP(NANOS) → TIMESTAMP_MICROS, which turned 15
  * green queries dark because the loader assumed the nanos encoding).
  * This suite loads every table at sf0.001 through the `Tables` loaders and
  * asserts the POST-LOAD Spark schema — names, order, and types — so a
  * driver-side regeneration that shifts any column breaks loudly in
  * `sbt test` with a message naming the drifted column, instead of
  * silently in the round's correctness report.
  *
  * The contract is on the post-load (normalized) schema on purpose: the
  * loaders are allowed to adapt to encoding drift (Tables.events branches
  * on the loaded dataType), but what the 100+ queries see must stay fixed.
  */
class FixtureContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // Post-load contract. Timestamp columns may arrive as TIMESTAMP_NTZ
  // (isAdjustedToUTC=false) or TIMESTAMP depending on fixture generation;
  // both compare equal to the DuckDB oracle under the pinned UTC session
  // TZ, so either is accepted where marked.
  private val tsLike: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private def contract: Map[String, Seq[(String, Either[DataType, Set[DataType]])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Left(IntegerType), "r_name" -> Left(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Left(IntegerType), "n_name" -> Left(StringType),
      "n_regionkey" -> Left(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Left(LongType), "c_name" -> Left(StringType),
      "c_nationkey" -> Left(IntegerType), "c_acctbal" -> Left(DoubleType),
      "c_mktsegment" -> Left(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Left(LongType), "s_name" -> Left(StringType),
      "s_nationkey" -> Left(IntegerType), "s_acctbal" -> Left(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Left(LongType), "p_name" -> Left(StringType),
      "p_brand" -> Left(StringType), "p_type" -> Left(StringType),
      "p_size" -> Left(IntegerType), "p_retailprice" -> Left(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Left(LongType), "o_custkey" -> Left(LongType),
      "o_orderstatus" -> Left(StringType), "o_totalprice" -> Left(DoubleType),
      "o_orderdate" -> Right(tsLike), "o_orderpriority" -> Left(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Left(LongType), "l_partkey" -> Left(LongType),
      "l_suppkey" -> Left(LongType), "l_linenumber" -> Left(IntegerType),
      "l_quantity" -> Left(DoubleType), "l_extendedprice" -> Left(DoubleType),
      "l_discount" -> Left(DoubleType), "l_tax" -> Left(DoubleType),
      "l_returnflag" -> Left(StringType), "l_linestatus" -> Left(StringType),
      "l_shipdate" -> Right(tsLike)),
    // events.ts must be exactly TimestampType post-load: the loader's whole
    // job is normalizing whatever encoding the fixture uses (nanos-as-long,
    // NTZ micros, instant micros) to one type the 15 events-family queries
    // and the streaming watermark paths can rely on.
    "events" -> Seq(
      "event_id" -> Left(LongType), "ts" -> Left(TimestampType),
      "user_id" -> Left(LongType), "event_type" -> Left(StringType),
      "value" -> Left(DoubleType), "props" -> Left(StringType)),
    "documents" -> Seq(
      "doc_id" -> Left(LongType), "text" -> Left(StringType),
      "lang" -> Left(StringType), "source" -> Left(StringType),
      "n_chars" -> Left(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Left(LongType),
      "embedding" -> Left(ArrayType(FloatType, containsNull = true)),
      "label" -> Left(IntegerType)))

  private def loaderFor(name: String) = name match {
    case "region" => Tables.region _
    case "nation" => Tables.nation _
    case "customer" => Tables.customer _
    case "supplier" => Tables.supplier _
    case "part" => Tables.part _
    case "orders" => Tables.orders _
    case "lineitem" => Tables.lineitem _
    case "events" => Tables.events _
    case "documents" => Tables.documents _
    case "embeddings" => Tables.embeddings _
  }

  for (name <- Tables.names) {
    test(s"fixture contract: $name post-load schema") {
      val df = loaderFor(name)(spark, sfDir)
      val expected = contract(name)
      val actual = df.schema.fields.toSeq
      assert(actual.map(_.name) == expected.map(_._1),
        s"$name column names/order drifted: fixture regeneration? " +
          s"expected ${expected.map(_._1).mkString(",")} " +
          s"got ${actual.map(_.name).mkString(",")}")
      for (((colName, want), field) <- expected.zip(actual)) {
        val ok = want match {
          case Left(dt) => field.dataType == dt
          case Right(alts) => alts.contains(field.dataType)
        }
        assert(ok,
          s"$name.$colName drifted to ${field.dataType} " +
            s"(wanted ${want.fold(_.toString, _.mkString(" or "))}) — " +
            "driver regenerated fixtures with a new encoding; adapt the " +
            "Tables loader, not the queries")
      }
      assert(df.count() > 0, s"$name is empty at sf0.001")
    }
  }

  // Branch-logic proof for Tables.events (VERDICT r6 #2 asks to show the
  // adaptive loader would have caught/handled this round's NANOS→MICROS
  // drift): synthesize all three fixture generations under temp dirs and
  // assert each normalizes to the same instants.
  test("Tables.events normalizes nanos-as-long, NTZ-micros, and instant-micros fixtures identically") {
    import spark.implicits._
    val micros = Seq(0L, 1723500000000000L, 1723500000123456L) // distinct instants
    def tmp(tag: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_evfix_$tag")
      d.toFile.deleteOnExit(); d.toString
    }

    // Generation 1: ts as plain int64 nanoseconds (what the legacy
    // nanosAsLong flag yields for parquet TIMESTAMP(NANOS)).
    val nanosDir = tmp("nanos")
    micros.map(m => (1L, m * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    // Generation 2 (current fixtures): TIMESTAMP_MICROS isAdjustedToUTC=0.
    val ntzDir = tmp("ntz")
    micros.map(m => (1L, m)).toDF("event_id", "us")
      .select($"event_id",
        timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    // Generation 3: instant micros (isAdjustedToUTC=1).
    val ltzDir = tmp("ltz")
    micros.map(m => (1L, m)).toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").as("ts"))
      .write.mode("overwrite").parquet(s"$ltzDir/events.parquet")

    val loaded = Seq(nanosDir, ntzDir, ltzDir).map { d =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType,
        s"events loader from $d did not normalize ts to TimestampType")
      df.select(unix_micros($"ts")).as[Long].collect().sorted.toSeq
    }
    assert(loaded.distinct.size == 1,
      s"the three fixture generations decoded to different instants: $loaded")
    assert(loaded.head == micros.sorted)
  }
}
