package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LongVectorMathSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (Seq(3L, -4L, 5L, 0L), Seq(2L, 7L, -1L, 9L), 1),
    (Seq.empty[Long], Seq.empty[Long], 2),
    (Seq(1048576L, -1048576L), Seq(1048576L, 1048576L), 3),
    (Seq(-1L, -2L, -3L), Seq(-4L, -5L, -6L), 4),
  ).toDF("a", "b", "id")

  test("LongDot matches the declarative zip_with/aggregate formulation") {
    val bad = rows.select(
      LongDot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("decl"))
      .filter(!(col("native") <=> col("decl"))).count()
    assert(bad == 0)
  }

  test("LongSqDist matches the declarative zip_with/aggregate formulation") {
    val bad = rows.select(
      LongSqDist(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v).as("decl"))
      .filter(!(col("native") <=> col("decl"))).count()
    assert(bad == 0)
  }

  test("null input yields null, null-safe like the binary contract") {
    val df = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]]))
      .toDF("a", "b")
    val r = df.select(LongDot(col("a"), col("b")).as("d"),
      LongSqDist(col("a"), col("b")).as("s")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
