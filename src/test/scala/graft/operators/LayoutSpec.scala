package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zOrderKey: known interleave on a uniform grid") {
    // 4x4 grid with bits=2: ranks equal the coordinates, so the z key is
    // the textbook Morton code
    val df = (for (x <- 0 until 4; y <- 0 until 4) yield (x, y))
      .toDF("x", "y")
    val got = Layout.withZOrderKey(df, Seq("x", "y"), bits = 2)
      .select("x", "y", "__z").as[(Int, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    def morton(x: Int, y: Int): Long =
      (0 until 2).map(b => (((x >> b) & 1) << (2 * b)) |
        (((y >> b) & 1) << (2 * b + 1))).sum.toLong
    for (x <- 0 until 4; y <- 0 until 4)
      assert(got((x, y)) === morton(x, y), s"($x,$y)")
  }

  test("z-ordered layout prunes a 2-D box query better than a single-column sort") {
    val root = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // 64x64 grid of points; files capped at 256 rows -> 16 files
    val df = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("x", "y")
    val zed = Layout.withZOrderKey(df, Seq("x", "y"), bits = 6)
    graft.zones.Zones.writeCurated(zed, s"$root/z", Nil,
      Seq("__z"), maxRecordsPerFile = 256L)
    graft.zones.Zones.writeCurated(df, s"$root/x", Nil,
      Seq("x", "y"), maxRecordsPerFile = 256L)

    // files whose (min,max) box overlaps the query box must be read;
    // count them from the actual written files
    def filesTouched(path: String, qx: (Int, Int), qy: (Int, Int)): Int = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .as[(String, Int, Int, Int, Int)].collect()
      perFile.count { case (_, x0, x1, y0, y1) =>
        x1 >= qx._1 && x0 <= qx._2 && y1 >= qy._1 && y0 <= qy._2 }
    }
    // a y-thin, full-width slab: the lexicographic (x, y) sort puts the
    // whole y range into EVERY file, so it must read all of them; the
    // z-order layout confines y to two tile rows
    val zSlab = filesTouched(s"$root/z", (0, 63), (28, 35))
    val xSlab = filesTouched(s"$root/x", (0, 63), (28, 35))
    assert(xSlab == 16, s"x-sort should touch every file for a y-slab: $xSlab")
    assert(zSlab < xSlab && zSlab <= 8,
      s"z-order touched $zSlab files vs $xSlab for the y-slab")
    // a tile-aligned small box: one z tile vs two x slabs
    val zBox = filesTouched(s"$root/z", (24, 31), (24, 31))
    val xBox = filesTouched(s"$root/x", (24, 31), (24, 31))
    assert(zBox < xBox, s"z-order touched $zBox files vs $xBox for the box")
  }

  test("zOrderKey refuses non-numeric columns and ranks an all-null dimension 0") {
    val bad = Seq((1L, "a"), (2L, "b")).toDF("x", "s")
    val e = intercept[IllegalArgumentException] {
      Layout.withZOrderKey(bad, Seq("x", "s"), bits = 2)
    }
    assert(e.getMessage.contains("must be numeric"))
    // all-null column: approx_percentile returns SQL NULL cuts; every row
    // ranks 0 in that dimension instead of NPEing
    val nulls = Seq((0L, Option.empty[Double]), (1L, Option.empty[Double]),
      (2L, Option.empty[Double]), (3L, Option.empty[Double]))
      .toDF("x", "y")
    val z = Layout.withZOrderKey(nulls, Seq("x", "y"), bits = 2)
      .select("x", "__z").as[(Long, Long)].collect().toMap
    // y contributes nothing: z = interleave(rank(x), 0) — monotone in x
    assert(z.toSeq.sortBy(_._1).map(_._2) == z.values.toSeq.sorted)
  }

  /** Serial xy2d (the published recurrence) for cross-checking. */
  private def xy2d(bits: Int, x0: Int, y0: Int): Long = {
    val n = 1 << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  private def hilbertGrid(bits: Int): Map[(Int, Int), Long] = {
    val n = 1 << bits
    val df = (for (x <- 0 until n; y <- 0 until n) yield (x, y))
      .toDF("x", "y")
    df.select(col("x"), col("y"),
        Layout.hilbertIndex(col("x").cast("long"), col("y").cast("long"),
          bits).as("h"))
      .as[(Int, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
  }

  test("hilbertIndex matches the serial xy2d recurrence and is a bijection") {
    for (bits <- Seq(2, 3, 4)) {
      val n = 1 << bits
      val got = hilbertGrid(bits)
      for (x <- 0 until n; y <- 0 until n)
        assert(got((x, y)) == xy2d(bits, x, y), s"bits=$bits ($x,$y)")
      assert(got.values.toSet == (0L until n.toLong * n).toSet,
        s"bits=$bits: keys must cover 0..n²−1 exactly once")
    }
  }

  test("consecutive Hilbert keys are ADJACENT cells; Morton provably is not") {
    // the locality property that distinguishes the two curves: walking
    // the Hilbert key order moves one grid step at a time, while the
    // Morton order takes diagonal jumps at power-of-two boundaries
    val bits = 4
    val inv = hilbertGrid(bits).map(_.swap)
    val steps = (0L until (1L << (2 * bits)) - 1).map { d =>
      val (x0, y0) = inv(d); val (x1, y1) = inv(d + 1)
      math.abs(x0 - x1) + math.abs(y0 - y1)
    }
    assert(steps.forall(_ == 1), "every Hilbert step must be distance 1")
    def morton(x: Int, y: Int): Long =
      (0 until bits).map(b => (((x >> b) & 1) << (2 * b)) |
        (((y >> b) & 1) << (2 * b + 1))).sum.toLong
    val minv = (for (x <- 0 until 16; y <- 0 until 16)
      yield morton(x, y) -> ((x, y))).toMap
    val mSteps = (0L until 255L).map { d =>
      val (x0, y0) = minv(d); val (x1, y1) = minv(d + 1)
      math.abs(x0 - x1) + math.abs(y0 - y1)
    }
    assert(mSteps.exists(_ > 1), "Morton must take non-adjacent jumps")
  }

  test("hilbertKeyFromCuts ranks against cuts then applies the curve") {
    // cuts at 10/20/30 → ranks 0..3; key must equal hilbertIndex of the
    // ranks (2-bit grid)
    val df = Seq((5.0, 35.0), (15.0, 25.0), (25.0, 15.0), (35.0, 5.0))
      .toDF("a", "b")
    val cuts = Seq(10.0, 20.0, 30.0)
    val got = Layout.hilbertKeyFromCuts(df, "a" -> cuts, "b" -> cuts,
        bits = 2, hCol = "h")
      .select("a", "b", "h").as[(Double, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((5.0, 35.0)) == xy2d(2, 0, 3))
    assert(got((15.0, 25.0)) == xy2d(2, 1, 2))
    assert(got((25.0, 15.0)) == xy2d(2, 2, 1))
    assert(got((35.0, 5.0)) == xy2d(2, 3, 0))
  }
}
