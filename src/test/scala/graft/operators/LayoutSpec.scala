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
}
