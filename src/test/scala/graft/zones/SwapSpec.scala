package graft.zones

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two full-table swap primitives: [[Zones.replaceAtomically]] for
  * DERIVED tables (band tables — rebuildable from the source of truth)
  * and [[Zones.replaceKeepingBackup]] + [[Zones.recoverBackup]] for
  * SOURCE-OF-TRUTH tables (signature/vector tables), where no instant may
  * exist with zero copies on disk. The crash windows are simulated by
  * hand-arranging the on-disk states each window leaves behind. */
class SwapSpec extends SparkSpec {

  private def writeN(path: String, n: Int): Unit =
    spark.range(n.toLong).write.mode("overwrite").parquet(path)

  private def rows(path: String): Long = spark.read.parquet(path).count()

  private def exists(p: String): Boolean = new java.io.File(p).exists()

  test("replaceKeepingBackup: swaps contents; leaves no __old or __compacting behind") {
    val root = java.nio.file.Files.createTempDirectory("graft-swap").toString
    val path = s"$root/t"
    writeN(path, 10)
    Zones.replaceKeepingBackup(spark, path) { tmp => writeN(tmp, 25) }
    assert(rows(path) === 25)
    assert(!exists(path + "__old"), "backup not cleaned up")
    assert(!exists(path + "__compacting"), "temp dir not cleaned up")
  }

  test("replaceKeepingBackup: bootstrap (no current table) installs the new one") {
    val root = java.nio.file.Files.createTempDirectory("graft-swap").toString
    val path = s"$root/t"
    Zones.replaceKeepingBackup(spark, path) { tmp => writeN(tmp, 7) }
    assert(rows(path) === 7)
  }

  test("recoverBackup: mid-swap crash (path missing, __old present) restores the backup") {
    val root = java.nio.file.Files.createTempDirectory("graft-swap").toString
    val path = s"$root/t"
    // the state left by dying between rename(path -> __old) and
    // rename(tmp -> path): old data at __old, new data still at tmp
    writeN(path + "__old", 10)
    writeN(path + "__compacting", 25)
    Zones.recoverBackup(spark, path)
    assert(rows(path) === 10, "backup must be restored as the table")
    assert(!exists(path + "__old"))
    assert(!exists(path + "__compacting"), "half-swapped tmp must be dropped")
  }

  test("recoverBackup: post-swap crash (both present) keeps the new table, drops the backup") {
    val root = java.nio.file.Files.createTempDirectory("graft-swap").toString
    val path = s"$root/t"
    // the state left by dying between rename(tmp -> path) and delete(__old)
    writeN(path, 25)
    writeN(path + "__old", 10)
    Zones.recoverBackup(spark, path)
    assert(rows(path) === 25, "completed swap must win")
    assert(!exists(path + "__old"))
  }

  test("recoverBackup: no-op when no backup exists") {
    val root = java.nio.file.Files.createTempDirectory("graft-swap").toString
    val path = s"$root/t"
    writeN(path, 5)
    Zones.recoverBackup(spark, path)
    assert(rows(path) === 5)
  }

  test("replaceKeepingBackup: at every step at least one complete copy of the data exists") {
    val root = java.nio.file.Files.createTempDirectory("graft-swap").toString
    val path = s"$root/t"
    writeN(path, 10)
    // during write (the longest window) the current table is untouched
    Zones.replaceKeepingBackup(spark, path) { tmp =>
      assert(rows(path) === 10, "current table must survive the tmp write")
      writeN(tmp, 25)
      assert(rows(path) === 10, "current table must survive until the swap")
    }
    assert(rows(path) === 25)
  }

  test("replaceAtomically: still swaps derived tables and cleans its temp dir") {
    val root = java.nio.file.Files.createTempDirectory("graft-swap").toString
    val path = s"$root/t"
    writeN(path, 10)
    Zones.replaceAtomically(spark, path) { tmp => writeN(tmp, 30) }
    assert(rows(path) === 30)
    assert(!exists(path + "__compacting"))
  }
}
