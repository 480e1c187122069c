package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order layout: interleave correctness, lossless rewrite, and the
  * pruning geometry — written files must be compact rectangles in (x, y),
  * which a single-key sort provably is not. */
class ZOrderSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def tmpDir = Files.createTempDirectory("graft-zorder").toString

  // full 64x64 grid, one row per cell
  private def grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
    (x.toLong, y.toLong, x * 64L + y))).toDF("x", "y", "id")

  test("zValue interleaves bits (hand-computed values)") {
    // z(3,5): x=b011 -> bits 0,2; y=b101 -> bits 1,5 => 1+4+2+32 = 39
    val z = Seq((1L, 0L), (0L, 1L), (3L, 5L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 8).as("z"))
      .as[Long].collect().toSeq
    assert(z == Seq(1L, 2L, 39L))
  }

  test("writeZOrdered preserves every row exactly") {
    val path = s"$tmpDir/z"
    ZOrder.writeZOrdered(grid, path, "x", "y", numFiles = 16, bits = 6)
    val back = spark.read.parquet(path)
    assert(back.count() == 4096)
    assert(back.exceptAll(grid).isEmpty && grid.exceptAll(back).isEmpty)
    assert(!new java.io.File(path + ".__tmp").exists())
  }

  test("a y-band query prunes z-ordered files; an x-sorted layout reads every file") {
    val d = tmpDir
    val zPath = s"$d/z"
    val xPath = s"$d/xsort"
    ZOrder.writeZOrdered(grid, zPath, "x", "y", numFiles = 16, bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(xPath)
    // the fraction of files whose footer [min(y), max(y)] intersects the
    // band y in [8, 11] — what parquet stats-based skipping consults
    def overlapFrac(path: String): Double = {
      val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length > 8, s"expected many files at $path")
      val hit = files.count { f =>
        val mm = spark.read.parquet(f.toString).agg(min("y"), max("y")).head()
        mm.getLong(0) <= 11 && 8 <= mm.getLong(1)
      }
      hit.toDouble / files.length
    }
    assert(overlapFrac(xPath) == 1.0, "x-sorted files each span the full y range")
    assert(overlapFrac(zPath) <= 0.5, "z-ordered files must be y-compact rectangles")
  }

  test("skewed duplicates and nulls survive the rewrite") {
    val skewed = (0 until 500).map(_ => (7L, 7L, 1L)).toDF("x", "y", "id")
      .unionByName(Seq[(Option[Long], Option[Long], Long)]((Some(1L), None, 2L))
        .toDF("x", "y", "id"))
    val path = s"$tmpDir/skew"
    ZOrder.writeZOrdered(skewed, path, "x", "y", numFiles = 4, bits = 4)
    val back = spark.read.parquet(path)
    assert(back.count() == 501)
    assert(back.filter(col("y").isNull).count() == 1)
  }
}
