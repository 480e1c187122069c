package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** The idempotent parquet sinks (S5/S6/S7): swap-commit overwrite, append,
  * keyed upsert — rerunning a week must be a no-op on keyed tables. */
class SinksSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def tmpDir = Files.createTempDirectory("graft-sinks").toString

  test("overwriteSwap replaces the table atomically and leaves no temp dir") {
    val path = s"$tmpDir/t"
    Sinks.overwriteSwap(Seq((1, "a")).toDF("k", "v"), path)
    Sinks.overwriteSwap(Seq((2, "b"), (3, "c")).toDF("k", "v"), path)
    assert(spark.read.parquet(path).count() == 2)
    assert(!new java.io.File(path + ".__tmp").exists())
  }

  test("append grows the table") {
    val path = s"$tmpDir/t"
    Sinks.append(Seq((1, "a")).toDF("k", "v"), path)
    Sinks.append(Seq((2, "b")).toDF("k", "v"), path)
    assert(spark.read.parquet(path).count() == 2)
  }

  test("upsert: first write creates, rerun of the SAME batch is a no-op (idempotence)") {
    val path = s"$tmpDir/t"
    val week1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    Sinks.upsert(spark, path, week1, Seq("k"))
    val first = spark.read.parquet(path).sort("k").as[(Int, String)].collect().toSeq
    Sinks.upsert(spark, path, week1, Seq("k")) // rerun the same week
    val second = spark.read.parquet(path).sort("k").as[(Int, String)].collect().toSeq
    assert(first == second && first == Seq((1, "a"), (2, "b")))
  }

  test("upsert: a later batch updates collisions and adds new keys; keys stay unique") {
    val path = s"$tmpDir/t"
    Sinks.upsert(spark, path, Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    Sinks.upsert(spark, path, Seq((2, "B"), (3, "C")).toDF("k", "v"), Seq("k"))
    val rows = spark.read.parquet(path).sort("k").as[(Int, String)].collect().toSeq
    assert(rows == Seq((1, "a"), (2, "B"), (3, "C")))
    val t = spark.read.parquet(path)
    assert(t.groupBy("k").count().filter(col("count") > 1).count() == 0)
  }
}
