package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SharedSpark {

  private val fixture = "/root/repo/fixtures/media.parquet"

  test("byte-level decode reproduces the independently stored metadata for every row") {
    val decoded = Multimodal.decode(Multimodal.readMedia(spark, fixture)).toDF()
    val stored = spark.read.parquet(fixture)
      .select(col("media_id"), col("width"), col("height"), col("n_bytes"), col("checksum"))
    val mismatches = decoded.join(stored, "media_id")
      .filter(col("dec_width") =!= col("width") || col("dec_height") =!= col("height") ||
        col("dec_bytes") =!= col("n_bytes") || col("dec_checksum") =!= col("checksum"))
      .count()
    assert(mismatches == 0)
    assert(decoded.count() == 60)
  }

  test("metadata-only queries prune the payload column at the parquet scan") {
    val plan = spark.read.parquet(fixture).select("media_id", "mime")
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse(plan)
    assert(!readSchema.contains("payload"),
      s"payload not pruned from scan:\n$readSchema")
  }

  test("decode streams through mapPartitions on the typed Dataset (no collect)") {
    val ds = Multimodal.decode(Multimodal.readMedia(spark, fixture))
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions") ||
      plan.contains("SerializeFromObject"), s"unexpected plan:\n$plan")
  }
}
