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

  test("mime-family filter is pushed to the parquet scan, below the typed decode") {
    val plan = Multimodal.decodeImages(spark, fixture).queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("StringStartsWith(mime,image/"),
      s"mime filter not pushed to scan:\n$plan")
  }

  test("frame sampling emits every 5th frame with integer ms timestamps") {
    val out = Multimodal.sampleFrames(spark, fixture, everyNth = 5)
    val rows = out.collect()
    // 15 video rows; each contributes ceil(n_frames/5) frames
    val meta = spark.read.parquet(fixture)
      .filter(col("mime").startsWith("video/"))
      .select("media_id", "n_frames", "fps")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(rows.length == meta.map { case (_, nf, _) => (nf + 4) / 5 }.sum)
    val byId = rows.groupBy(_.getLong(0))
    meta.foreach { case (id, nf, fps) =>
      val frames = byId(id).map(_.getInt(1)).sorted
      assert(frames.head == 0 && frames.last == ((nf - 1) / 5) * 5)
      assert(frames.forall(_ % 5 == 0))
      val ts = byId(id).find(_.getInt(1) == 5).map(_.getLong(2))
      assert(ts.forall(_ == 5000L / fps))
    }
  }

  test("decode streams through mapPartitions on the typed Dataset (no collect)") {
    val ds = Multimodal.decode(Multimodal.readMedia(spark, fixture))
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions") ||
      plan.contains("SerializeFromObject"), s"unexpected plan:\n$plan")
  }
}
