package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract stage of
  * a training-data pipeline.
  *
  * The Spark-side plumbing is real: a typed `Dataset` with a case-class
  * encoder, batch-at-a-time decode via `mapPartitions` (one decoder
  * instantiation per partition, the same shape a JNI image codec or an
  * Arrow-batched Python worker needs — per-partition setup cost is
  * amortized over the whole partition, and partitions stream: nothing is
  * collected). The codec itself is a STUB — real image/audio libraries are
  * not in this container — implemented as a deterministic parse of our
  * fixture's fake header (u16-BE width/height) + a byte checksum, so the
  * byte-level path is still exercised and oracle-verified against
  * independently stored metadata (tools/gen_media_fixture.py).
  *
  * At 100 TB: payloads dominate row size, so the scan must prune them when
  * a query touches only metadata (parquet column pruning gives this for
  * free — see MultimodalSpec's ReadSchema assertion) and decode stages must
  * repartition by byte volume, not row count, before heavy codecs.
  */
object Multimodal {

  /** Raw row shape of a media table: id + mime + opaque payload. */
  case class MediaRow(media_id: Long, mime: String, payload: Array[Byte])

  /** Decoded features (what a real codec would emit). */
  case class Decoded(media_id: Long, mime: String,
                     dec_width: Int, dec_height: Int,
                     dec_bytes: Long, dec_checksum: Long)

  private def u16be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** STUB decoder for the fixture's fake codec: dims header (4 bytes), plus
    * a 3-byte frame header on video payloads (see [[videoMeta]]) before the
    * checksummed body — the mime routes to the container layout, exactly as
    * a real codec registry would. A real deployment swaps this body for
    * e.g. an ImageIO/JNI call; the signature, batching and schema stay
    * identical. */
  private def decodeOne(r: MediaRow): Decoded = {
    val p = r.payload
    val bodyOff = if (r.mime.startsWith("video/")) 7 else 4
    require(p.length >= bodyOff, s"payload too short for media ${r.media_id}")
    var sum = 0L
    var i = bodyOff
    while (i < p.length) { sum += p(i) & 0xff; i += 1 }
    Decoded(r.media_id, r.mime, u16be(p, 0), u16be(p, 2), p.length.toLong, sum % 9973)
  }

  /** Batched decode: mapPartitions so decoder setup happens once per
    * partition and rows stream through without materializing. */
  def decode(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handle, JNI ctx)
      rows.map(decodeOne)
    }
  }

  /** Read a media parquet as the typed raw Dataset (payload + mime only —
    * the redundant metadata columns are pruned at the scan and reserved
    * for verification). */
  def readMedia(spark: SparkSession, path: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("media_id"), col("mime"), col("payload"))
      .as[MediaRow]
  }

  /** Rows of one mime family, filtered COLUMN-level BEFORE the typed
    * stage: a typed lambda filter would sit above DeserializeToObject and
    * the scan would read every payload; the Column predicate reaches the
    * parquet scan (PushedFilters: StringStartsWith on mime), so other
    * families' payload bytes are never materialized. */
  private def mediaOfFamily(spark: SparkSession, path: String, prefix: String): Dataset[MediaRow] =
    readMedia(spark, path).filter(col("mime").startsWith(prefix))

  /** The oracle-checked query: decode every image payload from BYTES and
    * emit the features. The DuckDB oracle reads the independently stored
    * metadata columns — matching proves the byte-level decode. */
  def decodeImages(spark: SparkSession, path: String): DataFrame =
    decode(mediaOfFamily(spark, path, "image/")).toDF()

  /** Parsed video header (what a container demuxer would emit). */
  case class VideoMeta(media_id: Long, n_frames: Int, fps: Int)

  /** STUB video-header parse: n_frames (u16 BE @4) + fps (u8 @6) from the
    * fixture codec's video layout. Same mapPartitions shape as [[decode]] —
    * a real demuxer (ffmpeg probe) slots into this body unchanged. */
  def videoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.filter(col("mime").startsWith("video/")).mapPartitions { rows =>
      rows.map { r =>
        require(r.payload.length >= 7, s"video payload too short for media ${r.media_id}")
        VideoMeta(r.media_id, u16be(r.payload, 4), r.payload(6) & 0xff)
      }
    }
  }

  /** Frame sampling: every `everyNth` frame of each video, with its
    * millisecond timestamp. Only the 7-byte header parse touches the stub
    * codec; the frame-index fan-out is a codegen'd generator
    * (`explode(sequence(...))`) — per row it emits n_frames/everyNth rows
    * with NO shuffle, which is exactly how a 100-TB video corpus feeds a
    * frame-extraction stage (the heavy per-frame decode would hang off
    * these (media_id, frame_idx) coordinates, repartitioned by byte
    * volume). Timestamps are integer math: ts_ms = frame_idx*1000 div fps. */
  def sampleFrames(spark: SparkSession, path: String, everyNth: Int): DataFrame =
    videoMeta(readMedia(spark, path)).toDF()
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))).as("frame_idx"),
        col("fps"))
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        expr("CAST((frame_idx * 1000) DIV fps AS BIGINT)").as("ts_ms"))

  /** Resize planning (the compute-free half of a thumbnail stage): decode
    * dimensions from BYTES, then emit the target geometry for a
    * `maxDim`-bounded thumbnail — scale = min(1, maxDim/max(w,h)), floor'd
    * target dims. The scale and dims are single IEEE ops on exact ints, so
    * the oracle (reading the redundant metadata) reproduces them
    * bit-for-bit. A real resize kernel consumes exactly these rows. */
  def thumbSpec(spark: SparkSession, path: String, maxDim: Int = 64): DataFrame =
    decode(mediaOfFamily(spark, path, "image/"))
      .select(col("media_id"), col("dec_width"), col("dec_height"),
        least(lit(1.0), lit(maxDim.toDouble) /
          greatest(col("dec_width"), col("dec_height"))).as("scale"))
      .select(col("media_id"),
        floor(col("dec_width") * col("scale")).cast("int").as("thumb_w"),
        floor(col("dec_height") * col("scale")).cast("int").as("thumb_h"),
        col("scale"))
}
