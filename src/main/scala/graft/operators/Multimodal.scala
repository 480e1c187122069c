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

  /** STUB decoder for the fixture's fake codec. A real deployment swaps
    * this body for e.g. an ImageIO/JNI call; the signature, batching and
    * schema stay identical. */
  private def decodeOne(r: MediaRow): Decoded = {
    val p = r.payload
    require(p.length >= 4, s"payload too short for media ${r.media_id}")
    var sum = 0L
    var i = 4
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

  /** The oracle-checked query: decode every image payload from BYTES and
    * emit the features. The DuckDB oracle reads the independently stored
    * metadata columns — matching proves the byte-level decode. */
  def decodeImages(spark: SparkSession, path: String): DataFrame =
    decode(readMedia(spark, path))
      .filter(col("mime").startsWith("image/"))
      .toDF()
}
