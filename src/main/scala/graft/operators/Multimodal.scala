package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines.
  *
  * Media (image/audio/video) travels as an opaque `binary` payload column
  * plus a typed metadata struct — the schema pattern a 100 TB multimodal
  * corpus needs (payloads stay columnar/compressed in parquet; metadata
  * is filterable/prunable without touching bytes).
  *
  * The decode step is a clearly-marked STUB: no image/audio codec exists
  * in this container, so [[decodeFeatures]] "decodes" by folding the raw
  * bytes deterministically (byte statistics + stride "frame" sampling —
  * the access pattern of a real frame sampler). Everything AROUND the
  * stub is the real engineering and is tested: the binary+metadata
  * schema, the typed `Dataset` encoder boundary, the per-partition batch
  * iteration (`mapPartitions`, the Scala analog of a vectorized
  * batch-UDF), and the feature schema that comes back out.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String,
    width: Int, n_frames: Int)

  /** Stub-decoded features (deterministic byte statistics). */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, byte_sum: Long,
    head_hex: String, frame_sum: Long, n_sampled: Int)

  /** Wrap a text column as a media payload (UTF-8 bytes) with metadata —
    * the test-fixture producer; a real pipeline lands actual image/audio
    * bytes in the same shape.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("media_type"),
      length(col(textCol)).cast("int").as("width"),
      greatest(lit(1), (length(col(textCol)) / 16).cast("int")).as("n_frames"))

  /** STUB decode: per-partition batch iteration over payload bytes.
    *
    * A production build replaces the body of the per-row fold with a real
    * codec call (JPEG decode, PCM frame read, …) — `???` marker below.
    * The fake computes: total byte count, full byte sum, hex of the first
    * 8 bytes, and a stride-`frameStride` sampled byte sum (the
    * frame-sampling access pattern).
    */
  def decodeFeatures(ds: Dataset[MediaRow], frameStride: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // batch shape: one iterator per partition; a real decoder would
      // amortize codec init across the partition here.
      rows.map { r =>
        val b = r.payload
        // ??? real codec call goes here; deterministic byte-fold stub:
        var sum = 0L
        var i = 0
        while (i < b.length) { sum += b(i) & 0xff; i += 1 }
        var fsum = 0L
        var n = 0
        var j = 0
        while (j < b.length) { fsum += b(j) & 0xff; n += 1; j += frameStride }
        val head = b.take(8).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, b.length.toLong, sum, head, fsum, n)
      }
    }
  }
}
