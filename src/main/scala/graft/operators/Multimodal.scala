package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed per-partition.
  *
  * The Spark-side shape is the real thing — binary column + metadata
  * struct in the schema, batched per-partition processing via
  * `mapPartitions` on a typed Dataset (the Scala analogue of a
  * batched/Arrow UDF), output schema declared by case class encoder.
  * The decode kernel itself is a STUB (this container has no image/
  * audio codecs): [[MediaDecode.decodeStub]] derives deterministic fake
  * dimensions from the byte stream. Swapping in a real decoder changes
  * only that function — partitioning, schema, and batch shape stay.
  *
  * At scale: payloads never shuffle (all derivation is map-side), and
  * metadata-only queries prune the binary column at the parquet scan.
  */
object Multimodal {

  /** Typed metadata emitted by the (stubbed) decoder. */
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  object MediaDecode {

    /** STUB — stands in for a real image/audio decode (no codec libs in
      * this environment). Deterministic in the payload bytes only, so
      * the oracle can mirror it arithmetically.
      */
    def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      MediaMeta(docId, n, 64 + n % 577, 64 + (n * 31) % 417, 1 + n % 7)
    }
  }

  /** Attach a binary payload column (here: utf-8 bytes of a text
    * column; in production: the raw media bytes) plus a metadata
    * struct.
    */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      struct(col("source"), col("lang")).as("meta")
    )

  /** Per-partition decode: binary in, typed metadata out. */
  def decodeMetadata(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => MediaDecode.decodeStub(id, bytes) })
  }

  /** One row per sampled frame (generator/UDTF shape): frame index plus
    * its byte offset into the payload — the row-explosion pattern a
    * real frame sampler produces, with the decode itself stubbed (frame
    * count comes from [[MediaDecode.decodeStub]]). Offsets are integer
    * arithmetic on payload size, so the oracle mirrors them exactly.
    */
  def sampleFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeMetadata(media)
      .flatMap { m =>
        val stride = m.n_bytes / m.n_frames
        (0 until m.n_frames).map(i => (m.doc_id, i, i * stride, m.width, m.height))
      }
      .toDF("doc_id", "frame_idx", "byte_offset", "width", "height")
  }
}
