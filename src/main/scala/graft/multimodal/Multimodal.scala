package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary payloads with
  * typed metadata, decoded/feature-extracted in batched partition-local
  * loops (the Scala analog of mapInPandas — batch shape, schema, and
  * partitioning are real; the codec itself is a STUB, since no
  * image/audio libraries ship in this environment). Swapping
  * `decodeStub` for a real codec changes no plumbing.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, kind: String,
      payload: Array[Byte])

  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Long, header_byte: Long, checksum: Long, n_frames: Long)

  /** Deterministic media table synthesized from documents: the payload is
    * the UTF-8 text bytes standing in for image/audio/video blobs.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** STUB codec: deterministic header/checksum/frame arithmetic on the
    * raw bytes. A real implementation would decode image dimensions /
    * audio duration / sampled video frames here.
    */
  private def decodeStub(m: MediaRecord): MediaFeatures = {
    // decode BEFORE slicing: payload.take(16) would cut a multi-byte
    // UTF-8 sequence mid-codepoint and diverge from the oracle's
    // character-based substr/unicode on non-ASCII text
    val s = new String(m.payload, "UTF-8")
    val header = if (s.nonEmpty) s.codePointAt(0).toLong else -1L
    MediaFeatures(
      media_id = m.media_id,
      kind = m.kind,
      n_bytes = m.payload.length.toLong,
      header_byte = header,
      checksum = graft.plans.RollingHash.hash(s.take(16)),
      n_frames = m.payload.length / 256 + 1)
  }

  /** Batched partition-local decode — the mapInPandas-shaped hot loop:
    * fixed-size batches per partition, no shuffle, schema declared by
    * the output case class encoder.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map(decodeStub)))
      .toDF()
  }
}
