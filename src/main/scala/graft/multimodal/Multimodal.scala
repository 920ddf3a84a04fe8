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

  /** Frame sampling: each payload fans out into every-`everyNth`
    * fixed-width frame (STUB frame = a `frameChars`-character window of
    * the decoded payload; a real codec would seek keyframes). The
    * plumbing is the real thing a video pipeline needs — per-row
    * fan-out with frame offsets, widths, and a per-frame fingerprint —
    * and it is completely narrow: the ~len/(frameChars·everyNth)
    * expansion streams through the scan stage, no shuffle, no state.
    * Frame count is ⌈len/frameChars⌉ (min 1), so a whole-multiple
    * payload carries NO empty tail frame and an empty payload still
    * surfaces as one (empty) frame rather than a silent drop —
    * empty-string fingerprints differ across engines
    * (fold-over-nothing vs unicode('') = −1), so empty frames exist
    * only on empty payloads, where the oracle pins the value.
    */
  def sampleFrames(media: DataFrame, frameChars: Int = 256,
      everyNth: Int = 2): DataFrame = {
    require(frameChars >= 1 && everyNth >= 1)
    media
      .select(col("media_id"), col("kind"),
        col("payload").cast("string").as("s"))
      .withColumn("n_frames",
        greatest(ceil(length(col("s")) / lit(frameChars.toDouble))
          .cast("long"), lit(1L)))
      .select(col("media_id"), col("kind"),
        posexplode(transform(
          sequence(lit(0L), col("n_frames") - 1, lit(everyNth.toLong)),
          i => struct(
            (i * frameChars).as("off"),
            col("s").substr((i * frameChars + 1).cast("int"),
              lit(frameChars)).as("frame")))))
      .select(col("media_id"), col("kind"),
        col("pos").cast("long").as("sample_id"),
        col("col.off").as("offset_chars"),
        length(col("col.frame")).cast("long").as("n_chars"),
        graft.plans.RollingHash.rolling_hash(col("col.frame"))
          .as("frame_fp"))
  }

  /** Resize stub: deterministic 1/`factor` downsample (every
    * factor-th character of the decoded payload; a real codec would
    * box-filter pixels). Emits original/resized sizes and the resized
    * payload's fingerprint — the audit columns an image-thumbnail
    * stage publishes. Narrow, row-local, zero shuffle; swapping the
    * stub for a real resampler changes no plumbing.
    */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1)
    val s = col("payload").cast("string")
    media
      .select(col("media_id"), col("kind"), s.as("s"))
      .withColumn("resized",
        array_join(filter(split(col("s"), ""),
          (_, i) => i % factor === 0), ""))
      .select(col("media_id"), col("kind"),
        length(col("s")).cast("long").as("orig_chars"),
        length(col("resized")).cast("long").as("resized_chars"),
        graft.plans.RollingHash.rolling_hash(col("resized"))
          .as("resized_fp"))
  }
}
