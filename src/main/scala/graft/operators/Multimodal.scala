package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The decode step is a STUB (this environment ships no image/audio
  * codecs): [[FakeDecoder]] derives deterministic pseudo-features from the
  * bytes. Everything around it — the schema, the `Dataset[MediaRow]`
  * encoder, the per-partition batched iteration (the Scala analogue of
  * `mapInPandas`: one decoder instance per partition, streamed batches,
  * never a full-partition materialization) — is the real 100 TB design:
  * media blobs stay distributed, metadata travels in columns, and the
  * decoder is exchangeable for a JNI/codec implementation.
  */
object Multimodal {

  /** A media row: payload + typed metadata (the multimodal schema). */
  final case class MediaRow(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      content: Array[Byte],  // opaque payload
      width: Int,            // metadata the decoder would fill/verify
      height: Int)

  /** Extracted features per media row. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,      // md5 of the payload
      brightness: Double)    // stubbed: mean byte value / 255

  /** STUB decoder — deterministic fake standing in for a real codec. */
  object FakeDecoder {
    def features(row: MediaRow): MediaFeatures = {
      val bytes = row.content
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length / 255.0
      MediaFeatures(
        row.media_id, row.kind, bytes.length.toLong,
        java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString,
        mean)
    }
  }

  /** Build a deterministic media table from `documents` (text bytes stand
    * in for media payloads; ids/kinds/dims derived from doc_id).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"))

  /** Per-partition batched feature extraction (mapInPandas analogue):
    * one decoder per partition, rows streamed through it lazily.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would happen here (codec/JNI handle)
      rows.map(FakeDecoder.features)
    }
  }
}
