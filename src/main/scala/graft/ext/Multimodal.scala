package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media document: opaque bytes + typed metadata. The engine never
  * interprets `media` — image/audio/video stay a binary column until a
  * decoder runs, exactly like a 100 TB lakehouse media table.
  */
case class MediaRow(media_id: Long, media: Array[Byte], format: String,
                    width: Int, height: Int)

/** Decoder output: per-item feature record. */
case class MediaFeatures(media_id: Long, format: String, width: Int,
                         height: Int, n_bytes: Long, byte_sum: Long,
                         byte_mean: Double, first_byte: Int, last_byte: Int,
                         aspect: Double)

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` + typed metadata struct, with decode / feature-extract as a
  * BATCHED per-partition transform — the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage (iterator of batches in, iterator of batches
  * out, partitioning preserved, no shuffle).
  *
  * The decoder is pluggable. THIS CONTAINER HAS NO IMAGE/AUDIO CODECS,
  * so `StubDecoder` is a clearly-marked deterministic fake (byte-level
  * statistics standing in for pixel/sample features); a real deployment
  * swaps in a codec-backed MediaDecoder and every Spark-side piece —
  * schema, typed Dataset boundary, batch shape, narrow (shuffle-free)
  * execution — is unchanged. Batching matters for real decoders: codec
  * init and buffer reuse amortize across a batch, exactly the reason
  * mapInPandas feeds Arrow batches rather than single rows.
  */
object Multimodal {

  /** Pluggable decode + feature-extract contract. Implementations must
    * be deterministic per (bytes, metadata) for reproducible pipelines.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** STUB — deterministic fake decode (no codecs in this environment):
    * byte-level statistics stand in for decoded pixel/sample features.
    * Unsigned byte arithmetic in plain Scala — this is the genuinely
    * imperative per-partition path where mapPartitions is the right
    * tool (SURVEY.md §2.11: everything else stays Column expressions).
    */
  object StubDecoder extends MediaDecoder {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val bytes = r.media
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        MediaFeatures(r.media_id, r.format, r.width, r.height,
          n_bytes = bytes.length.toLong,
          byte_sum = sum,
          byte_mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
          first_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
          last_byte = if (bytes.isEmpty) -1 else bytes(bytes.length - 1) & 0xff,
          aspect = r.width.toDouble / r.height)
      }
  }

  /** Deterministic media table synthesized from the documents corpus
    * (the container ships no real media): text bytes become the opaque
    * payload, metadata derived arithmetically from the id. Schema is
    * the real thing — downstream code sees (binary, string, int, int).
    */
  def mediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("media"), // UTF-8 bytes
      element_at(array(lit("png"), lit("wav"), lit("mp4")),
        (col(idCol) % 3).cast("int") + 1).as("format"),
      ((col(idCol) % 8 + 1) * 64).cast("int").as("width"),
      ((col(idCol) % 5 + 1) * 48).cast("int").as("height"))

  /** Batched per-partition decode: iterator-of-batches in/out, narrow
    * (no shuffle, upstream partitioning preserved), constant memory —
    * only `batchSize` items are materialized at once, so a 100 TB media
    * scan streams through executors regardless of file sizes.
    */
  def featurize(media: DataFrame, decoder: MediaDecoder = StubDecoder,
                batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decoder.decodeBatch(b))
    }
  }
}
