package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with typed metadata alongside. The Spark-side machinery — schema, batch
  * iteration shape (mapPartitions = the Scala analog of mapInPandas batches),
  * partition-parallel decode, metadata projection — is real and tested; the
  * actual codec is STUBBED deterministically because no image/audio library
  * ships in this container. Swap `decodeStub` for a real decoder and nothing
  * else changes.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int)

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * Stands in for e.g. an image header parse; same signature a real decoder
    * would have (bytes in, typed metadata out).
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val h = graft.sources.TranscriptGen.mix(if (n == 0) docId else n * 31 + bytes(0))
    val kind = (java.lang.Long.remainderUnsigned(h, 3L)).toInt match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      media_type = kind,
      width = if (kind == "audio") 0 else 64 + (n % 576).toInt,
      height = if (kind == "audio") 0 else 64 + ((n * 7) % 320).toInt,
      n_frames = if (kind == "video") 1 + (n % 240).toInt else if (kind == "image") 1 else 0,
      sample_rate = if (kind == "audio") 16000 else 0)
  }

  /** Attach a binary payload column (here: the utf-8 text bytes standing in
    * for real media) — the schema/write path any ingest job would use.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Batched partition-parallel decode — the mapInPandas-shaped stage. */
  def decodeMeta(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch => batch.map { case (id, bytes) => decodeStub(id, bytes) } }
  }

  /** Pure-column variant of the stub metadata (no UDF, codegen'd) used by the
    * SQL-verifiable query: byte length drives the fake dimensions.
    */
  def metaColumns(docs: DataFrame): DataFrame = {
    val n = length(col("text")).cast("long") // ascii corpus: bytes == chars
    docs.select(
      col("doc_id"),
      n.as("n_bytes"),
      (lit(64) + (n % 576)).cast("int").as("width"),
      (lit(64) + ((n * 7) % 320)).cast("int").as("height"))
  }
}
