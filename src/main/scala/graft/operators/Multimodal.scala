package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a feature-extraction stage.
  *
  * The decode kernel is a STUB (this container has no image/audio codecs) —
  * deterministic fake features derived from the bytes — but the Spark-side
  * plumbing is real and what matters at scale:
  *  - payloads stay in executor memory as byte arrays; nothing is collected;
  *  - extraction runs per-partition (`mapPartitions`) so a real decoder
  *    would amortize model/codec init once per partition, not per row;
  *  - output schema is fixed and columnar-friendly (no opaque blobs
  *    propagate past the extraction stage unless asked).
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Long, format: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      mean_intensity: Double)

  /** Wrap a string column as a binary payload frame (fixture adapter — real
    * inputs would already be binary: spark.read.format("binaryFile"), or a
    * bytes column in parquet). */
  def asBinaryPayload(df: DataFrame, idCol: String, dataCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      col(dataCol).cast("binary").as("payload"))

  /** Typed metadata without decoding: cheap, columnar, no UDF. */
  def payloadMeta(payloads: DataFrame): DataFrame =
    payloads.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      // magic-byte sniffing stand-in: first byte selects a pseudo-format
      when(substring(hex(col("payload")), 1, 2) < "40", "png")
        .when(substring(hex(col("payload")), 1, 2) < "80", "jpeg")
        .otherwise("bin").as("format"))

  /** Feature extraction via mapPartitions. `decode` is the stub kernel: a
    * real implementation swaps in an image decoder with the same signature —
    * the partitioning, batching, and schema do not change. */
  def extractFeatures(payloads: DataFrame): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here in a real decoder (codec, model)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Deterministic fake decode: dimensions and intensity derived from byte
    * stats. Replace with a real codec (??? in production terms) — marked
    * clearly as the stubbed stage. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xFF))
    MediaFeatures(
      doc_id = id,
      n_bytes = n.toLong,
      width = 16 + (math.abs(id) % 16).toInt,
      height = 16 + (n % 16),
      mean_intensity = if (n == 0) 0.0 else sum.toDouble / n / 255.0)
  }
}
