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

  /** Typed view of a payload frame — the one adapter all kernels share. */
  private def typedPayloads(df: DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
  }

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
    typedPayloads(payloads)
      .mapPartitions { it =>
        // per-partition init happens here in a real decoder (codec, model)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  case class ResizedMedia(doc_id: Long, width: Int, height: Int, payload: Array[Byte])
  case class FrameSample(doc_id: Long, frame_idx: Int, ts_ms: Long, payload: Array[Byte])

  /** Resize plumbing: per-partition kernel with the real codec's signature
    * (bytes -> bytes at target dims). STUB: emits a deterministic
    * target-sized payload derived from the source bytes; a real
    * implementation swaps `resizeKernel` only. */
  def resize(payloads: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0 &&
      targetW.toLong * targetH <= Int.MaxValue,
      s"invalid target dimensions ${targetW}x$targetH")
    val spark = payloads.sparkSession
    import spark.implicits._
    typedPayloads(payloads)
      .mapPartitions(_.map { case (id, bytes) =>
        ResizedMedia(id, targetW, targetH, resizeKernel(bytes, targetW, targetH))
      })
  }

  /** STUB resize kernel: samples the source bytes onto a targetW*targetH
    * grid (nearest-neighbor over the byte stream) — deterministic, byte
    * count = target area, so downstream sizing logic is exercised for real. */
  private def resizeKernel(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = bytes((i.toLong * bytes.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  /** Frame sampling plumbing: one payload row -> every-nth-frame rows.
    * STUB: treats the payload as `frameCount` equal chunks at `fps`; a real
    * implementation replaces the chunking with a container demuxer, keeping
    * the same one-to-many row shape (flatMap inside mapPartitions — the
    * executor-side explode that keeps frames off the driver). */
  def sampleFrames(payloads: DataFrame, everyNth: Int, frameCount: Int = 16,
      fps: Double = 25.0): Dataset[FrameSample] = {
    require(everyNth >= 1 && frameCount >= 1)
    val spark = payloads.sparkSession
    import spark.implicits._
    typedPayloads(payloads)
      .mapPartitions(_.flatMap { case (id, bytes) =>
        (0 until frameCount by everyNth).iterator.map { f =>
          val start = (f.toLong * bytes.length / frameCount).toInt
          val end = ((f + 1).toLong * bytes.length / frameCount).toInt
          FrameSample(id, f, (f * 1000 / fps).toLong,
            java.util.Arrays.copyOfRange(bytes, start, end))
        }
      })
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
