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

  /** `status` is the audit column every kernel carries:
    *  - "decoded"     — a real in-environment codec produced the features;
    *  - "unsupported" — no codec for this format exists here, features are
    *                    the deterministic stand-in (a 100 TB run filters or
    *                    re-routes on this value instead of silently
    *                    training on fake features);
    *  - "corrupt"     — the payload claimed a supported format but failed
    *                    to decode; stub features, flagged for quarantine. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      mean_intensity: Double, status: String)

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

  /** Typed metadata without decoding: cheap, columnar, no UDF. Format is
    * sniffed from real magic bytes — PNG's 8-byte signature, JPEG's FF D8
    * marker, WAV's RIFF/WAVE header — by slicing only the payload prefix
    * (never hex-encoding the whole blob: that would churn O(payload)
    * string bytes per row to inspect a handful). */
  def payloadMeta(payloads: DataFrame): DataFrame = {
    val pngMagic = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    val jpegMagic = lit(Array[Byte](0xFF.toByte, 0xD8.toByte))
    val riff = lit("RIFF".getBytes("US-ASCII"))
    val wave = lit("WAVE".getBytes("US-ASCII"))
    payloads.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      when(substring(col("payload"), 1, 8) === pngMagic, "png")
        .when(substring(col("payload"), 1, 2) === jpegMagic, "jpeg")
        .when(substring(col("payload"), 1, 4) === riff &&
          substring(col("payload"), 9, 4) === wave, "wav")
        .otherwise("bin").as("format"))
  }

  /** Feature extraction via mapPartitions. PNG/JPEG payloads are decoded
    * for real (`javax.imageio` — pure JDK, executor-local); audio/video and
    * unrecognized formats fall back to the deterministic stub kernel. The
    * partitioning, batching, and schema are identical either way. */
  def extractFeatures(payloads: DataFrame): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    typedPayloads(payloads)
      .mapPartitions { it =>
        // per-partition init for a heavier codec/model would happen here;
        // ImageIO readers are stateless so decode() is called per row
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte

  /** Real image decode for PNG/JPEG via `javax.imageio`; everything else
    * (audio/video containers — no codec in this environment) routes to the
    * deterministic stub. Corrupt image payloads also fall back to the stub
    * rather than failing the task: at corpus scale a handful of truncated
    * blobs must not kill a 100 TB job. */
  private[operators] def decode(id: Long, bytes: Array[Byte]): MediaFeatures =
    if (isPng(bytes) || isJpeg(bytes)) {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) decodeStub(id, bytes, "corrupt")
        else {
          val w = img.getWidth; val h = img.getHeight
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
              x += 1
            }
            y += 1
          }
          MediaFeatures(id, bytes.length.toLong, w, h,
            sum / (w.toLong * h) / 255.0, "decoded")
        }
      // NonFatal, not just IOException: ImageIO plugins throw runtime
      // exceptions (IllegalArgument, ArrayIndexOutOfBounds, CMMException)
      // on malformed payloads, and the fall-back-to-stub contract must hold
      // for those too — a corrupt blob must not kill a corpus-scale job
      } catch { case scala.util.control.NonFatal(_) =>
        decodeStub(id, bytes, "corrupt") }
    } else decodeStub(id, bytes, "unsupported")

  case class AudioFeatures(doc_id: Long, n_bytes: Long, sample_rate: Double,
      channels: Int, n_frames: Long, duration_ms: Double, rms: Double,
      status: String)

  /** Audio feature extraction via mapPartitions. WAV payloads are decoded
    * for real (`javax.sound.sampled` — pure JDK: header parse + PCM frame
    * read); compressed formats (no codec in this environment) and corrupt
    * payloads fall back to the deterministic stub. RMS amplitude is
    * computed over 16-bit signed PCM samples, normalized to [0, 1]. */
  def extractAudioFeatures(payloads: DataFrame): Dataset[AudioFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    typedPayloads(payloads)
      .mapPartitions(_.map { case (id, bytes) => decodeAudio(id, bytes) })
  }

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private[operators] def decodeAudio(id: Long, bytes: Array[Byte]): AudioFeatures =
    if (isWav(bytes)) {
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          val frames = ais.getFrameLength
          val durationMs =
            if (fmt.getFrameRate > 0) frames * 1000.0 / fmt.getFrameRate else 0.0
          val rms =
            if (fmt.getSampleSizeInBits == 16 &&
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
              val data = ais.readAllBytes()
              var sumSq = 0.0; var n = 0
              var i = 0
              while (i + 1 < data.length) {
                val s = if (fmt.isBigEndian)
                  ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
                else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
                sumSq += (s / 32768.0) * (s / 32768.0); n += 1
                i += 2
              }
              if (n == 0) 0.0 else math.sqrt(sumSq / n)
            } else 0.0
          AudioFeatures(id, bytes.length.toLong, fmt.getSampleRate.toDouble,
            fmt.getChannels, frames, durationMs, rms, "decoded")
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException => audioStub(id, bytes, "corrupt")
      }
    } else audioStub(id, bytes, "unsupported")

  /** Deterministic stub for formats with no in-environment codec: assumes
    * 16 kHz mono 16-bit framing over the raw bytes. */
  private def audioStub(id: Long, bytes: Array[Byte],
      status: String): AudioFeatures = {
    val frames = bytes.length / 2L
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xFF))
    AudioFeatures(id, bytes.length.toLong, 16000.0, 1, frames,
      frames * 1000.0 / 16000.0,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length / 255.0,
      status)
  }

  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      payload: Array[Byte], status: String)
  case class FrameSample(doc_id: Long, frame_idx: Int, ts_ms: Long,
      payload: Array[Byte], status: String)

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
        // no real resampling codec in this environment: the payload is the
        // deterministic grid-sample stand-in, and the status says so
        ResizedMedia(id, targetW, targetH,
          resizeKernel(bytes, targetW, targetH), "unsupported")
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

  /** Frame sampling: one payload row -> every-nth-frame rows (flatMap
    * inside mapPartitions — the executor-side explode that keeps frames
    * off the driver).
    *
    * GIF payloads are demuxed for REAL: `javax.imageio`'s gif reader walks
    * the container's frames, every nth frame re-encodes as a standalone
    * PNG payload. Other container formats (no demuxer in this environment)
    * fall back to the deterministic chunking stub with the same row shape.
    * Frame timestamps use the caller's `fps` (a full demuxer would read
    * per-frame delays from container metadata). */
  def sampleFrames(payloads: DataFrame, everyNth: Int, frameCount: Int = 16,
      fps: Double = 25.0): Dataset[FrameSample] = {
    require(everyNth >= 1 && frameCount >= 1)
    val spark = payloads.sparkSession
    import spark.implicits._
    typedPayloads(payloads)
      .mapPartitions(_.flatMap { case (id, bytes) =>
        if (isGif(bytes)) gifFrames(id, bytes, everyNth, fps)
        else stubFrames(id, bytes, everyNth, frameCount, fps, "unsupported")
      })
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Real GIF demux: frame count from the container, each sampled frame
    * re-encoded as PNG. Falls back to the stub on corrupt payloads — a
    * truncated blob must not kill a corpus-scale job. */
  private def gifFrames(id: Long, bytes: Array[Byte], everyNth: Int,
      fps: Double): Iterator[FrameSample] = {
    try {
      // with ImageIO's default file cache, createImageInputStream returns a
      // FileCacheImageInputStream backed by a temp file — close it in the
      // finally or every GIF row leaks a temp file + handle on the executor
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext)
          return stubFrames(id, bytes, everyNth, 16, fps, "corrupt")
        val reader = readers.next()
        try {
          reader.setInput(in)
          val n = reader.getNumImages(true)
          (0 until n by everyNth).iterator.map { f =>
            val img = reader.read(f)
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", out)
            FrameSample(id, f, (f * 1000 / fps).toLong, out.toByteArray,
              "decoded")
          }.toVector.iterator // materialize before the reader is disposed
        } finally reader.dispose()
      } finally in.close()
    } catch {
      case _: java.io.IOException | _: RuntimeException =>
        stubFrames(id, bytes, everyNth, 16, fps, "corrupt")
    }
  }

  /** Deterministic chunking stand-in for formats with no demuxer. */
  private def stubFrames(id: Long, bytes: Array[Byte], everyNth: Int,
      frameCount: Int, fps: Double, status: String): Iterator[FrameSample] =
    (0 until frameCount by everyNth).iterator.map { f =>
      val start = (f.toLong * bytes.length / frameCount).toInt
      val end = ((f + 1).toLong * bytes.length / frameCount).toInt
      FrameSample(id, f, (f * 1000 / fps).toLong,
        java.util.Arrays.copyOfRange(bytes, start, end), status)
    }

  /** Deterministic fake decode for payloads with no in-environment codec
    * (audio/video, unknown formats): dimensions and intensity derived from
    * byte stats. Image payloads never reach this — [[decode]] handles
    * PNG/JPEG with the real `javax.imageio` path. */
  private def decodeStub(id: Long, bytes: Array[Byte],
      status: String): MediaFeatures = {
    val n = bytes.length
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xFF))
    MediaFeatures(
      doc_id = id,
      n_bytes = n.toLong,
      width = 16 + (math.abs(id) % 16).toInt,
      height = 16 + (n % 16),
      mean_intensity = if (n == 0) 0.0 else sum.toDouble / n / 255.0,
      status = status)
  }

  // ---------------------------------------------------------------- dHash

  case class ImageHash(doc_id: Long, dhash: Long, status: String)

  /** 64-bit difference hash per image — the perceptual fingerprint for
    * IMAGE near-dup dedup (re-encoded, re-compressed, or lightly edited
    * copies of one picture land within a few bits; unrelated pictures
    * land ~32 bits apart). Decode is the REAL `javax.imageio` PNG/JPEG
    * path; the downsample to the 9×8 grid is exact integer area
    * averaging (per-block luminance sums in 299/587/114 fixed-point
    * weights), and each of the 64 bits compares adjacent block means by
    * CROSS-MULTIPLICATION (`sumL·cntR < sumR·cntL`) — no float ever
    * enters, so the hash is bit-stable under partitioning and across
    * JVMs for lossless formats. Undecodable payloads keep a typed
    * status row (the [[extractFeatures]] audit contract) and are
    * excluded from pairing by the caller. */
  def imageDHash(payloads: DataFrame): Dataset[ImageHash] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    typedPayloads(payloads).mapPartitions(_.map { case (id, bytes) =>
      if (!(isPng(bytes) || isJpeg(bytes))) ImageHash(id, 0L, "unsupported")
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) ImageHash(id, 0L, "corrupt")
        else ImageHash(id, dhash64(img), "decoded")
      } catch { case scala.util.control.NonFatal(_) =>
        ImageHash(id, 0L, "corrupt") }
    })
  }

  private def dhash64(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    // 9 columns x 8 rows of exact block luminance sums + pixel counts
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var gy = 0
    while (gy < 8) {
      val y0 = (gy.toLong * h / 8).toInt
      val y1 = math.max(y0 + 1, ((gy + 1).toLong * h / 8).toInt) min h
      var gx = 0
      while (gx < 9) {
        val x0 = (gx.toLong * w / 9).toInt
        val x1 = math.max(x0 + 1, ((gx + 1).toLong * w / 9).toInt) min w
        var s = 0L; var c = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += ((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L +
              (rgb & 0xFF) * 114L
            c += 1; x += 1
          }
          y += 1
        }
        sums(gy)(gx) = s; cnts(gy)(gx) = math.max(c, 1L)
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      val (gy, gx) = (i / 8, i % 8)
      // left mean < right mean, cross-multiplied: exact
      if (sums(gy)(gx) * cnts(gy)(gx + 1) < sums(gy)(gx + 1) * cnts(gy)(gx))
        bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Near-duplicate image pairs: dHash + the covering-code hamming band
    * join ([[Dedup.hammingPairs]] — the same machinery q67 oracles for
    * SimHash). Only decoded payloads pair; output (id_a, id_b, hamming). */
  def imageNearDupPairs(payloads: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val fps = imageDHash(payloads).filter(col("status") === "decoded")
      .toDF().select(col("doc_id"), col("dhash")).cache()
    Dedup.hammingPairs(fps, "doc_id", "dhash", maxHamming)
  }

  case class AudioHash(doc_id: Long, ehash: Long, status: String)

  /** 64-bit audio fingerprint — [[imageDHash]]'s discipline applied to
    * the ENERGY ENVELOPE: decode 16-bit PCM WAV ([[decodeAudio]]'s pure
    * JDK path), frame the sample stream into 65 equal windows of EXACT
    * integer energy sums (Σs², Long — s² ≤ 2^30, no float ever enters),
    * and set bit i when window i's mean energy is below window i+1's,
    * compared by cross-multiplication in BigInt (window lengths differ
    * by the remainder; Long products could overflow past ~9 minutes of
    * audio). Gain-invariant by construction for exact scalings (uniform
    * gain scales every window's energy identically, and the comparisons
    * are homogeneous), and robust to small noise the way dHash is: only
    * adjacent-window ORDER matters, not absolute level. Undecodable
    * payloads keep a typed status row, excluded from pairing. */
  def audioEHash(payloads: DataFrame): Dataset[AudioHash] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    typedPayloads(payloads).mapPartitions(_.map { case (id, bytes) =>
      if (!isWav(bytes)) AudioHash(id, 0L, "unsupported")
      else try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding !=
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            AudioHash(id, 0L, "unsupported")
          else {
            val data = ais.readAllBytes()
            val n = data.length / 2
            if (n < 65) AudioHash(id, 0L, "too_short")
            else AudioHash(id, ehash64(data, n, fmt.isBigEndian), "decoded")
          }
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException => AudioHash(id, 0L, "corrupt")
      }
    })
  }

  private def ehash64(data: Array[Byte], n: Int, bigEndian: Boolean): Long = {
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val i0 = (w.toLong * n / 65).toInt
      val i1 = math.max(i0 + 1, ((w + 1).toLong * n / 65).toInt) min n
      var s = 0L
      var i = i0
      while (i < i1) {
        val b = 2 * i
        val v = if (bigEndian) ((data(b) << 8) | (data(b + 1) & 0xFF)).toShort
          else ((data(b + 1) << 8) | (data(b) & 0xFF)).toShort
        s += v.toLong * v
        i += 1
      }
      sums(w) = s; cnts(w) = (i1 - i0).toLong
      w += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      // mean(i) < mean(i+1), cross-multiplied exactly (BigInt: a window
      // sum reaches 2^30 · n/65, so Long products overflow on long clips)
      if (BigInt(sums(i)) * cnts(i + 1) < BigInt(sums(i + 1)) * cnts(i))
        bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Near-duplicate audio pairs: [[audioEHash]] + the covering-code
    * hamming band join — re-encoded, re-gained, or lightly noised copies
    * of the same clip land within a few envelope-order bits while
    * different material scatters ~32 bits apart. Same scale shape as
    * [[imageNearDupPairs]]: fingerprints are 8-byte keys, the band join
    * is recall-guaranteed at `maxHamming`. */
  def audioNearDupPairs(payloads: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val fps = audioEHash(payloads).filter(col("status") === "decoded")
      .toDF().select(col("doc_id"), col("ehash")).cache()
    Dedup.hammingPairs(fps, "doc_id", "ehash", maxHamming)
  }
}
