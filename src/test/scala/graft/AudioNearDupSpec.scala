package graft

import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Audio fingerprinting (energy-envelope eHash) + near-dup pairing over
  * real PCM WAV payloads synthesized in-test — gain invariance, noise
  * robustness, discrimination, and the typed-status audit contract. */
class AudioNearDupSpec extends SparkSpec {
  import spark.implicits._

  /** 16 kHz mono 16-bit little-endian WAV from a sample function. */
  private def wav(n: Int)(sample: Int => Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = math.max(-32768, math.min(32767, sample(i))).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // a "melody": a deterministic step envelope (65 windows over 6500
  // samples -> 100 samples per window), amplitude varying per window
  private def envelope(w: Int): Int = ((w * 37) % 97) * 300 + 500
  private val n = 6500
  private def clip(gainNum: Int, gainDen: Int, noise: Int => Int = _ => 0) =
    wav(n)(i => envelope(i / 100) * gainNum / gainDen + noise(i))

  test("eHash: gain-invariant, noise-robust, discriminating, typed statuses") {
    val original = clip(1, 1)
    val halfGain = clip(1, 2)
    val noised = clip(1, 1, i => (i * 2654435761L % 101).toInt - 50)
    val different = wav(n)(i => (((i / 100) * 53) % 89) * 311 - 4000)
    val rows = Seq(
      (1L, original), (2L, halfGain), (3L, noised), (4L, different),
      (5L, Array[Byte](1, 2, 3)), // not a WAV
      (6L, original.take(40))     // truncated header -> corrupt
    ).toDF("doc_id", "data")
    val payloads = Multimodal.asBinaryPayload(rows, "doc_id", "data")
    val hs = Multimodal.audioEHash(payloads).collect()
      .map(h => h.doc_id -> h).toMap
    assert(hs(1L).status === "decoded")
    assert(hs(2L).ehash === hs(1L).ehash, "uniform gain must not move a bit")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(3L).ehash, hs(1L).ehash) <= 3,
      s"small noise must stay within a few envelope-order bits " +
        s"(got ${ham(hs(3L).ehash, hs(1L).ehash)})")
    assert(ham(hs(4L).ehash, hs(1L).ehash) > 10,
      s"different material must scatter (got ${ham(hs(4L).ehash, hs(1L).ehash)})")
    assert(hs(5L).status === "unsupported")
    assert(hs(6L).status === "corrupt")
  }

  test("audioNearDupPairs: re-gained and noised copies pair; different " +
      "material and undecodable payloads never do") {
    val rows = Seq(
      (1L, clip(1, 1)), (2L, clip(1, 2)),
      (3L, clip(1, 1, i => (i * 48271L % 61).toInt - 30)),
      (4L, wav(n)(i => (((i / 100) * 53) % 89) * 311 - 4000)),
      (5L, Array[Byte](9, 9, 9))
    ).toDF("doc_id", "data")
    val payloads = Multimodal.asBinaryPayload(rows, "doc_id", "data")
    val pairs = Multimodal.audioNearDupPairs(payloads, maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)),
      s"copies must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"different material must not pair: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }
}
