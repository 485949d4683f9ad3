package graft

import java.nio.file.Files

import graft.core.Tables
import graft.pipelines.Pipelines
import graft.sinks.Sinks
import graft.operators.Multimodal

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("fake-data pipeline: generate -> idempotent store -> alert (§3.1)") {
    val dir = Files.createTempDirectory("pipeA").toString + "/users"
    val hook = new Sinks.RecordingAlertHook
    Pipelines.fakeDataPipeline(spark, 1000, dir, hook)
    Pipelines.fakeDataPipeline(spark, 1000, dir, hook) // rerun: no dups
    assert(spark.read.parquet(dir).count() === 1000)
    assert(hook.sent.count(_._1.contains("succeeded")) === 2)
  }

  test("upbit ingest pipeline: upsert stores + combine CTAS (§3.2)") {
    val base = Files.createTempDirectory("pipeB").toString
    val hook = new Sinks.RecordingAlertHook
    val markets = Seq(
      ("KRW-BTC", "비트코인", "Bitcoin"),
      ("KRW-ETH", "이더리움", "Ethereum"),
      ("KRW-XRP", "리플", "Ripple")).toDF("market", "korean_name", "english_name")
    val prices = Seq(
      ("KRW-BTC", 83000000.0, 1200.5),
      ("KRW-ETH", 3900000.0, 800.25)).toDF("market", "trade_price", "trade_volume")
    Pipelines.upbitIngestPipeline(spark, markets, prices,
      s"$base/markets", s"$base/prices", s"$base/combined", hook)
    val combined = spark.read.parquet(s"$base/combined")
    assert(combined.columns.toSeq ===
      Seq("market", "korean_name", "english_name", "trade_price", "trade_volume"))
    // inner join: XRP has no price row
    assert(combined.count() === 2)
    assert(hook.sent.last._1 === "upbit_data_pipeline succeeded")
  }

  test("multimodal: payload meta + partition-wise feature extraction") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val payloads = Multimodal.asBinaryPayload(docs, "doc_id", "text")
    val meta = Multimodal.payloadMeta(payloads)
    assert(meta.count() === 50)
    assert(meta.filter($"n_bytes" <= 0).count() === 0)
    val feats = Multimodal.extractFeatures(payloads)
    val rows = feats.collect()
    assert(rows.length === 50)
    rows.foreach { f =>
      assert(f.mean_intensity >= 0.0 && f.mean_intensity <= 1.0)
      assert(f.width >= 16 && f.height >= 16)
      assert(f.status === "unsupported",
        "text payloads have no codec: stub features must be flagged")
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(payloads).collect()
    assert(rows.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("multimodal: real PNG/JPEG payloads decode via javax.imageio") {
    import java.awt.image.BufferedImage
    def encode(img: BufferedImage, fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    // 3x2 PNG: five white pixels, one black -> mean intensity 5/6 exactly
    val png = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 3; y <- 0 until 2) png.setRGB(x, y, 0xFFFFFF)
    png.setRGB(0, 0, 0x000000)
    // 8x5 uniform mid-gray JPEG: lossy, so assert dims exactly + intensity loosely
    val jpg = new BufferedImage(8, 5, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 5) jpg.setRGB(x, y, 0x808080)
    // PNG magic followed by garbage: claims a supported format, fails decode
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      "garbage bytes after the signature".getBytes("UTF-8")
    val payloads = Seq(
      (1L, encode(png, "png")),
      (2L, encode(jpg, "jpg")),
      (3L, "not an image at all".getBytes("UTF-8")),
      (4L, corrupt))
      .toDF("doc_id", "payload")
    val meta = Multimodal.payloadMeta(payloads).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(meta === Map(1L -> "png", 2L -> "jpeg", 3L -> "bin", 4L -> "png"))
    val feats = Multimodal.extractFeatures(payloads).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).width === 3 && feats(1L).height === 2)
    assert(math.abs(feats(1L).mean_intensity - 5.0 / 6.0) < 1e-9,
      s"png mean ${feats(1L).mean_intensity}")
    assert(feats(2L).width === 8 && feats(2L).height === 5)
    assert(math.abs(feats(2L).mean_intensity - 128.0 / 255.0) < 0.05,
      s"jpeg mean ${feats(2L).mean_intensity}")
    // non-image payloads keep the deterministic stub path
    assert(feats(3L).width >= 16 && feats(3L).height >= 16)
    // the audit column separates the three outcomes
    assert(feats(1L).status === "decoded" && feats(2L).status === "decoded")
    assert(feats(3L).status === "unsupported")
    assert(feats(4L).status === "corrupt",
      "a payload claiming a supported format that fails decode is quarantinable")
  }

  test("multimodal: real WAV decode via javax.sound.sampled") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 0.1 s of 440 Hz sine at 8 kHz mono 16-bit, amplitude 0.5 full scale
    val sampleRate = 8000f
    val nFrames = 800
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (math.sin(2 * math.Pi * 440 * i / sampleRate) * 0.5 * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xFF).toByte          // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, out)
    val wavBytes = out.toByteArray
    val payloads = Seq(
      (1L, wavBytes),
      (2L, "definitely not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val meta = Multimodal.payloadMeta(payloads).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(meta === Map(1L -> "wav", 2L -> "bin"))
    val feats = Multimodal.extractAudioFeatures(payloads).collect()
      .map(f => f.doc_id -> f).toMap
    val wav = feats(1L)
    assert(wav.sample_rate === 8000.0 && wav.channels === 1)
    assert(wav.n_frames === 800L)
    assert(math.abs(wav.duration_ms - 100.0) < 1e-6)
    // a sine of amplitude a has rms a/sqrt(2) ≈ 0.3536
    assert(math.abs(wav.rms - 0.5 / math.sqrt(2)) < 0.01, s"rms ${wav.rms}")
    // non-audio payloads keep the deterministic stub framing
    assert(feats(2L).sample_rate === 16000.0)
    assert(wav.status === "decoded")
    assert(feats(2L).status === "unsupported")
  }

  test("multimodal: real GIF container demux samples every nth frame as PNG") {
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO}
    val colors = Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00)
    val frames = colors.map { c =>
      val img = new BufferedImage(5, 3, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 5; y <- 0 until 3) img.setRGB(x, y, c)
      img
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new IIOImage(f, null, null), writer.getDefaultWriteParam))
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gifBytes = out.toByteArray

    val payloads = Seq((7L, gifBytes)).toDF("doc_id", "payload")
    val sampled = Multimodal.sampleFrames(payloads, everyNth = 2, fps = 10.0)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq === Seq(0, 2), "every 2nd of 4 frames")
    assert(sampled.forall(_.status === "decoded"), "real GIF demux is decoded")
    assert(sampled.map(_.ts_ms).toSeq === Seq(0L, 200L), "ts from frame_idx/fps")
    sampled.zip(Seq(colors(0), colors(2))).foreach { case (fr, expected) =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(fr.payload))
      assert(img.getWidth === 5 && img.getHeight === 3)
      assert((img.getRGB(2, 1) & 0xFFFFFF) === expected, "frame pixels survive demux")
    }
  }

  test("multimodal: resize emits target-sized payloads deterministically") {
    val docs = Tables.documents(spark, sfDir).limit(10)
    val payloads = Multimodal.asBinaryPayload(docs, "doc_id", "text")
    val resized = Multimodal.resize(payloads, targetW = 8, targetH = 4).collect()
    assert(resized.length === 10)
    resized.foreach { r =>
      assert(r.width === 8 && r.height === 4)
      assert(r.payload.length === 32, "payload bytes = target area")
      assert(r.status === "unsupported", "stub resample must be flagged")
    }
    val again = Multimodal.resize(payloads, 8, 4).collect()
    assert(resized.sortBy(_.doc_id).map(_.payload.toSeq).toSeq ===
      again.sortBy(_.doc_id).map(_.payload.toSeq).toSeq)
  }

  test("multimodal: frame sampling explodes every-nth frame executor-side") {
    val docs = Tables.documents(spark, sfDir).limit(5)
    val payloads = Multimodal.asBinaryPayload(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(payloads, everyNth = 4, frameCount = 16)
      .collect()
    assert(frames.length === 5 * 4, "16 frames / every 4th = 4 per doc")
    frames.groupBy(_.doc_id).values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq === Seq(0, 4, 8, 12))
      assert(fs.forall(f => f.ts_ms === f.frame_idx * 40L), "25fps -> 40ms/frame")
      assert(fs.forall(_.status === "unsupported"),
        "no demuxer for text payloads: chunk stand-ins must be flagged")
    }
  }
}
