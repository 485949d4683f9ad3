package graft

import java.awt.image.BufferedImage

import graft.operators.Multimodal

/** Image dHash near-dup: perceptual invariance to light edits, separation
  * of unrelated images, typed audit statuses, and determinism. */
class ImageDHashSpec extends SparkSpec {
  import spark.implicits._

  private def encode(img: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Horizontal gradient with a per-seed vertical stripe pattern. */
  private def picture(seed: Int, w: Int = 36, h: Int = 24): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = x * 255 / (w - 1)
      val stripe = if ((x / 4 + seed) % 2 == 0) 40 else 0
      val v = math.min(255, base + stripe)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def perturb(img: BufferedImage): BufferedImage = {
    val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      c.setRGB(x, y, img.getRGB(x, y))
    // a couple of single-pixel edits: block means barely move
    c.setRGB(1, 1, 0xFFFFFF)
    c.setRGB(20, 10, 0x000000)
    c
  }

  private def inverted(img: BufferedImage): BufferedImage = {
    val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val v = 255 - (img.getRGB(x, y) & 0xFF)
      c.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    c
  }

  private def payloads(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("doc_id", "payload")

  test("near-dup pair found: verbatim re-encode and light pixel edits") {
    val base = picture(0)
    val df = payloads(
      1L -> encode(base),
      2L -> encode(base),            // identical bytes
      3L -> encode(perturb(base)),   // light edit
      4L -> encode(inverted(base)))  // structurally different
    val pairs = Multimodal.imageNearDupPairs(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "identical images must pair at hamming 0")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      "lightly edited copy must stay within the hamming radius")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "inverted image must not pair with the original family")
  }

  test("unrelated pictures separate by many bits") {
    val hashes = Multimodal.imageDHash(payloads(
        1L -> encode(picture(0)), 2L -> encode(inverted(picture(0)))))
      .collect().map(h => h.doc_id -> h.dhash).toMap
    val ham = java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))
    assert(ham > 16, s"expected wide separation, got $ham bits")
  }

  test("statuses audit undecodable payloads and exclude them from pairs") {
    val df = payloads(
      1L -> encode(picture(0)),
      2L -> "not an image".getBytes("UTF-8"),
      3L -> (Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
        Array.fill[Byte](16)(7)))  // PNG magic, truncated body
    val st = Multimodal.imageDHash(df).collect().map(h => h.doc_id -> h.status).toMap
    assert(st(1L) === "decoded")
    assert(st(2L) === "unsupported")
    assert(st(3L) === "corrupt")
    assert(Multimodal.imageNearDupPairs(df).count() === 0L)
  }

  test("hash is partition-invariant and stable across recomputation") {
    val rows = (1L to 12L).map(i => i -> encode(picture(i.toInt % 4))).toSeq
    val a = Multimodal.imageDHash(payloads(rows: _*))
      .collect().map(h => h.doc_id -> h.dhash).toMap
    val b = Multimodal.imageDHash(payloads(rows: _*).repartition(7))
      .collect().map(h => h.doc_id -> h.dhash).toMap
    assert(a === b)
  }
}
