package graft.multimodal

import graft.SparkTestBase
import graft.multimodal.Multimodal.MediaRecord
import java.awt.image.BufferedImage

/** Perceptual image near-dup: aHash properties on real in-memory PNGs
  * (decoded via javax.imageio, same path production payloads take) and the
  * byte-hash fallback for undecodable payloads. */
class ImageDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def png(img: BufferedImage): Array[Byte] = ImageCodec.encodePng(img)

  /** Left-dark / right-bright gradient image with an optional per-pixel
    * perturbation in one corner cell. */
  private def gradient(w: Int, h: Int, corner: Int = 0): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255, x * 255 / w + (if (x < w / 8 && y < h / 8) corner else 0))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def noise(seed: Int, n: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](n); r.nextBytes(b); b
  }

  private def rec(id: Long, payload: Array[Byte]) =
    MediaRecord(id, "image", payload, 0, 0, 0)

  test("aHash: identical images 0 bits apart, perturbed copy close, inverse far") {
    val base = Multimodal.imageAHash(png(gradient(64, 64)))
    val same = Multimodal.imageAHash(png(gradient(64, 64)))
    val nudged = Multimodal.imageAHash(png(gradient(64, 64, corner = 200)))
    val resized = Multimodal.imageAHash(png(gradient(32, 32)))
    // inverse gradient flips every luminance relation to the mean
    val inv = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = 255 - (x * 255 / 64); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      Multimodal.imageAHash(png(img))
    }
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(base, same) == 0)
    assert(dist(base, nudged) <= 2, s"perturbation moved ${dist(base, nudged)} bits")
    assert(dist(base, resized) <= 4, s"resize moved ${dist(base, resized)} bits")
    assert(dist(base, inv) >= 32, s"inverse only ${dist(base, inv)} bits away")
  }

  test("imageNearDupPairs finds the re-encoded/resized copies, not distinct images") {
    val media = Seq(
      rec(1L, png(gradient(64, 64))),
      rec(2L, png(gradient(64, 64, corner = 200))), // near-dup of 1
      rec(3L, png(gradient(32, 32))),               // resized copy of 1
      rec(4L, { // inverse gradient — unrelated
        val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 64; x <- 0 until 64) {
          val v = 255 - (x * 255 / 64); img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        png(img)
      }),
      rec(5L, noise(7, 500)),  // junk payload (stub hash path)
      rec(6L, noise(7, 500)),  // byte-identical junk: distance 0
      rec(7L, noise(8, 500)))  // different junk: far
      .toDS()
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 4)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)),
      s"got $pairs")
    assert(pairs((5L, 6L)) == 0)
  }
}
