package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Differential + round-trip tests for the pure-JVM container codecs.
  * The PNG differential uses `javax.imageio` — an INDEPENDENT decoder
  * shipped with the JDK — as the oracle, so a structural bug in our
  * encoder (CRC, zlib stream, scanline filters) cannot pass unnoticed.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def pixels(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 31 + 7) % 256).toByte)

  test("PNG round-trip: encode → decode recovers dims and every pixel") {
    for ((w, h) <- Seq((1, 1), (16, 16), (48, 32), (64, 48))) {
      val px = pixels(w, h)
      val png = MediaCodec.pngEncodeGray(w, h, px)
      val (dw, dh, dpx) = MediaCodec.pngDecodeGray(png)
      assert((dw, dh) == (w, h))
      assert(dpx.toSeq == px.toSeq)
      assert(MediaCodec.pngDims(png) == (w, h))
    }
  }

  test("PNG differential: javax.imageio decodes our encoder's output identically") {
    val (w, h) = (32, 24)
    val px = pixels(w, h)
    val png = MediaCodec.pngEncodeGray(w, h, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO must accept the PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val gray = img.getRaster.getSample(x, y, 0)
      assert(gray == (px(y * w + x) & 0xff), s"pixel ($x,$y)")
    }
  }

  test("PNG differential: our decoder reads javax.imageio's own encoding") {
    val (w, h) = (20, 10)
    val px = pixels(w, h)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val (dw, dh, dpx) = MediaCodec.pngDecodeGray(out.toByteArray)
    assert((dw, dh) == (w, h))
    assert(dpx.toSeq == px.toSeq)
  }

  test("WAV round-trip: header fields and every sample") {
    val samples = Array.tabulate(333)(i => ((i * 7919) % 65536 - 32768).toShort)
    val wav = MediaCodec.wavEncodePcm16(22050, samples)
    assert(MediaCodec.wavSampleRate(wav) == 22050)
    val (rate, got) = MediaCodec.wavDecodePcm16(wav)
    assert(rate == 22050)
    assert(got.toSeq == samples.toSeq)
    assert(wav.length == 44 + samples.length * 2)
  }

  test("malformed payloads are rejected, not misparsed") {
    intercept[IllegalArgumentException](MediaCodec.pngDims(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](MediaCodec.wavSampleRate("RIFFxxxx".getBytes))
  }
}
