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

  test("WAV with extra RIFF chunks (LIST before fmt/data) still parses correctly") {
    // r3/r4 advice: real encoders interleave LIST/fact chunks; fixed offsets
    // 20/36 would read garbage. Build canonical WAV, splice a LIST chunk in
    // front of fmt, and an odd-length junk chunk (word-alignment padding)
    // between fmt and data.
    val samples = Array.tabulate(100)(i => (i * 123).toShort)
    val wav = MediaCodec.wavEncodePcm16(8000, samples)
    val fmtAndData = java.util.Arrays.copyOfRange(wav, 12, wav.length)
    val fmt = java.util.Arrays.copyOfRange(wav, 12, 36)
    val data = java.util.Arrays.copyOfRange(wav, 36, wav.length)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array() // trailing pad byte (if odd) left zero
    }
    val list = chunk("LIST", "INFOISFTgraft".getBytes("US-ASCII")) // 13 bytes: odd
    val junk = chunk("junk", Array[Byte](1, 2, 3))                 // odd too
    val spliced = {
      val payload = list ++ fmt ++ junk ++ data
      val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + payload.length)
        .put("WAVE".getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    assert(spliced.length != wav.length && fmtAndData.nonEmpty)
    assert(MediaCodec.wavSampleRate(spliced) == 8000)
    val (rate, got) = MediaCodec.wavDecodePcm16(spliced)
    assert(rate == 8000)
    assert(got.toSeq == samples.toSeq)
  }

  test("malformed payloads are rejected, not misparsed") {
    intercept[IllegalArgumentException](MediaCodec.pngDims(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](MediaCodec.wavSampleRate("RIFFxxxx".getBytes))
    // no 'data' chunk at all
    val noData = MediaCodec.wavEncodePcm16(8000, Array[Short](1, 2)).take(36)
    val hdr = java.nio.ByteBuffer.wrap(noData).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(4, 28) // fix RIFF size to the truncated payload
    intercept[IllegalArgumentException](MediaCodec.wavDecodePcm16(noData))
    // adversarial chunk length near Int.MaxValue: `off + 8 + len` would
    // overflow and wrap past an additive bounds check
    val evil = MediaCodec.wavEncodePcm16(8000, Array[Short](1, 2))
    val ebb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ebb.putInt(16, 0x7FFFFFF0) // fmt chunk claims ~2 GB
    intercept[IllegalArgumentException](MediaCodec.wavSampleRate(evil))
    intercept[IllegalArgumentException](MediaCodec.wavDecodePcm16(evil))
  }
}
