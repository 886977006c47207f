package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM media codecs — REAL container encode/decode with zero
  * external dependencies (java.util.zip + byte structure only), so the
  * multimodal pipeline's decode step is no longer a stub for the formats
  * a training lake actually carries in bulk:
  *
  *  - PNG: 8-bit grayscale, filter 0, single IDAT — a fully valid PNG
  *    (signature, IHDR, CRC-checked chunks, zlib stream) readable by any
  *    decoder; [[MediaCodecSpec]] differentially verifies round-trips
  *    against the JDK's own independent `javax.imageio` implementation.
  *  - WAV: RIFF/PCM16 mono — the canonical 44-byte header + LE samples.
  *
  * Exotic codecs (JPEG entropy coding, video) remain out of scope and
  * are handled as opaque payloads upstream; the *shape* of their decode
  * is identical to these.
  */
object MediaCodec {

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32
    crc.update(t)
    crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Encode an 8-bit grayscale image (row-major pixels) as a valid PNG. */
  def pngEncodeGray(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height, s"expected ${width * height} pixels")
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter method 0, no interlace
      .array()
    chunk(out, "IHDR", ihdr)
    // scanlines: per-row filter byte 0 + pixels
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (width + 1)) = 0
      System.arraycopy(pixels, y * width, raw, y * (width + 1) + 1, width)
      y += 1
    }
    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val comp = new ByteArrayOutputStream()
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk(out, "IDAT", comp.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Header-only parse: (width, height) from IHDR — the cheap metadata
    * pass that runs over a whole lake without inflating pixel data. */
  def pngDims(bytes: Array[Byte]): (Int, Int) = {
    require(bytes.length >= 24 && bytes.take(8).sameElements(PngSig), "not a PNG")
    val bb = ByteBuffer.wrap(bytes, 16, 8)
    (bb.getInt, bb.getInt)
  }

  /** Full decode of 8-bit grayscale PNGs: walk chunks, concatenate IDAT,
    * inflate, reverse all five standard scanline filters (None/Sub/Up/
    * Average/Paeth) — any conforming encoder's grayscale output decodes,
    * not just our own filter-0 stream (differentially verified against
    * `javax.imageio`'s encoder in MediaCodecSpec). */
  def pngDecodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h) = pngDims(bytes)
    require(bytes(24) == 8 && bytes(25) == 0, "only 8-bit grayscale supported")
    val idat = new ByteArrayOutputStream()
    var off = 8
    while (off + 8 <= bytes.length) {
      val bb = ByteBuffer.wrap(bytes, off, 8)
      val len = bb.getInt
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(bytes, off + 8, len)
      off += 8 + len + 4 // len + type + data + crc
    }
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte]((w + 1) * h)
    var done = 0
    while (!inflater.finished() && done < raw.length)
      done += inflater.inflate(raw, done, raw.length - done)
    inflater.end()
    val pixels = new Array[Byte](w * h)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < h) {
      val filter = raw(y * (w + 1)) & 0xff
      var x = 0
      while (x < w) {
        val cur = raw(y * (w + 1) + 1 + x) & 0xff
        val left = if (x > 0) pixels(y * w + x - 1) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * w + x) & 0xff else 0
        val upLeft = if (x > 0 && y > 0) pixels((y - 1) * w + x - 1) & 0xff else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, upLeft)
          case f => throw new IllegalArgumentException(s"unknown PNG filter $f")
        }
        pixels(y * w + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, pixels)
  }

  /** Encode PCM16 mono samples as a canonical RIFF/WAVE file. */
  def wavEncodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Walk the RIFF chunk list and return (offset-past-header, length) of
    * the first chunk with the given 4CC id. Real encoders interleave
    * LIST/fact/cue chunks before `data`, so fixed offsets 20/36 silently
    * read garbage on valid files — chunk-walking is the only correct
    * parse (mirrors how pngDecodeGray walks PNG chunks). */
  private def riffChunk(bytes: Array[Byte], id: String): (Int, Int) = {
    require(bytes.length >= 12 && new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    while (off + 8 <= bytes.length) {
      val cid = new String(bytes, off, 4, "US-ASCII")
      val len = bb.getInt(off + 4)
      // subtraction form: `off + 8 + len` overflows Int for adversarial
      // lengths and would wrap past the bounds check
      require(len >= 0 && len <= bytes.length - off - 8, s"corrupt RIFF chunk $cid at $off")
      if (cid == id) return (off + 8, len)
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    throw new IllegalArgumentException(s"WAV has no '$id' chunk")
  }

  /** Header-only WAV parse: the sample rate from the fmt chunk. */
  def wavSampleRate(bytes: Array[Byte]): Int = {
    val (off, len) = riffChunk(bytes, "fmt ")
    require(len >= 16, "fmt chunk too short")
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt(off + 4)
  }

  /** Decode a PCM16 mono WAV: (sampleRate, samples). */
  def wavDecodePcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val (fmtOff, fmtLen) = riffChunk(bytes, "fmt ")
    require(fmtLen >= 16, "fmt chunk too short")
    require(bb.getShort(fmtOff) == 1 && bb.getShort(fmtOff + 2) == 1 &&
      bb.getShort(fmtOff + 14) == 16, "only PCM16 mono supported")
    val sampleRate = bb.getInt(fmtOff + 4)
    val (dataOff, dataLen) = riffChunk(bytes, "data")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) { samples(i) = bb.getShort(dataOff + i * 2); i += 1 }
    (sampleRate, samples)
  }
}
