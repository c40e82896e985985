package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Real, pure-JVM media codecs for the container formats that need no
  * external library: RIFF/WAVE PCM-16 audio and 24-bit uncompressed BMP
  * images. These upgrade [[Multimodal]]'s honest FAKE decode to actual
  * byte-level parsing for the formats a JVM can decode from first
  * principles — jpeg/mp3/mp4 remain behind the labeled stub until codec
  * libs exist in the runtime.
  *
  * Everything here is per-row executor code: encode for fixtures, decode
  * in `mapPartitions` batches. No Spark imports — the operator layer owns
  * the distribution story.
  */
object MediaCodecs {

  // ---- WAV (RIFF PCM-16 mono/stereo) --------------------------------------

  final case class WavMeta(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** Minimal canonical WAV writer: RIFF header + fmt chunk (PCM) + data
    * chunk, little-endian PCM-16. */
  def encodeWav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE container: walks chunks (so extra chunks like LIST
    * are skipped, as in the wild), requires PCM-16. */
  def decodeWav(bytes: Array[Byte]): WavMeta = {
    require(bytes.length >= 44, s"truncated WAV (${bytes.length} bytes)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF container")
    buf.getInt // riff size
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      val chunk = tag()
      val len = buf.getInt
      chunk match {
        case "fmt " =>
          val fmtEnd = buf.position() + len
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort.toInt
          require(bits == 16, s"only PCM-16 supported (got $bits)")
          buf.position(fmtEnd)
        case "data" =>
          require(bits == 16, "data chunk before fmt")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ => // skip unknown chunk (word-aligned)
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(samples != null, "no data chunk")
    WavMeta(sampleRate, channels, samples)
  }

  // ---- BMP (24-bit uncompressed, BITMAPINFOHEADER) ------------------------

  final case class BmpMeta(width: Int, height: Int,
      /** row-major top-down (r, g, b) triples */
      pixels: Array[Int])

  /** Minimal canonical 24-bit BMP writer (bottom-up rows, 4-byte padded,
    * BI_RGB). `pixels` is row-major top-down packed 0xRRGGBB. */
  def encodeBmp(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == width * height, "pixel count mismatch")
    val rowBytes = (width * 3 + 3) & ~3
    val dataLen = rowBytes * height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        buf.put((p & 0xff).toByte) // B
          .put(((p >> 8) & 0xff).toByte) // G
          .put(((p >> 16) & 0xff).toByte) // R
        x += 1
      }
      var pad = width * 3
      while ((pad & 3) != 0) { buf.put(0.toByte); pad += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24-bit uncompressed BMP (both bottom-up and top-down row
    * orders); returns top-down row-major packed 0xRRGGBB pixels. */
  def decodeBmp(bytes: Array[Byte]): BmpMeta = {
    require(bytes.length >= 54, s"truncated BMP (${bytes.length} bytes)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B' && buf.get() == 'M', "not a BMP")
    buf.getInt; buf.getInt // file size, reserved
    val pixelOffset = buf.getInt
    val hdrSize = buf.getInt
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val width = buf.getInt
    val rawHeight = buf.getInt
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    buf.getShort // planes
    val bpp = buf.getShort
    require(bpp == 24, s"only 24-bit BMP supported (got $bpp)")
    val compression = buf.getInt
    require(compression == 0, s"only BI_RGB supported (got $compression)")
    val rowBytes = (width * 3 + 3) & ~3
    val pixels = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val srcRow = if (topDown) row else height - 1 - row
      var x = 0
      var off = pixelOffset + srcRow * rowBytes
      while (x < width) {
        val b = bytes(off) & 0xff
        val g = bytes(off + 1) & 0xff
        val r = bytes(off + 2) & 0xff
        pixels(row * width + x) = (r << 16) | (g << 8) | b
        x += 1
        off += 3
      }
      row += 1
    }
    BmpMeta(width, height, pixels)
  }

  /** Nearest-neighbour resize, re-encoded as BMP — the distributed
    * image-resize step of a training pipeline (decode → transform →
    * re-encode, all executor-side). */
  def resizeBmp(bytes: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
    val src = decodeBmp(bytes)
    val out = new Array[Int](newW * newH)
    var y = 0
    while (y < newH) {
      val sy = (y.toLong * src.height / newH).toInt
      var x = 0
      while (x < newW) {
        val sx = (x.toLong * src.width / newW).toInt
        out(y * newW + x) = src.pixels(sy * src.width + sx)
        x += 1
      }
      y += 1
    }
    encodeBmp(newW, newH, out)
  }

  /** Naive integer-ratio resample (every k-th sample) for PCM audio —
    * the audio face of the same decode → transform → re-encode step. */
  def downsampleWav(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val w = decodeWav(bytes)
    val out = Array.tabulate(w.samples.length / factor)(i =>
      w.samples(i * factor))
    encodeWav(w.sampleRate / factor, w.channels, out)
  }
}
