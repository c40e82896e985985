package graft

import graft.operators.MediaCodecs
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level codec checks for the real WAV/BMP decode: round trips,
  * container quirks (extra RIFF chunks, top-down BMPs), and the
  * decode → transform → re-encode steps (resize, downsample). */
class MediaCodecsSpec extends AnyFunSuite {

  test("WAV round trip preserves samples, rate, channels") {
    val samples = Array.tabulate(4321)(i => ((i * 31) % 2048 - 1024).toShort)
    val bytes = MediaCodecs.encodeWav(16000, 1, samples)
    val w = MediaCodecs.decodeWav(bytes)
    assert(w.sampleRate == 16000 && w.channels == 1)
    assert(w.samples.toSeq == samples.toSeq)
  }

  test("WAV decoder skips unknown RIFF chunks (LIST metadata)") {
    val samples = Array.tabulate(100)(i => i.toShort)
    val canonical = MediaCodecs.encodeWav(8000, 2, samples)
    // splice a LIST chunk between fmt and data (odd length → pad byte)
    val fmtEnd = 12 + 8 + 16
    val meta = "INFOsoftware-graft!".getBytes("US-ASCII") // 19 bytes, odd
    val buf = java.nio.ByteBuffer
      .allocate(canonical.length + 8 + meta.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(canonical, 0, fmtEnd)
    buf.put("LIST".getBytes("US-ASCII")).putInt(meta.length).put(meta)
      .put(0.toByte) // word-align pad
    buf.put(canonical, fmtEnd, canonical.length - fmtEnd)
    val w = MediaCodecs.decodeWav(buf.array())
    assert(w.channels == 2 && w.samples.toSeq == samples.toSeq)
  }

  test("BMP round trip incl. non-multiple-of-4 width padding") {
    val (w, h) = (5, 3) // rowBytes 15 → padded to 16
    val px = Array.tabulate(w * h)(i => (i * 0x010203) & 0xffffff)
    val decoded = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(w, h, px))
    assert(decoded.width == w && decoded.height == h)
    assert(decoded.pixels.toSeq == px.toSeq)
  }

  test("BMP decoder handles top-down (negative height) files") {
    val (w, h) = (4, 2)
    val px = Array.tabulate(w * h)(i => i * 0x111111)
    val bottomUp = MediaCodecs.encodeBmp(w, h, px)
    // flip to a top-down encoding: negate height, reverse the row order
    val buf = java.nio.ByteBuffer.wrap(bottomUp.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -h)
    val rowBytes = (w * 3 + 3) & ~3
    val arr = buf.array()
    val r0 = arr.slice(54, 54 + rowBytes)
    val r1 = arr.slice(54 + rowBytes, 54 + 2 * rowBytes)
    System.arraycopy(r1, 0, arr, 54, rowBytes)
    System.arraycopy(r0, 0, arr, 54 + rowBytes, rowBytes)
    val decoded = MediaCodecs.decodeBmp(arr)
    assert(decoded.pixels.toSeq == px.toSeq)
  }

  test("resizeBmp nearest-neighbour: exact for integer upscale") {
    val px = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val big = MediaCodecs.decodeBmp(
      MediaCodecs.resizeBmp(MediaCodecs.encodeBmp(2, 2, px), 4, 4))
    assert(big.width == 4 && big.height == 4)
    // each source pixel becomes a 2×2 block
    assert(big.pixels(0) == 0xff0000 && big.pixels(1) == 0xff0000)
    assert(big.pixels(2) == 0x00ff00 && big.pixels(3) == 0x00ff00)
    assert(big.pixels(8) == 0x0000ff && big.pixels(15) == 0xffffff)
  }

  test("downsampleWav keeps every k-th sample and scales the rate") {
    val samples = Array.tabulate(1000)(i => i.toShort)
    val down = MediaCodecs.decodeWav(
      MediaCodecs.downsampleWav(MediaCodecs.encodeWav(8000, 1, samples), 4))
    assert(down.sampleRate == 2000)
    assert(down.samples.length == 250)
    assert(down.samples(10) == 40)
  }

  test("malformed inputs fail loudly, not garbage-out") {
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav("not a wav at all".getBytes)
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(Array[Byte](0x42, 0x4d, 0, 0))
    }
  }
}
