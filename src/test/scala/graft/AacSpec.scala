package graft

import graft.operators.MediaCodecs
import org.scalatest.funsuite.AnyFunSuite

/** AAC-LC slice validators (ISO 14496-3) — the properties that hold by
  * MATHEMATICS, not by trusting a transcription:
  *  - Princen-Bradley: w[n]² + w[n+N/2]² = 1 for sine and KBD windows
  *    (the perfect-reconstruction window condition);
  *  - TDAC: analysis → synthesis reconstructs the interior exactly, for
  *    every legal window-sequence pattern and both window shapes;
  *  - bitstream: ADTS+SCE round-trip, escape-coded section lengths,
  *    grouping, and the LOUD codebook scope-out. */
class AacSpec extends AnyFunSuite {

  test("Princen-Bradley holds for sine and KBD windows (long + short)") {
    val cases: Seq[(Array[Double], Int)] = Seq(
      MediaCodecs.sineWindow(2048) -> 2048,
      MediaCodecs.sineWindow(256) -> 256,
      MediaCodecs.kbdWindow(2048, 4.0) -> 2048,
      MediaCodecs.kbdWindow(256, 6.0) -> 256)
    for ((w, n) <- cases) {
      (0 until n / 2).foreach { i =>
        val s = w(i) * w(i) + w(i + n / 2) * w(i + n / 2)
        assert(math.abs(s - 1.0) < 1e-12,
          s"PB violated at $i/$n: $s")
      }
    }
  }

  test("MDCT/IMDCT TDAC: perfect reconstruction through every window " +
      "sequence, both shapes") {
    for (shape <- Seq(0, 1); shortRun <- Seq(1, 3)) {
      val nFrames = 5 + shortRun
      val seqs = Seq(0, 1) ++ Seq.fill(shortRun)(2) ++ Seq(3, 0, 0)
      val len = (nFrames + 1) * 1024
      // deterministic, aperiodic-ish signal
      val x = Array.tabulate(len)(n =>
        math.sin(n * 0.013) + 0.25 * math.cos(n * 0.101) +
          ((n * 7) % 11 - 5) / 10.0)
      val y = MediaCodecs.aacSynthesis(
        MediaCodecs.aacAnalysis(x, seqs, shape), seqs, shape)
      val maxErr = (1024 until nFrames * 1024)
        .map(n => math.abs(y(n) - x(n))).max
      assert(maxErr < 1e-9,
        f"shape=$shape shortRun=$shortRun: max interior err $maxErr%.2e")
    }
  }

  test("TDAC survives sine<->KBD window-shape SWITCHING mid-stream " +
      "(left halves carry the previous frame's shape)") {
    val seqs = Seq(0, 1, 2, 3, 0, 0)
    val shapes = Seq(0, 1, 1, 0, 1, 0) // switch on almost every frame
    val len = (seqs.length + 1) * 1024
    val x = Array.tabulate(len)(n =>
      math.sin(n * 0.017) + ((n * 5) % 13 - 6) / 12.0)
    val y = MediaCodecs.aacSynthesis(
      MediaCodecs.aacAnalysis(x, seqs, shapes), seqs, shapes)
    val maxErr = (1024 until seqs.length * 1024)
      .map(n => math.abs(y(n) - x(n))).max
    assert(maxErr < 1e-9, f"shape-switching PR broke: $maxErr%.2e")
    // sanity: MISMATCHED carryover (constant-shape synthesis of a
    // switching analysis) must NOT reconstruct — proves the test bites
    val bad = MediaCodecs.aacSynthesis(
      MediaCodecs.aacAnalysis(x, seqs, shapes), seqs, 0)
    val badErr = (1024 until seqs.length * 1024)
      .map(n => math.abs(bad(n) - x(n))).max
    assert(badErr > 1e-4, f"expected visible aliasing, got $badErr%.2e")
  }

  test("filterbank probe returns exact integer energy and zero error") {
    val (errC, energyC) = MediaCodecs.aacFilterbankProbe(
      nFrames = 5, m = 3, shortRun = 1, shape = 1)
    assert(errC == 0L, s"err_c $errC")
    // closed form: sum over n in [1024, 5*1024) of ((3n mod 9) − 4)²
    val expected = (1024 until 5 * 1024)
      .map(n => { val v = n.toLong * 3 % 9 - 4; v * v }).sum
    assert(energyC == expected, s"energy_c $energyC != $expected")
  }

  test("ADTS + SCE bitstream round-trips frames, grouping, and " +
      "escape-coded section lengths") {
    val frames = Seq(
      MediaCodecs.AacFrame(0, 1, 45, 120), // long, 45 bands: 5-bit escape
      MediaCodecs.AacFrame(1, 0, 40, 130), // shape switches mid-stream
      MediaCodecs.AacFrame(2, 1, 9, 140, grouping = 0x2a), // 3-bit escapes
      MediaCodecs.AacFrame(3, 1, 31, 150),
      MediaCodecs.AacFrame(0, 0, 63, 160)) // max 6-bit value, 2 escapes
    val bytes = MediaCodecs.encodeAacLcAdts(frames, rateIdx = 3)
    val dec = MediaCodecs.decodeAacLc(bytes)
    assert(dec.sampleRateHz == 48000 && dec.channels == 1)
    assert(dec.frames == frames)
    assert(dec.pcm.length == (frames.length + 1) * 1024)
    assert(dec.pcm.forall(_ == 0.0), "ZERO_HCB frames must decode silent")
  }

  test("non-zero codebooks fail LOUDLY, naming the scoped-out tables") {
    // hand-craft a payload whose single section selects codebook 5
    val good = MediaCodecs.encodeAacLcAdts(
      Seq(MediaCodecs.AacFrame(0, 0, 2, 100)))
    // SCE layout after the 7-byte header: 3+4+8+1+2+1+6+1 = 26 bits, then
    // sect_cb is bits 26..29 of the payload — set them to 0101
    val bad = good.clone()
    val bitOff = 7 * 8 + 26
    def setBit(arr: Array[Byte], bit: Int, v: Int): Unit = {
      val mask = 1 << (7 - bit % 8)
      arr(bit / 8) = (if (v == 1) arr(bit / 8) | mask
        else arr(bit / 8) & ~mask).toByte
    }
    setBit(bad, bitOff, 0); setBit(bad, bitOff + 1, 1)
    setBit(bad, bitOff + 2, 0); setBit(bad, bitOff + 3, 1)
    val ex = intercept[UnsupportedOperationException](
      MediaCodecs.decodeAacLc(bad))
    assert(ex.getMessage.contains("codebook 5") &&
      ex.getMessage.contains("no") &&
      ex.getMessage.contains("ZERO_HCB"))
  }
}
