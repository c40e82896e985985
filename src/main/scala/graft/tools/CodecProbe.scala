package graft.tools

import graft.operators.MediaCodecs

/** JMH-style micro-harness for the per-row codec CPU (VERDICT r17 #5):
  * times ONE row's work for the q207 (AAC-LC ADTS decode), q208 (TDAC
  * filterbank probe) and q192 (MP3 table decode) paths outside Spark, so
  * inner-loop changes are measured without scheduler noise. Warmup then
  * timed reps; prints per-row ms.
  *
  * Usage: runMain graft.tools.CodecProbe [reps]
  */
object CodecProbe {
  private def bench(name: String, warm0: Int, reps: Int)(f: => Unit): Unit = {
    // JIT warmup must be generous: 2 warm reps under-measured the MP3 path
    // by 6× on first probe (round 18)
    val warm = math.max(warm0, 15)
    (1 to warm).foreach(_ => f)
    val t0 = System.nanoTime()
    (1 to reps).foreach(_ => f)
    val ms = (System.nanoTime() - t0) / 1e6 / reps
    println(f"[codecprobe] $name%-28s ${ms}%10.2f ms/row  (reps=$reps)")
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5

    // q207 row shape (k = 51: odd → START/SHORT/STOP run, 5 frames)
    val k = 51L
    val frames = 2 + (k % 4).toInt
    val shape = ((k / 3) % 2).toInt
    val gain = (f: Int) => 100 + (k % 100).toInt + f
    val specs = (0 until frames).map { f =>
      if (f == 0) MediaCodecs.AacFrame(1, shape, 10 + (k % 20).toInt, gain(f))
      else if (f == frames - 1)
        MediaCodecs.AacFrame(3, shape, 10 + (k % 20).toInt, gain(f))
      else MediaCodecs.AacFrame(2, shape, 2 + (k % 8).toInt, gain(f),
        grouping = (k % 128).toInt)
    }
    val aacBytes = MediaCodecs.encodeAacLcAdts(specs)
    bench("q207 decodeAacLc", 2, reps) {
      MediaCodecs.decodeAacLc(aacBytes); ()
    }

    // q208 row shape (k = 5: 7 frames, m = 6)
    bench("q208 aacFilterbankProbe", 2, reps) {
      MediaCodecs.aacFilterbankProbe(nFrames = 7, m = 6, shortRun = 2,
        shape = 1); ()
    }

    // q192 row shape (k = 13)
    val k2 = 13L
    val tbls = Seq(3, 5, 6, 7, 8, 9, 13)
    val mp3Bytes = MediaCodecs.encodeMp3(
      frames = 2 + (k2 % 5).toInt, bitrateIdx = 9, rateIdx = 0,
      globalGain = 150 + (k2 % 40).toInt, count1Quads = (k2 % 4).toInt,
      bigValuePairs = (k2 % 3).toInt * 2,
      bigValueTable = tbls((k2 % 7).toInt), count1Table = (k2 % 2).toInt)
    bench("q192 decodeMp3", 2, math.max(reps, 20)) {
      MediaCodecs.decodeMp3(mp3Bytes); ()
    }
  }
}
