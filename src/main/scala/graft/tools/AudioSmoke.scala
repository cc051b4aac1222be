package graft.tools

import graft.operators.Multimodal
import graft.operators.Multimodal.{AudioGen, WavDecoder}

/** Dev-only smoke for the companded/ADPCM WAV encode/decode pairs:
  * per-sample reconstruction error per encoding, G.711 anchor values, and
  * fingerprint invariance across all five encodings of one waveform. */
object AudioSmoke {
  def main(args: Array[String]): Unit = {
    var fails = 0
    def check(cond: Boolean, msg: => String): Unit =
      if (!cond) { println(s"FAIL $msg"); fails += 1 }

    for (seed <- 0L until 8L) {
      val ref = AudioGen.samples(4000, seed, 0)
      // (maxErr, meanErr): max bounds the worst transient, mean the
      // tracking quality — a nibble-order or table bug explodes both
      def err(bytes: Array[Byte]): (Double, Double) = {
        val got = WavDecoder.decode(bytes).get
        check(got.length == 4000, s"len ${got.length} seed=$seed")
        val d = ref.zip(got).map(p => math.abs(p._1 - p._2))
        (d.max, d.sum / d.length)
      }
      val e8 = err(AudioGen.wav(4000, seed, 0, bits = 8))
      val e16 = err(AudioGen.wav(4000, seed, 0, bits = 16))
      val eMu = err(AudioGen.wavG711(4000, seed, 0, alaw = false))
      val eA = err(AudioGen.wavG711(4000, seed, 0, alaw = true))
      val eAd = err(AudioGen.wavAdpcm(4000, seed, 0))
      check(e16._1 < 1e-4, f"pcm16 err ${e16._1}%.6f")
      check(e8._1 < 0.02, f"pcm8 err ${e8._1}%.6f")
      // G.711 top-segment half-step is 512/32768 = 0.0156 — the spec's own
      // worst case for full-scale signals
      check(eMu._1 <= 0.016, f"mulaw err ${eMu._1}%.6f seed=$seed")
      check(eA._1 <= 0.016, f"alaw err ${eA._1}%.6f seed=$seed")
      // ADPCM: transient overshoot is the codec's nature; tracking is the
      // spec-correctness signal
      check(eAd._1 < 0.2 && eAd._2 < 0.01,
        f"adpcm err max=${eAd._1}%.4f mean=${eAd._2}%.5f seed=$seed")
      // fingerprint invariance across every encoding of the same waveform
      val fps = Seq(
        AudioGen.wav(4000, seed, 0, bits = 8), AudioGen.wav(4000, seed, 0, bits = 16),
        AudioGen.wavG711(4000, seed, 0), AudioGen.wavG711(4000, seed, 0, alaw = true),
        AudioGen.wavAdpcm(4000, seed, 0))
        .map(b => Multimodal.audioFingerprint64(WavDecoder.decode(b).get).get)
      val base = fps.head
      fps.zipWithIndex.foreach { case (fp, i) =>
        val ham = java.lang.Long.bitCount(fp ^ base)
        check(ham <= 6, s"fp hamming $ham enc=$i seed=$seed")
      }
      if (seed == 0) println(f"errs: pcm8=${e8._1}%.4f mu=${eMu._1}%.4f " +
        f"a=${eA._1}%.4f adpcm(max/mean)=${eAd._1}%.4f/${eAd._2}%.5f")
    }
    println(if (fails == 0) "AUDIO SMOKE: ALL GREEN" else s"AUDIO SMOKE: $fails FAILURES")
  }
}
