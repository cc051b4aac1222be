package graft.tools

/** Dev-only scratch for the MP3 codec work: codebook validation status,
  * filterbank round-trip SNR, chain delay measurement. Not part of the
  * engine. */
object Mp3Dev {
  def main(args: Array[String]): Unit = {
    import graft.operators.Mp3._
    val named = Seq("1" -> Tab1, "2" -> Tab2, "3" -> Tab3, "5" -> Tab5,
      "6" -> Tab6, "7" -> Tab7, "8" -> Tab8, "9" -> Tab9, "10" -> Tab10,
      "11" -> Tab11, "12" -> Tab12, "C1A" -> TabC1A, "C1B" -> TabC1B)
    println("valid: " + named.map { case (n, t) => s"$n=${t.valid}" }.mkString(" "))

    // delay measurement: APERIODIC lowpassed pseudo-noise (a periodic
    // tone mix has correlation side-peaks that fake the lag)
    val n = 8000
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val raw0 = Array.tabulate(n + 16)(t => (math.floorMod(mix(t.toLong), 2001L) - 1000L) / 1000.0)
    val xs = Array.tabulate(n) { t =>
      var a = 0.0; var j = 0
      while (j < 16) { a += raw0(t + j); j += 1 }
      0.7 * a / 16.0
    }
    // --- stage 1: filterbank-only round trip (no MDCT, no quantizer) ---
    locally {
      val steps = (n - 512) / 32
      val acc = new Array[Double](n + 512)
      var t = 0
      while (t < steps) {
        var k = 0
        while (k < 32) {
          var s = 0.0
          var i = 0
          while (i < 512) { s += xs(32 * t + i) * analysisF(k)(i); i += 1 }
          i = 0
          while (i < 512) { acc(32 * t + i) += s * synthesisF(k)(i); i += 1 }
          k += 1
        }
        t += 1
      }
      def snr(l: Int): Double = {
        var se = 0.0; var sx = 0.0
        var i = 600
        while (i < n - 1200) {
          val e = acc(i + l) - xs(i); se += e * e; sx += xs(i) * xs(i); i += 1
        }
        10 * math.log10(sx / se)
      }
      var bl = 0; var bs = Double.MinValue
      var l = 0
      while (l < 80) { val s0 = snr(l); if (s0 > bs) { bs = s0; bl = l }; l += 1 }
      println(f"[stage1 filterbank] best lag=$bl SNR=${bs}%.1f dB (zero-delay pair, expect >40 dB)")
    }

    // --- stage 2: filterbank + MDCT/IMDCT + inversion, NO quantizer ---
    locally {
      val gr = 12
      val steps = 18 * gr
      val padded = new Array[Double](32 * steps + 512)
      System.arraycopy(xs, 0, padded, 0, math.min(n, padded.length))
      val s = Array.ofDim[Double](steps, 32)
      var t = 0
      while (t < steps) {
        var k = 0
        while (k < 32) {
          var acc = 0.0; var i = 0
          while (i < 512) { acc += padded(32 * t + i) * analysisF(k)(i); i += 1 }
          s(t)(k) = if ((k & 1) == 1 && (t & 1) == 1) -acc else acc
          k += 1
        }
        t += 1
      }
      val cosL = Array.tabulate(36, 18)((p, m) =>
        math.cos(math.Pi / 72.0 * (2 * p + 1 + 18) * (2 * m + 1)))
      val win = Array.tabulate(36)(p => math.sin(math.Pi / 36.0 * (p + 0.5)))
      // MDCT per granule per subband, then IMDCT + OLA back to subband
      val s2 = Array.ofDim[Double](steps, 32)
      val prevHalf = Array.ofDim[Double](32, 18)
      val prevS = Array.ofDim[Double](32, 18)
      var g = 0
      while (g < gr) {
        var sb = 0
        while (sb < 32) {
          val x18 = new Array[Double](18)
          var m = 0
          while (m < 18) {
            var acc = 0.0; var p = 0
            while (p < 36) {
              val sv = if (p < 18) prevS(sb)(p) else s(18 * g + p - 18)(sb)
              acc += win(p) * sv * cosL(p)(m)
              p += 1
            }
            x18(m) = acc
            m += 1
          }
          m = 0
          while (m < 18) { prevS(sb)(m) = s(18 * g + m)(sb); m += 1 }
          // IMDCT + window + OLA
          var p = 0
          while (p < 18) {
            var acc = 0.0; m = 0
            while (m < 18) { acc += x18(m) * cosL(p)(m); m += 1 }
            s2(18 * g + p)(sb) = acc * win(p) * (4.0 / 36.0) + prevHalf(sb)(p)
            p += 1
          }
          p = 18
          while (p < 36) {
            var acc = 0.0; m = 0
            while (m < 18) { acc += x18(m) * cosL(p)(m); m += 1 }
            prevHalf(sb)(p - 18) = acc * win(p) * (4.0 / 36.0)
            p += 1
          }
          sb += 1
        }
        g += 1
      }
      // inversion back + synthesis
      val acc2 = new Array[Double](32 * steps + 512)
      t = 0
      while (t < steps) {
        var k = 0
        while (k < 32) {
          val v0 = s2(t)(k)
          val v = if ((k & 1) == 1 && (t & 1) == 1) -v0 else v0
          if (v != 0.0) {
            var i = 0
            while (i < 512) { acc2(32 * t + i) += v * synthesisF(k)(i); i += 1 }
          }
          k += 1
        }
        t += 1
      }
      def snr2(l: Int): Double = {
        var se = 0.0; var sx = 0.0; var i = 1000
        while (i < 32 * steps - 2000) {
          val e = acc2(i + l) - xs(i); se += e * e; sx += xs(i) * xs(i); i += 1
        }
        10 * math.log10(sx / se)
      }
      var bl = 0; var bs = Double.MinValue
      var l = 500
      while (l < 700) { val v = snr2(l); if (v > bs) { bs = v; bl = l }; l += 1 }
      println(f"[stage2 +MDCT] best lag=$bl SNR=${bs}%.1f dB (expect 576, >40 dB)")
    }

    val enc = graft.operators.Mp3.encode(xs)
    println(s"encoded bytes=${enc.length}")

    // decode WITHOUT the gapless trim to find the raw delay: correlate
    val dec = graft.operators.Mp3.decode(enc)
    dec match {
      case None => println("DECODE FAILED")
      case Some(ys) =>
        println(s"decoded n=${ys.length} (source $n)")
        // measured SNR against the source at the tag-aligned offset
        if (ys.length == n) {
          var se = 0.0; var sx = 0.0
          var i = 0
          while (i < n) { val e = ys(i) - xs(i); se += e * e; sx += xs(i) * xs(i); i += 1 }
          println(f"aligned SNR = ${10 * math.log10(sx / se)}%.1f dB")
        }
        // brute-force best-lag correlation to confirm the pinned delay
        var bestLag = 0; var bestC = -1.0
        var lag = 0
        while (lag < 2200) {
          var c = 0.0; var i = 0
          while (i + lag < ys.length && i < n) { c += ys(i) * xs(i); i += 1 } // identity check only
          lag += 2200
        }
        // (full scan over raw output happens below with trim disabled)
        bestLag = bestLag + 0; bestC = bestC + 0
    }

    // raw (untrimmed) correlation: strip the tag so decode() skips no
    // delay — rebuild stream without the Info frame
    val frameBytes = 144 * 320000 / 32000
    val raw = java.util.Arrays.copyOfRange(enc, frameBytes, enc.length)
    graft.operators.Mp3.decode(raw) match {
      case None => println("RAW DECODE FAILED")
      case Some(ys) =>
        println(s"raw decoded n=${ys.length}")
        var bestLag = 0; var bestC = Double.MinValue
        var lag = 0
        while (lag < 2500) {
          var c = 0.0
          var i = 0
          while (i < n && i + lag < ys.length) { c += ys(i + lag) * xs(i); i += 1 }
          if (c > bestC) { bestC = c; bestLag = lag }
          lag += 1
        }
        println(s"raw best lag = $bestLag (pinned ChainDelay = ${graft.operators.Mp3.ChainDelay})")
        def snrAt(l: Int): Double = {
          var se = 0.0; var sx = 0.0
          var i = 0
          while (i < n && i + l < ys.length) {
            val e = ys(i + l) - xs(i); se += e * e; sx += xs(i) * xs(i); i += 1
          }
          10 * math.log10(sx / se)
        }
        println(f"raw SNR at best lag = ${snrAt(bestLag)}%.1f dB, " +
          f"at pinned = ${snrAt(graft.operators.Mp3.ChainDelay)}%.1f dB")
    }

    // --- fingerprint fitness: afp(mp3 decode) vs afp(source) over the
    // actual fixture waveforms, many seeds ---
    import graft.operators.Multimodal
    var worst = 0
    var sumH = 0
    var fails = 0
    val seeds = 0 until 60
    for (seed <- seeds) {
      val src = Multimodal.AudioGen.samples(4000, seed.toLong, 0)
      val enc2 = graft.operators.Mp3.encode(src)
      graft.operators.Mp3.decode(enc2) match {
        case None => fails += 1
        case Some(dec2) =>
          val a = Multimodal.audioFingerprint64(src).get
          val b = Multimodal.audioFingerprint64(dec2).get
          val h = java.lang.Long.bitCount(a ^ b)
          sumH += h
          if (h > worst) worst = h
          if (seed < 5) {
            var se = 0.0; var sx = 0.0; var i = 0
            while (i < src.length) {
              val e = dec2(i) - src(i); se += e * e; sx += src(i) * src(i); i += 1
            }
            println(f"  seed=$seed fixture SNR=${10 * math.log10(sx / se)}%.1f dB hamming=$h")
          }
      }
    }
    println(f"afp hamming over ${seeds.size} seeds: mean=${sumH.toDouble / seeds.size}%.2f " +
      f"worst=$worst fails=$fails (dup budget = 10)")

    // --- the q30d shape: mp3(clean) on one side, noise=8 twin on the
    // other (any lossless-family encoding ~ the noisy samples) ---
    var worst2 = 0; var sum2 = 0; var over = 0
    for (seed <- seeds) {
      val clean = Multimodal.AudioGen.samples(4000, seed.toLong, 0)
      val noisy = Multimodal.AudioGen.samples(4000, seed.toLong, 8)
      val a = Multimodal.audioFingerprint64(
        graft.operators.Mp3.decode(graft.operators.Mp3.encode(clean)).get).get
      val b = Multimodal.audioFingerprint64(noisy).get
      val h = java.lang.Long.bitCount(a ^ b)
      sum2 += h
      if (h > worst2) worst2 = h
      if (h > 10) over += 1
      // and the reverse side: mp3 of the NOISY twin vs clean samples
      val c = Multimodal.audioFingerprint64(
        graft.operators.Mp3.decode(graft.operators.Mp3.encode(noisy)).get).get
      val d = Multimodal.audioFingerprint64(clean).get
      val h2 = java.lang.Long.bitCount(c ^ d)
      if (h2 > worst2) worst2 = h2
      if (h2 > 10) over += 1
    }
    println(f"q30d-shape hamming: mean=${sum2.toDouble / seeds.size}%.2f worst=$worst2 " +
      f"pairs-over-budget=$over/${2 * seeds.size}")

    // --- pinned literals for MultimodalSpec ---
    for (seed <- Seq(1L, 7L)) {
      val src = Multimodal.AudioGen.samples(4000, seed, 0)
      val dec3 = graft.operators.Mp3.decode(graft.operators.Mp3.encode(src)).get
      val afp = Multimodal.audioFingerprint64(dec3).get
      println(f"PIN seed=$seed afp=0x$afp%016xL len=${dec3.length}")
    }
  }
}
