package graft.tools

import graft.operators.Multimodal.{ImageDecoder, ImageGen, PerceptualHash}

/** Dev-only smoke for the GIF encode/decode pair: round-trip pixel
  * equality (plain + interlaced), cross-container equality vs PNG/BMP of
  * the same field, and a quick perceptual-hash print for fixture pinning.
  * Not part of the engine surface. */
object GifSmoke {
  def main(args: Array[String]): Unit = {
    var fails = 0
    for (seed <- 0L until 12L; (w, h) <- Seq((64, 48), (9, 8), (17, 13), (1, 1), (300, 5))) {
      val field = ImageGen.gray(w, h, seed, 0)
      for (il <- Seq(false, true)) {
        val bytes = ImageGen.gif(w, h, seed, 0, interlaced = il)
        ImageDecoder.decode(bytes) match {
          case None =>
            println(s"FAIL decode None seed=$seed ${w}x$h il=$il"); fails += 1
          case Some(g) =>
            if (g.width != w || g.height != h) { println(s"FAIL dims seed=$seed il=$il"); fails += 1 }
            else if (!g.pixels.sameElements(field)) {
              val bad = g.pixels.zip(field).zipWithIndex.filter(p => p._1._1 != p._1._2)
              println(s"FAIL pixels seed=$seed ${w}x$h il=$il diff=${bad.length} first=${bad.take(3).mkString(",")}")
              fails += 1
            }
        }
      }
      // cross-container: PNG of the same field decodes to the same matrix
      val png = ImageDecoder.decode(ImageGen.png(w, h, seed, 0)).get
      if (!png.pixels.sameElements(field)) { println(s"FAIL png-vs-field seed=$seed"); fails += 1 }
    }
    // a big frame to force LZW table resets (>= 4096 dictionary entries)
    val big = ImageGen.gray(512, 400, 7L, 3)
    val bigGif = ImageDecoder.decode(ImageGen.gif(512, 400, 7L, 3)).get
    if (!bigGif.pixels.sameElements(big)) { println("FAIL big-gif table-reset"); fails += 1 }
    val g64 = ImageDecoder.decode(ImageGen.gif(64, 48, 42L, 0)).get
    println(f"GIF dHash(seed=42, 64x48) = 0x${PerceptualHash.dHash64(g64).get}%016x")
    println(if (fails == 0) "GIF SMOKE: ALL GREEN" else s"GIF SMOKE: $fails FAILURES")
  }
}
