package graft.tools

import graft.operators.Multimodal.{VideoGen, VideoDecoder, ContainerParser, PerceptualHash}

/** Dev-only probe: MP4 MJPEG round-trip vs the AVI twin. */
object Mp4Probe {
  def main(args: Array[String]): Unit = {
    for (n <- Seq(1, 2, 3, 4, 6, 7)) {
      val mp4 = VideoGen.mp4Mjpeg(48, 32, n, seed = 7L)
      val avi = VideoGen.aviMjpeg(48, 32, n, seed = 7L)
      val sm = VideoDecoder.frameSlices(mp4)
      val sa = VideoDecoder.frameSlices(avi)
      val hm = VideoDecoder.sampleFromSlices(mp4, sm, 8).flatMap(PerceptualHash.dHash64)
      val ha = VideoDecoder.sampleFromSlices(avi, sa, 8).flatMap(PerceptualHash.dHash64)
      val meta = ContainerParser.parse(mp4)
      println(s"n=$n mp4slices=${sm.length} avislices=${sa.length} hashesEq=${hm == ha} " +
        s"meta=$meta bytes=${mp4.length}")
    }
    // truncation / garbage never throw
    val full = VideoGen.mp4Mjpeg(48, 32, 5, 9L)
    for (cut <- Seq(4, 12, 40, full.length / 2, full.length - 3)) {
      val t = java.util.Arrays.copyOfRange(full, 0, cut)
      println(s"cut=$cut slices=${VideoDecoder.frameSlices(t).length} meta=${ContainerParser.parse(t).format}")
    }
  }
}
