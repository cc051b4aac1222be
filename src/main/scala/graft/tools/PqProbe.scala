package graft.tools

import graft.core.GraftSession
import graft.operators.{Ivf, Pq, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only probe: the IVF-PQ compression claim measured — index bytes on
  * disk, search wall, and recall vs the uncompressed index and the exact
  * scan, at 1x (sf0.1 embeddings) and Nx (an [[Upscale]] directory).
  *
  * Usage: runMain graft.tools.PqProbe <dir1x> <dirNx>
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dirs = Seq(
      args.lift(0).getOrElse("/root/testdata/sf0.1"),
      args.lift(1).getOrElse("/tmp/sf1synth"))
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-pq-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def du(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val lists = math.max(16, (n / 512).toInt)
      println(f"\n[pq] $dir vectors=$n%,d lists=$lists")
      val queries = emb.filter(col("vec_id") < 32).localCheckpoint()
      val coarse = Ivf.train(emb, lists, iters = 2, maxTrainRows = 48L * lists)
      val pq = Pq.train(emb, m = 8, k = 256, iters = 2, maxTrainRows = 100000L)

      val flatIdx = java.nio.file.Files.createTempDirectory("pq_probe_flat_").toString
      val (_, tFlatBuild) = time(Ivf.writeIndex(emb, coarse, flatIdx))
      val pqIdx = java.nio.file.Files.createTempDirectory("pq_probe_pq_").toString
      val (_, tPqBuild) = time(Pq.writeIndex(emb, coarse, pq, pqIdx))
      val (flatB, pqB) = (du(s"$flatIdx/lists"), du(s"$pqIdx/lists"))
      println(f"[pq]   lists bytes: flat=${flatB / 1024}%,d KiB  pq=${pqB / 1024}%,d KiB  " +
        f"ratio=${flatB.toDouble / pqB}%.1fx  (build ${tFlatBuild}%.1f / ${tPqBuild}%.1f s)")

      def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
      val nProbe = 8
      val (_, tF1) = time(noop(Ivf.topKIndexed(spark, flatIdx, queries, 10, nProbe)))
      val (_, tFlat) = time(noop(Ivf.topKIndexed(spark, flatIdx, queries, 10, nProbe)))
      val (_, tP1) = time(noop(Pq.topKIndexed(spark, pqIdx, queries, 10, nProbe)))
      val (_, tPq) = time(noop(Pq.topKIndexed(spark, pqIdx, queries, 10, nProbe)))
      val (_, tRr) = time(noop(
        Pq.topKIndexedReranked(spark, pqIdx, queries, emb, 10, nProbe)))
      println(f"[pq]   search wall: flat=$tFlat%5.2fs  pq=$tPq%5.2fs  pq+rerank=$tRr%5.2fs" +
        f"  (first: $tF1%.2f / $tP1%.2f)")

      // quality: overlap with the exact scan restricted to probed lists is
      // the coarse quantizer's business; measure PQ against the FLAT index
      // (same probes, so the delta is pure quantization), and both against
      // brute force
      val exact = pairs(Similarity.bruteForceTopK(emb, queries, 10))
      val flat = pairs(Ivf.topKIndexed(spark, flatIdx, queries, 10, nProbe))
      val adc = pairs(Pq.topKIndexed(spark, pqIdx, queries, 10, nProbe))
      val rr = pairs(Pq.topKIndexedReranked(spark, pqIdx, queries, emb, 10, nProbe))
      def rec(a: Set[(Long, Long)], b: Set[(Long, Long)]) =
        if (b.isEmpty) 1.0 else a.intersect(b).size.toDouble / b.size
      println(f"[pq]   recall@10: flat-vs-exact=${rec(flat, exact)}%.3f  " +
        f"adc-vs-flat=${rec(adc, flat)}%.3f  adc-vs-exact=${rec(adc, exact)}%.3f  " +
        f"rerank-vs-exact=${rec(rr, exact)}%.3f")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(flatIdx))
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(pqIdx))
    }
    spark.stop()
  }
}
