package graft.tools

import graft.core.GraftSession
import graft.operators.{Curation, Search}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe: scale behavior of the round-8 scoring/retrieval family —
  * NB classifier scoring, DSIR weighting, BM25 scan vs the persisted
  * inverted index — at 1x (sf0.1) and Nx (an [[Upscale]] directory).
  *
  * What to expect if the scale designs hold:
  *   - nbScore / dsirScore / bm25-scan walls grow ~linearly (broadcast
  *     model + map-only probe; cost IS the corpus scan);
  *   - bm25Indexed wall grows with the MATCHED POSTING MASS, not the
  *     corpus token count — for a fixed query batch that is the fraction
  *     of postings in the terms' hash buckets (rare terms: ~flat; common
  *     terms: linear but a small constant of the scan). The probe prints
  *     both walls and the indexed/scan ratio per scale.
  *
  * Usage: runMain graft.tools.RetrievalProbe <dir1x> <dirNx>
  */
object RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val dir1 = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dirN = args.lift(1).getOrElse("/tmp/sf1synth")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-retrieval-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (dir <- Seq(dir1, dirN)) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      println(f"\n[retrieval] $dir docs=$n%,d")
      val isRef = col("source").isin("src0", "src1", "src2", "src3")

      // time() returns the value: train ONCE per model — a discarded
      // duplicate pass would double the training wall and perturb the
      // page-cache/JIT state the recorded medians depend on
      val (nb, tNbTrain) = time {
        Curation.trainQualityClassifier(docs.filter(isRef), docs.filter(!isRef), maxVocab = 25)
      }
      val (_, tNbScore) = time(noop(Curation.classifierScore(docs, nb)))
      println(f"[retrieval]   nb-train=$tNbTrain%7.2fs  nb-score=$tNbScore%7.2fs")

      val (ds, tDsTrain) = time(Curation.trainDsir(docs.filter(isRef), docs, buckets = 10007))
      val (_, tDsScore) = time(noop(Curation.dsirScore(docs, ds)))
      println(f"[retrieval]   dsir-train=$tDsTrain%5.2fs  dsir-score=$tDsScore%6.2fs")

      import spark.implicits._
      val qs = Seq((1L, "dup scan"), (2L, "spark query merge"), (3L, "zebra"))
        .toDF("query_id", "query_text")
      val (_, tScan) = time(noop(Search.bm25(docs, qs, topK = 10)))
      val idx = java.nio.file.Files.createTempDirectory("graft_rp_idx_").toString
      val (_, tBuild) = time(Search.buildTextIndex(docs, idx, buckets = 64))
      val (_, tIdxWarm) = time(noop(Search.bm25Indexed(spark, idx, qs, topK = 10)))
      val (_, tIdx) = time(noop(Search.bm25Indexed(spark, idx, qs, topK = 10)))
      println(f"[retrieval]   bm25-scan=$tScan%6.2fs  index-build=$tBuild%6.2fs  " +
        f"bm25-indexed=$tIdx%5.2fs (first=$tIdxWarm%5.2fs)  indexed/scan=${tIdx / tScan}%5.3f")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
    }
    spark.stop()
  }
}
