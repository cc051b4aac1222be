package graft.tools

import graft.core.GraftSession
import graft.operators.Dedup
import graft.streaming.Ingest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only: the streaming complement of [[BandProbe]] — drive the REAL
  * `startNearDupIngest` against a SEEDED large index (the long-uptime
  * regime where the per-trigger probe cost matters) and compare s/batch
  * between the flat layout and the band-bucketed one, including the
  * per-batch segment writes and periodic concurrent folds.
  * Usage: runMain graft.tools.BandIngestProbe [seedDocs] [nBatches] [docsPerBatch] [buckets] [foldEvery]
  */
object BandIngestProbe {

  private final class Capture(spark: SparkSession) extends StreamingQueryListener {
    val rows = new java.util.concurrent.ConcurrentSkipListMap[Long, Double]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (p.numInputRows > 0)
        rows.put(p.batchId,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue() / 1000.0).getOrElse(0.0))
    }
  }

  def main(args: Array[String]): Unit = {
    val seedDocs = args.lift(0).map(_.toLong).getOrElse(400000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(60)
    val docsPerBatch = args.lift(2).map(_.toInt).getOrElse(50)
    // "auto" streams against the DEFAULT layout (auto-sized P)
    val buckets = args.lift(3) match {
      case Some("auto") => Dedup.AutoBuckets
      case v => v.map(_.toInt).getOrElse(4096)
    }
    val foldEvery = args.lift(4).map(_.toInt).getOrElse(20)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-band-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Files.createTempDirectory("graft_bandingest_")

    // the soak generator's hash-derived docs: corpus all-distinct, stream
    // batches half twins of seeded docs / half fresh
    def gen(n: Long, keyOffset: Long) = {
      val words = (0 until 24).map(j =>
        concat(lit("w"), pmod(xxhash64(col("_key") * 1000003L + j), lit(50000L))))
      spark.range(n)
        .select(col("id").as("doc_id"))
        .withColumn("_key", col("doc_id") + keyOffset)
        .withColumn("text", concat_ws(" ", words: _*))
        .drop("_key")
    }
    val corpus = gen(seedDocs, 0L).localCheckpoint()

    val streamed = nBatches.toLong * docsPerBatch
    // guard the stride: streamed/2 > seedDocs would make it 0 (modulo-null
    // under non-ANSI eval => silently zero twins; the printed comparison
    // would be meaningless). max(1, ...) keeps every corpus doc eligible
    // when more twins are requested than seeds exist.
    require(streamed >= 2, s"need at least 2 streamed docs, got $streamed")
    val twinStride = math.max(1L, seedDocs / (streamed / 2))
    val twins = corpus.filter(col("doc_id") % twinStride === 0)
      .limit((streamed / 2).toInt)
      .withColumn("doc_id", col("doc_id") + 10L * seedDocs)
    val fresh = gen(streamed / 2, 77L * seedDocs)
      .withColumn("doc_id", col("doc_id") + 20L * seedDocs)
    val srcDir = s"$out/src"
    twins.unionByName(fresh)
      .withColumn("lang", lit("en"))
      .repartition(nBatches).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    for ((tag, bb) <- Seq(("flat", 0), ("bkt ", buckets))) {
      val idx = s"$out/idx_$bb"
      val t0 = System.nanoTime()
      Dedup.writeMinHashIndex(corpus, idx, shingleN = 3, numHashes = 64, bands = 16,
        bandBuckets = bb)
      println(f"[bandingest] $tag seed index build ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val cap = new Capture(spark)
      spark.streams.addListener(cap)
      val q = Ingest.startNearDupIngest(
        spark, srcDir, schema, s"$out/sink_$bb", s"$out/ckpt_$bb", idx,
        threshold = 0.7, maxFilesPerTrigger = Some(1))
      var lastFold = 0
      while (q.isActive) {
        Thread.sleep(500)
        if (foldEvery > 0 && cap.rows.size() - lastFold >= foldEvery) {
          lastFold = cap.rows.size()
          Dedup.foldDocSegments(spark, idx, gc = false)
        }
      }
      q.awaitTermination()
      Dedup.gcDocIndex(spark, idx)
      spark.streams.removeListener(cap)
      import scala.jdk.CollectionConverters._
      val secs = cap.rows.values().asScala.toVector
      val sorted = secs.sorted
      println(f"[bandingest] $tag n=$seedDocs%,d batches=${secs.size} " +
        f"median=${sorted(sorted.size / 2)}%.3f s/batch " +
        f"first10=${secs.take(10).sum / 10}%.3f last10=${secs.takeRight(10).sum / 10}%.3f " +
        f"total=${secs.sum}%.1f s")
      val kept = spark.read.parquet(
        (0L until secs.size.toLong).map(b => s"$out/sink_$bb/batch_id=$b"): _*).count()
      println(f"[bandingest] $tag kept=$kept%,d of $streamed%,d streamed (half are twins)")
    }
    spark.stop()
  }
}
