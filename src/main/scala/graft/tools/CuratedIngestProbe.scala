package graft.tools

import graft.core.GraftSession
import graft.queries.QueryDef

/** Dev-only probe: the curated-ingest write path at scale — stream an
  * upscaled documents table through `Ingest.startCuratedIngest` (the q29k
  * rule cascade + PII redaction) in bounded micro-batches, and report wall
  * clock, batch count, kept/dropped rows, and the drop funnel. Not part of
  * the engine.
  *
  * Usage: runMain graft.tools.CuratedIngestProbe <sfDir> [filesPerTrigger]
  */
object CuratedIngestProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf10u")
    val fpt = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-cing-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val out = java.nio.file.Files.createTempDirectory("graft_cing_probe_")
    QueryDef.linkParquetInputs(
      java.nio.file.Paths.get(s"$dir/documents.parquet"), out.resolve("src"))
    val src = out.resolve("src").toString
    val schema = spark.read.parquet(src).schema
    val nIn = spark.read.parquet(src).count()

    // the same cascade q29k ships — shared definition, cannot desynchronize
    val rules = graft.operators.Curation.defaultQualityRules()

    val t0 = System.nanoTime()
    graft.streaming.Ingest.startCuratedIngest(
      spark, src, schema, s"$out/sink", s"$out/ckpt", rules,
      maxFilesPerTrigger = Some(fpt)).awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    val props = graft.streaming.Ingest.ingestProperties(spark, s"$out/ckpt")
    val funnel = graft.streaming.Ingest.curationFunnel(spark, s"$out/sink", s"$out/ckpt")
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    println(f"[cing] docs-in=$nIn%,d kept=${props("graft.ingest.committed.rows")}%s " +
      f"batches=${props("graft.ingest.committed.batches")}%s wall=$secs%.2f s")
    println(s"[cing] funnel: $funnel")
    QueryDef.deleteRecursively(out)
    spark.stop()
  }
}
