package graft.tools

import graft.core.GraftSession
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Dev-only stage-timing probe for the exact-Jaccard pair pipeline (q27b):
  * where does the 100x wall-clock go — shingle materialization, candidate
  * blocking join, or the array-carrying verify tail? Not part of the engine.
  *
  * Usage: runMain graft.tools.DedupProbe [srcDir]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf10synth")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val documents = spark.read.parquet(s"$dir/documents.parquet")
    val shingleN = 3
    val tokenSlack = 5
    val threshold = 0.5

    // stage 1: the one materialization (tokenize + shingle + checkpoint)
    val d = timed("checkpoint (tokens+shingles)") {
      documents
        .select(col("doc_id"), col("lang"), TextOps.tokenHashes(col("text")).as("th"))
        .select(
          col("doc_id"), col("lang"), size(col("th")).as("nt"),
          TextOps.ngramHashes(col("th"), shingleN).as("sh"))
        .withColumn("nt_block", floor(col("nt") / (tokenSlack * 2)))
        .localCheckpoint()
    }
    val shingled = d.select(col("doc_id"), col("sh"))

    // stage 2: blocking join -> candidate pairs (ids only)
    val ids = d.select(col("doc_id"), col("lang"), col("nt"), col("nt_block")).hint("merge")
    val probe = ids.withColumn(
      "nt_probe",
      explode(array(col("nt_block") - 1, col("nt_block"), col("nt_block") + 1)))
    val pairs = probe.as("a")
      .join(
        ids.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.nt_probe") === col("b.nt_block") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.nt") - col("b.nt")) <= tokenSlack)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .localCheckpoint() // isolate candidate cost from verify cost
    val nPairs = timed("candidate blocking join")(pairs.count())
    println(s"[probe] candidate pairs = $nPairs")

    // stage 3: verify tail (two array-attaching joins + merge-walk jaccard)
    val verified = pairs
      .join(shingled.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shingled.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", TextOps.jaccardSortedHashes(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
    timed("verify tail")(verified.write.format("noop").mode("overwrite").save())
    println(verified.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort "))
      .mkString("\n"))
    spark.stop()
  }
}
