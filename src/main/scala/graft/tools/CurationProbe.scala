package graft.tools

import graft.core.GraftSession
import graft.functions.TextOps
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Dev-only probe: token-budget fill on a SKEWED-stratum corpus — 90% of
  * documents remapped into one hot language, the realistic shape of a web
  * corpus (English dominates). Compares the default lossless prefilter
  * against the naive full window, which must sort the whole hot stratum in
  * one task. Not part of the engine.
  *
  * Usage: runMain graft.tools.CurationProbe <docsDir> [budgetTokens]
  */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf10u")
    val budget = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-curation-probe")
    spark.sparkContext.setLogLevel("ERROR")

    // 90% of docs into one hot stratum, deterministically by id
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("lang", when(pmod(col("doc_id"), lit(10)) < 9, lit("en")).otherwise(col("lang")))
      .localCheckpoint() // isolate the probe from scan/remap cost
    val n = docs.count()
    val hot = docs.filter(col("lang") === "en").count()
    println(f"[curation] docs=$n%,d hot-stratum=$hot%,d (${100.0 * hot / n}%.0f%%) budget=$budget%,d tokens")

    val score = TextOps.qualityScore(col("text"))
    def fill(pf: Boolean, minTok: Long) =
      Curation.tokenBudget(docs, budget, score, prefilter = pf, prefilterMinTokens = minTok)
    for ((label, df) <- Seq(
        ("auto (default)", fill(pf = true, minTok = 100000000L)),
        ("forced-threshold", fill(pf = true, minTok = 0L)),
        ("full-window", fill(pf = false, minTok = 0L)))) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[curation] $label%-17s $secs%8.2f s")
    }
    // equality witness at probe scale (counts + checksum, not full collect)
    val a = fill(pf = true, minTok = 0L).agg(count(lit(1)), sum(col("cum_tokens"))).head()
    val b = fill(pf = false, minTok = 0L).agg(count(lit(1)), sum(col("cum_tokens"))).head()
    println(s"[curation] equal=${a == b} kept-rows=${a.getLong(0)}")
    spark.stop()
  }
}
