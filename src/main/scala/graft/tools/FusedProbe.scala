package graft.tools

import graft.core.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

object FusedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf10synth")
    val spark = GraftSession.local(32, "graft-fused-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val documents = spark.read.parquet(s"$dir/documents.parquet")
    val out = Dedup.exactJaccardPairs(documents)
    val t0 = System.nanoTime()
    out.write.format("noop").mode("overwrite").save()
    println(f"[probe] fused total ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    println(out.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort ") || l.contains("Filter") || l.contains("Project"))
      .map(_.take(400)).mkString("\n"))
  }
}
