package graft.tools

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only probe: connected components on a synthetic pair graph whose
  * answer is known in closed form — N/chainLen disjoint chains of
  * `chainLen` nodes (diameter chainLen-1, the propagation-round stress;
  * real near-dup clusters are denser and converge faster). Reports wall
  * clock and verifies every label exactly. Not part of the engine.
  *
  * Usage: runMain graft.tools.ComponentsProbe [nEdges] [chainLen]
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = args.lift(0).map(_.toLong).getOrElse(5000000L)
    val chainLen = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-cc-probe")
    spark.sparkContext.setLogLevel("ERROR")

    // edges (i, i+1) except across chain boundaries; the range is sized so
    // ~nEdges survive the boundary filter (no limit: a row-limit would both
    // overflow Int for large runs and could split a chain, breaking the
    // closed-form label check)
    val pairs = spark.range(nEdges * chainLen / (chainLen - 1))
      .filter(pmod(col("id"), lit(chainLen)) =!= (chainLen - 1))
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      .localCheckpoint()
    val n = pairs.count()
    println(f"[cc] edges=$n%,d chainLen=$chainLen (diameter ${chainLen - 1})")

    val t0 = System.nanoTime()
    val labels = graft.operators.Dedup.connectedComponents(pairs, maxIter = chainLen + 4)
      .localCheckpoint()
    val secs = (System.nanoTime() - t0) / 1e9
    // expected label of node i: the chain head i - (i mod chainLen)
    val wrong = labels.filter(
      col("component") =!= (col("doc_id") - pmod(col("doc_id"), lit(chainLen)))).count()
    println(f"[cc] nodes=${labels.count()}%,d wall=$secs%.2f s wrong-labels=$wrong")
    require(wrong == 0, "labels must match the closed-form answer")
    spark.stop()
  }
}
