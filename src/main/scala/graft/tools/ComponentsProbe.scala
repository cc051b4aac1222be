package graft.tools

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only probe: connected components on synthetic pair graphs whose
  * answers are known in closed form, reporting wall clock AND
  * rounds-to-converge vs graph diameter. Two shapes:
  *
  *  - `chain`: N/chainLen disjoint chains of `groupSize` nodes (diameter
  *    groupSize-1) — the propagation-round stress; pointer jumping should
  *    hold rounds at ~log2(diameter) + 2.
  *  - `clique`: disjoint cliques of `groupSize` nodes (diameter 1,
  *    groupSize*(groupSize-1)/2 edges each) — the REALISTIC near-dup shape:
  *    pair-finders emit all verified pairs of a duplicate cluster, so the
  *    graph is dense blobs, not paths. Rounds should be constant (~2-3)
  *    regardless of edge count; wall should scale with |E|.
  *
  * Every label is verified exactly against the closed form. Not part of
  * the engine.
  *
  * Usage: runMain graft.tools.ComponentsProbe [nEdges] [shape] [groupSize]
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = args.lift(0).map(_.toLong).getOrElse(5000000L)
    val shape = args.lift(1).getOrElse("chain")
    val groupSize = args.lift(2).map(_.toInt).getOrElse(if (shape == "clique") 6 else 8)

    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-cc-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val (pairs, diameter) = shape match {
      case "chain" =>
        // edges (i, i+1) except across chain boundaries; the range is sized
        // so ~nEdges survive the boundary filter (no limit: a row-limit
        // would both overflow Int for large runs and could split a chain,
        // breaking the closed-form label check)
        val p = spark.range(nEdges * groupSize / (groupSize - 1))
          .filter(pmod(col("id"), lit(groupSize)) =!= (groupSize - 1))
          .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
        (p, groupSize - 1)
      case "clique" =>
        // node i sits in clique i/groupSize; emit (i, j) for every LATER
        // member j of the same clique => groupSize*(groupSize-1)/2 edges
        // per clique, nGroups sized to hit ~nEdges total
        val perGroup = groupSize.toLong * (groupSize - 1) / 2
        val nGroups = math.max(1L, nEdges / perGroup)
        val groupEnd = (col("id") - pmod(col("id"), lit(groupSize))) + (groupSize - 1)
        val p = spark.range(nGroups * groupSize)
          .filter(pmod(col("id"), lit(groupSize)) =!= (groupSize - 1))
          .select(col("id").as("doc_a"),
            explode(sequence(col("id") + 1, groupEnd)).as("doc_b"))
        (p, 1)
      case other => sys.error(s"unknown shape $other (chain|clique)")
    }
    val edges = pairs.localCheckpoint()
    val n = edges.count()
    println(f"[cc] shape=$shape edges=$n%,d groupSize=$groupSize (diameter $diameter)")

    val t0 = System.nanoTime()
    val (labelled, rounds) = graft.operators.Dedup
      .connectedComponentsWithRounds(edges, maxIter = groupSize + 4)
    val labels = labelled.localCheckpoint()
    val secs = (System.nanoTime() - t0) / 1e9
    // expected label of node i: the group head i - (i mod groupSize)
    val wrong = labels.filter(
      col("component") =!= (col("doc_id") - pmod(col("doc_id"), lit(groupSize)))).count()
    println(f"[cc] nodes=${labels.count()}%,d wall=$secs%.2f s rounds=$rounds " +
      f"(diameter $diameter) wrong-labels=$wrong")
    require(wrong == 0, "labels must match the closed-form answer")
    spark.stop()
  }
}
