package graft.tools

import graft.core.GraftSession
import graft.operators.{Dedup, Ivf}
import org.apache.spark.sql.functions._

/** Dev-only probe: semantic dedup (q27i composition) at 10x/100x with a
  * PLANTED ground truth. The corpus is the sf0.001 embeddings replicated
  * `reps` times with heavy per-replica deterministic noise (cross-replica
  * cosine pushed far below threshold, so replicas are independent
  * sub-corpora — pair output scales linearly with reps, not reps^2), plus
  * one planted near-duplicate (+10000-offset id, scaled + tiny noise) for
  * every 5th base vector of every replica. Reports stage wall times (train
  * / pairs / collapse), pair counts, and the planted-duplicate recall.
  * Not part of the engine.
  *
  * Usage: runMain graft.tools.SemanticProbe [reps] [srcDir]
  */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(10)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-semantic-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$src/embeddings.parquet")
      .select("vec_id", "embedding")
    val span = base.agg(max(col("vec_id"))).head().getLong(0) + 1
    val plantedOffset = span * reps.toLong + 1000000L

    // replica r: vec' = vec + 1.2 * ||vec||/sqrt(dim) * g(id, r) with g a
    // deterministic hash noise in [-1, 1] per dimension — enough to push
    // cross-replica cosine far below any useful threshold while keeping
    // each replica a realistic cloud. r == 0 stays verbatim.
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val replicated = base
      .withColumn("_r", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("vec_id", col("vec_id") + col("_r").cast("long") * span)
      .withColumn("_scale",
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))) / math.sqrt(dim.toDouble))
      .withColumn("embedding",
        when(col("_r") === 0, col("embedding")).otherwise(
          zip_with(col("embedding"), sequence(lit(0), lit(dim - 1)), (x, j) =>
            (x.cast("double") + lit(1.2) * col("_scale") *
              (pmod(xxhash64(col("vec_id"), lit(7L), j), lit(2001L)).cast("double") / 1000.0d
                - lit(1.0d))).cast("float"))))
      .drop("_r", "_scale")
    // planted near-dups: every 5th vector, scaled (cosine-preserving) with
    // a whisper of noise; id offset keeps the original the cluster minimum
    val planted = replicated
      .filter(pmod(col("vec_id"), lit(5L)) === 0)
      .withColumn("vec_id", col("vec_id") + plantedOffset)
      .withColumn("embedding",
        zip_with(col("embedding"), sequence(lit(0), lit(dim - 1)), (x, j) =>
          (x.cast("double") * 1.04d + lit(0.0015d) *
            (pmod(xxhash64(col("vec_id"), j), lit(3L)).cast("double") - 1.0d)).cast("float")))
    val corpus = replicated.unionByName(planted).localCheckpoint()
    val n = corpus.count()
    val nPlanted = planted.count()
    val docs = corpus.select(col("vec_id").as("doc_id")).localCheckpoint()
    println(f"[sem] reps=$reps corpus=$n%,d planted=$nPlanted%,d")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sem] $label%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // the AUTO trainer: list count from a cheap count (~120 vectors/list),
    // hierarchical once it outgrows a flat centroid scan — the default a
    // 100 TB deployment runs, and the path whose training wall this probe
    // proves at-or-below linear from 10x to 100x
    val model = timed("train") {
      Ivf.trainAuto(corpus, targetListSize = 120, iters = 2)
    }
    println(s"[sem] quantizer lists=${model.c} tree=${model.tree.map(_.length).mkString("->")}")
    val pairs = timed("pairs") {
      val p = Dedup.semanticDupPairs(corpus, model, threshold = 0.9).localCheckpoint()
      println(f"[sem] pair-count ${p.count()}%,d")
      p
    }
    val dropped = timed("collapse") {
      val kept = Dedup.collapseDuplicates(docs, pairs, aCol = "id_a", bCol = "id_b")
        .localCheckpoint()
      docs.join(kept, Seq("doc_id"), "left_anti").localCheckpoint()
    }
    val nDropped = dropped.count()
    val plantedDropped = dropped.filter(col("doc_id") >= plantedOffset).count()
    val recall = plantedDropped.toDouble / nPlanted
    println(f"[sem] dropped=$nDropped%,d planted-dropped=$plantedDropped%,d recall=$recall%.3f")
    require(recall >= 0.85, f"planted recall $recall%.3f below floor")
    spark.stop()
  }
}
