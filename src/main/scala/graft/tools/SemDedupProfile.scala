package graft.tools

import graft.core.GraftSession
import graft.operators.{Dedup, Ivf, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Piecewise wall-clock of q30i's semanticDedup stages — which of
  * (embed-checkpoint | trainAuto | pair scan | components) owns the time.
  * Usage: tools/run_probe.sh graft.tools.SemDedupProfile [sfDir]
  */
object SemDedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val s = GraftSession.local(cpus)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val ids = graft.core.Tables.documents(s, sfDir).select("doc_id")
    val base = Multimodal.withImagePayload(ids).localCheckpoint()
    val twins = Multimodal.withImagePayload(
      ids.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("doc_id").as("seed")),
      seedCol = "seed", noise = 90).drop("seed").localCheckpoint()
    val emb = t("imageEmbeddings+ckpt") {
      Multimodal.imageEmbeddings(base.unionByName(twins)).localCheckpoint()
    }
    println(s"emb rows=${emb.count()} parts=${emb.rdd.getNumPartitions}")
    val model = t("trainAuto") {
      Ivf.trainAuto(emb, targetListSize = 128, iters = 3)
    }
    println(s"model c=${model.c} levels=${model.levels.size}")
    // second trainAuto to split warm codegen from cold
    t("trainAuto(again)") { Ivf.trainAuto(emb, targetListSize = 128, iters = 3) }
    val pairs = t("pairs materialize") {
      Dedup.semanticDupPairs(emb, model, 0.85).localCheckpoint()
    }
    println(s"pairs=${pairs.count()}")
    val kept = t("collapseDuplicates") {
      Dedup.collapseDuplicates(
        emb.select(col("vec_id").as("doc_id")), pairs,
        idCol = "doc_id", aCol = "id_a", bCol = "id_b").localCheckpoint()
    }
    println(s"kept=${kept.count()}")
    s.stop()
  }
}
