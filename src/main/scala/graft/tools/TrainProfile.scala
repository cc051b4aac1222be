package graft.tools

import graft.core.GraftSession
import graft.operators.Ivf
import org.apache.spark.sql.functions._

/** Micro-profile of Ivf coarse training on synthetic vectors — isolates
  * the trainer from the image-decode path (q30i analysis).
  * Usage: tools/run_probe.sh graft.tools.TrainProfile [n] [dim] [c] [iters]
  */
object TrainProfile {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(5500)
    val dim = args.lift(1).map(_.toInt).getOrElse(256)
    val c = args.lift(2).map(_.toInt).getOrElse(43)
    val iters = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val s = GraftSession.local(cpus)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val emb = s.range(n.toLong).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => (pmod(xxhash64(col("id") * lit(dim) + d), lit(1000)).cast("double") / lit(1000.0)).cast("float"))
        .as("embedding"))
      .localCheckpoint()
    println(s"emb rows=${emb.count()} parts=${emb.rdd.getNumPartitions}")
    t("train cold") { Ivf.train(emb, c, iters, maxTrainRows = 48L * c) }
    t("train warm") { Ivf.train(emb, c, iters, maxTrainRows = 48L * c) }
    t("train 1 iter") { Ivf.train(emb, c, 1, maxTrainRows = 48L * c) }
    t("train full sample 1 iter") { Ivf.train(emb, c, 1) }
    val emb2 = emb.coalesce(2).localCheckpoint()
    println(s"emb2 parts=${emb2.rdd.getNumPartitions}")
    t("train 2-part cold") { Ivf.train(emb2, c, iters, maxTrainRows = 48L * c) }
    t("train 2-part warm") { Ivf.train(emb2, c, iters, maxTrainRows = 48L * c) }
    s.stop()
  }
}
