package graft.tools

import graft.core.GraftSession
import graft.functions.TextOps
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev-only: isolate the simhash banding-join cost by combo order on an
  * upscaled corpus (signature computation excluded via checkpoint).
  * Usage: runMain graft.tools.SimhashProbe [docsDir] [combos...]
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf10synth")
    // SIMHASH_REPS=r replicates the signature corpus r times: doc ids shift
    // by the span, signatures XOR a fixed random per-replica salt (popcount
    // ~32), so within-replica pair structure is preserved exactly and
    // cross-replica distances land far outside any useful budget — pair
    // output scales by r, corpus by r, no correlation flood.
    val reps = sys.env.getOrElse("SIMHASH_REPS", "1").toInt
    val combos = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(2, 3)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "simhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        TextOps.simHashFromHashes(TextOps.tokenHashes(col("text"))).as("sh"))
    val span = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    val salts = { val rnd = new scala.util.Random(7L); Array.fill(reps)(rnd.nextLong()) }
    val sigs = (0 until reps).map { r =>
        if (r == 0) base
        else base.select((col("doc_id") + lit(r * span)).as("doc_id"),
          col("sh").bitwiseXOR(lit(salts(r))).as("sh"))
      }.reduce(_.unionByName(_))
      .localCheckpoint()
    println(s"n=${sigs.count()}")
    for (q <- combos) {
      val t0 = System.nanoTime()
      val pairs = Dedup.simHashPairsFromSignatures(sigs, maxHamming = 6, comboSize = q)
      val n = pairs.count()
      println(f"combo=$q pairs=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
