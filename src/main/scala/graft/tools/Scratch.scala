package graft.tools

import graft.core.{GraftSession, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Dev-only scratch main; not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(s, dir)
    println("docs=" + docs.count())
    val shingled = docs.select(col("doc_id").as("doc"),
      TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val sigs = shingled.select(col("doc"), TextOps.minHash(col("sh"), 64).as("sig"))
    var t0 = System.nanoTime()
    sigs.write.format("noop").mode("overwrite").save()
    println(f"sig-compute ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val bandsDf = sigs.select(col("doc"), explode(TextOps.lshBands(col("sig"), 16, 4)).as("band"))
    t0 = System.nanoTime()
    val candidates = bandsDf.as("a")
      .join(bandsDf.as("b"), col("a.band") === col("b.band") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val nCand = candidates.count()
    println(f"candidates=$nCand (${(System.nanoTime() - t0) / 1e9}%.2f s)")
    t0 = System.nanoTime()
    val est = candidates
      .join(sigs.select(col("doc").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (a, m) => a + m).cast("double") / 64)
      .filter(col("est") >= 0.3)
      .select("doc_a", "doc_b")
    val nSurv = est.count()
    println(f"est-survivors=$nSurv (${(System.nanoTime() - t0) / 1e9}%.2f s)")
    s.stop()
  }
}
