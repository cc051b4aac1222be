package graft.tools

import graft.core.{GraftSession, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Dev-only scratch main; not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(32)
    val docs = Tables.documents(s, "/root/testdata/sf0.1")
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    time("tokens")(docs.select(TextOps.tokens(col("text")).as("t")))
    time("tok-hashes")(docs.select(transform(TextOps.tokens(col("text")), t => xxhash64(t)).as("h")))
    time("shingle-strings")(docs.select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh")))
    time("shingle-hash-sorted")(docs.select(
      sort_array(transform(TextOps.shingles(TextOps.tokens(col("text")), 3), e => xxhash64(e))).as("sh")))
    time("plus-minhash64")(docs.select(
      TextOps.minHashFromHashes(
        sort_array(transform(TextOps.shingles(TextOps.tokens(col("text")), 3), e => xxhash64(e))), 64).as("sig")))
    s.stop()
  }
}
