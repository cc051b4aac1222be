package graft.tools

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Dev-only: dump (token, xxhash64(token)) for every distinct token of the
  * documents table — the ground truth for developing the DuckDB
  * string-XXH64 oracle twin (XxSql's string variant).
  * Usage: runMain graft.tools.TokenHashDump [sfDir] [outDir]
  */
object TokenHashDump {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/tokhash")
    val spark = GraftSession.local(8, "graft-tokhash")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.documents(spark, dir)
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("token"))
      .distinct()
      .select(col("token"), xxhash64(col("token")).as("h"))
      .coalesce(1).write.mode("overwrite").parquet(out)
    println(s"[tokhash] wrote $out")
    spark.stop()
  }
}
