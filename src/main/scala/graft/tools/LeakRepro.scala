package graft.tools

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: establish precisely which unpersist form releases a
  * `Dataset.localCheckpoint()`'s blocks. Not part of the engine. */
object LeakRepro {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "graft-leak-repro")
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    def probe(label: String)(f: => Unit): Unit = {
      f
      println(s"[leak] $label -> persisted=${sc.getPersistentRDDs.size}")
    }

    // 1. Dataset.unpersist on a localCheckpoint
    val a = spark.range(1000).select(col("id"), (col("id") * 2).as("v")).localCheckpoint()
    probe("after checkpoint a") {}
    probe("a.unpersist(blocking=true)") { a.unpersist(blocking = true) }

    // 2. RDD-level unpersist via getPersistentRDDs
    val b = spark.range(1000).select(col("id"), (col("id") * 3).as("v")).localCheckpoint()
    probe("after checkpoint b") {}
    probe("rdd-level unpersist") {
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    // 3. drop reference + GC + cleaner
    var c = spark.range(1000).select(col("id"), (col("id") * 5).as("v")).localCheckpoint()
    probe("after checkpoint c") {}
    c = null
    probe("gc + 3s") { System.gc(); Thread.sleep(3000) }
    spark.stop()
  }
}
