package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only schema/read probe for the testdata. Not part of the engine. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- graft.core.Tables.names) {
      println(s"=== $t ===")
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        df.printSchema()
        df.show(3, truncate = 60)
        println(s"count=${df.count()}")
      } catch { case e: Throwable => println(s"READ FAILED: ${e}") }
    }
    // distinct event types for changelog/tombstone design
    try {
      spark.read.parquet(s"$dir/events.parquet")
        .groupBy("event_type").count().orderBy("event_type").show(50)
      spark.read.parquet(s"$dir/events.parquet")
        .selectExpr("min(user_id)", "max(user_id)", "min(ts)", "max(ts)", "min(event_id)", "max(event_id)").show(truncate = false)
    } catch { case e: Throwable => println(s"events probe failed: $e") }
    spark.stop()
  }
}
