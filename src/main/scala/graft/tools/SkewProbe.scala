package graft.tools

import graft.core.GraftSession
import graft.queries.Registry
import org.apache.spark.sql.DataFrame

/** Dev-only zipfian-skew stress probe: run the keyed-operator queries
  * (LWW collapse, as-of joins, windows) against a uniform and a skewed
  * upscaled dataset (see [[Upscale]]'s `hotPct`) and report wall-clock plus
  * whether AQE's skew-join handling engaged in the final adaptive plan.
  * Not part of the engine.
  *
  * Usage: runMain graft.tools.SkewProbe <sfDir> [query ...]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf10z")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q05_lww_collapse", "q11b_join_asof_bounded", "q11_join_asof", "q15_window_rank")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    // hot-key profile of the input, so the report is self-describing
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val total = ev.count()
    val top = ev.groupBy("user_id").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc).head()
    println(f"[skew] events=$total%,d  hottest user=${top.getLong(0)} " +
      f"owns ${top.getLong(1)}%,d (${100.0 * top.getLong(1) / total}%.1f%%)")

    for (name <- names) {
      val d = Registry.all.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      // time the query FUNCTION too: operators with eager phases (index
      // builds, iterative fixpoints) do most of their work inside fn
      val t0 = System.nanoTime()
      try {
        val df: DataFrame = d.fn(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
        val skewed = plan.contains("skew=true")
        println(f"[skew] $name%-28s $secs%8.2f s  aqe-skew-handling=$skewed")
      } catch {
        case e: Throwable =>
          println(f"[skew] $name%-28s FAILED after ${(System.nanoTime() - t0) / 1e9}%.1f s: " +
            e.getMessage.take(200))
      }
    }
    spark.stop()
  }
}
