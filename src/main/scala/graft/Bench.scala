package graft
import graft.core.GraftSession
import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are materialized through the noop sink —
  * full execution of every operator, no driver collection, and no
  * count()-style plan collapse (Catalyst prunes projections under count).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = math.max(cpus, 4)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val defs = Registry.headline
    // one untimed warmup pass (JIT + codegen + parquet footer caches)
    defs.foreach(d => run(d.fn))
    val results = defs.map(d => d.name -> run(d.fn))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"headline_total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
