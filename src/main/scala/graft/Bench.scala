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
      // free this run's localCheckpoint blocks afterwards — ON BOTH PATHS
      // (results are already fully materialized by the noop save): across
      // ~70 queries x reps they otherwise pile up in the block manager
      // until GC happens to run, and a query timed under that storage
      // pressure reads 10-30x slow — a harness artifact, not an operator
      // cost (seen on q27g in the first full-table run: 33 s in-session
      // vs 0.98 s isolated). A FAILED query's eager state must not poison
      // later timings either, hence the finally.
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable => System.err.println(s"[bench] ${e.getMessage}"); -1.0
      } finally {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.sharedState.cacheManager.clearCache()
      }
    }

    // --full (or SPARK_GRAFT_BENCH_ALL=1) -> every registered query, so the
    // complete per-query median table is regenerated mechanically each round
    // and regressions OUTSIDE the headline set are caught by diffing.
    // SPARK_GRAFT_REPS=n -> median of n timed reps (default 1).
    // SPARK_GRAFT_ONLY=q1,q2 -> bench just those queries (dev iteration).
    val full = args.contains("--full") || sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1")
    val defs = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(names) =>
        val keep = names.split(",").map(_.trim).toSet
        Registry.all.filter(d => keep(d.name))
      case None => if (full) Registry.all else Registry.headline
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    // one untimed warmup pass (JIT + codegen + parquet footer caches)
    val warmup = sys.env.get("SPARK_GRAFT_NO_WARMUP").isEmpty
    if (warmup) defs.foreach(d => run(d.fn))
    val results = defs.map { d =>
      val times = (1 to reps).map(_ => run(d.fn)).filter(_ >= 0).sorted
      val med = if (times.isEmpty) -1.0 else times(times.size / 2)
      System.err.println(f"[bench] ${d.name}%-28s $med%8.3f s")
      d.name -> med
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val metric = if (full) "full_total" else "headline_total"
    println(s"""{"metric":"$metric","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
