package graft.tools

import graft.core.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-JOB wall-clock profile of one registered query (UI is disabled in
  * this sandbox, so this is the measurement surface guide §1/§7 reads off
  * the UI): run the query through the noop sink and print one line per
  * Spark job — id, seconds, stage count, task count, description tail.
  * A query whose wall is 20 scheduler-bound jobs profiles flat here where
  * a stage-bound one shows one dominant job.
  *
  * Usage: tools/run_probe.sh graft.tools.JobProfile <query> [sfDir] [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val s = GraftSession.local(cpus)
    val fn = graft.SparkEntry.queries(name)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    @volatile var collecting = false
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (collecting) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (collecting) {
        Option(starts.get(je.jobId)).foreach { case (t0, desc, tasks) =>
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"JOB ${je.jobId}%4d ${sec}%8.3f s  tasks=$tasks%-5d ${desc.takeRight(90)}")
        }
      }
    })

    // warmup (codegen + JIT), then profiled reps
    fn(s, sfDir).write.format("noop").mode("overwrite").save()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    s.sharedState.cacheManager.clearCache()
    (1 to reps).foreach { r =>
      println(s"=== rep $r ===")
      collecting = true
      val t0 = System.nanoTime()
      fn(s, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(200) // let listener drain
      println(f"TOTAL $name $sec%.3f s")
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      s.sharedState.cacheManager.clearCache()
    }
    s.stop()
  }
}
