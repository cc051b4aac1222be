package graft.tools

import graft.core.GraftSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for registered queries to files — the
  * round's plan-evidence artifacts (plans/r<N>/<query>_<tag>.txt). A
  * dedicated main so before/after plan claims in OPTIMIZATION_r*.md are
  * mechanically reproducible.
  *
  * Usage: tools/run_probe.sh graft.tools.PlanDump <outDir> <tag> [sfDir] [query...]
  * (no query args = every registered query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val only: Set[String] = args.drop(3).toSet
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val s = GraftSession.local(cpus)
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(s, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
          println(s"PLAN $name -> $outDir/${name}_$tag.txt")
        } catch {
          case e: Throwable => System.err.println(s"PLAN $name FAILED: ${e.getMessage}")
        }
      }
    s.stop()
  }
}
