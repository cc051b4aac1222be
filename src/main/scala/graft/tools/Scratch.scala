package graft.tools

import graft.core.GraftSession

/** Dev-only scratch main; not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(4)
    // the driver's smoke check: entry(spark) must return rows > 0 on sf0.001
    val n = graft.SparkEntry.entry(s).count()
    println(s"SMOKE entry rows=$n")
    // probe: every registered query must at least plan+run on sf0.001
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(s, "/root/testdata/sf0.001").collect(); None }
      catch { case e: Throwable => Some(name -> e.getMessage.take(120)) }
    }
    println(s"SMOKE sf0.001 failures=${bad.size}")
    bad.foreach { case (n, m) => println(s"  FAIL $n: $m") }
    s.stop()
  }
}
