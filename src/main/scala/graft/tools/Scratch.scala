package graft.tools

import graft.core.GraftSession

/** Dev-only scratch main for plan/perf experiments (sbt console does not
  * fork with the JDK17 add-opens flags; edit this and `runMain` instead).
  * Not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(4)
    println(s"spark=${s.version} queries=${graft.queries.Registry.all.size}")
    s.stop()
  }
}
