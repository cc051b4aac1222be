package graft.tools

import graft.core.{Changelog, ChangelogSpec, GraftSession, Tables}

/** Dev-only scratch main; not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(4)
    val spec = ChangelogSpec(Seq("user_id", "event_type"), "event_id", Some("is_delete"))
    val df = Changelog.collapseWindowed(Tables.events(s, "/root/testdata/sf0.001"), spec, 1)
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.toString.take(2500))
    s.stop()
  }
}
