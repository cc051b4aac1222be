package graft.tools

import graft.core.{Changelog, GraftSession, Maintenance, Tables}

/** Dev-only scratch main; not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(4)
    val tmp = java.nio.file.Files.createTempDirectory("graft_v3_").toString

    // surface: maintenance compaction job over a real changelog dir
    Tables.events(s, "/root/testdata/sf0.01").write.parquet(s"$tmp/log")
    val n0 = s.read.parquet(s"$tmp/log").count()
    val w = Maintenance.compactTable(s, s"$tmp/log", s"$tmp/out", Tables.eventsSpec, retention = 5000L)
    println(s"PROBE-M1 in=$n0 compactedRows=$w")
    val again = Maintenance.compactTable(s, s"$tmp/out", s"$tmp/out2", Tables.eventsSpec, retention = 5000L)
    println(s"PROBE-M2 trivialMoveSkip=${again == -1L}")
    val forced = Maintenance.compactTable(s, s"$tmp/out", s"$tmp/out3", Tables.eventsSpec, retention = 5000L, force = true)
    val same = s.read.parquet(s"$tmp/out3").orderBy("event_id").collect().map(_.toSeq).toSeq ==
      s.read.parquet(s"$tmp/out").orderBy("event_id").collect().map(_.toSeq).toSeq
    println(s"PROBE-M3 forcedRecompactIdentical=$same rows=$forced")
    // read-at-snapshot equality through the collapsed view
    val a = Changelog.collapseAt(s.read.parquet(s"$tmp/log"), Tables.eventsSpec, 8000L)
      .select("user_id", "event_type", "event_id").collect().map(_.toSeq).toSet
    val b = Changelog.collapseAt(s.read.parquet(s"$tmp/out"), Tables.eventsSpec, 8000L)
      .select("user_id", "event_type", "event_id").collect().map(_.toSeq).toSet
    println(s"PROBE-M4 snapshotReadUnchanged=${a == b} keys=${a.size}")

    // surface: the injected SQL function, happy path + wrong-type probe
    Tables.documents(s, "/root/testdata/sf0.001").createOrReplaceTempView("docs")
    val sh = s.sql(
      "SELECT graft_simhash64(transform(split(text, ' '), t -> xxhash64(t))) AS sh FROM docs LIMIT 3")
      .collect().map(_.getLong(0))
    println(s"PROBE-S1 sqlSimhash=${sh.mkString(",")}")
    try {
      s.sql("SELECT graft_simhash64(text) FROM docs LIMIT 1").collect()
      println("PROBE-S2 wrongType=NO-ERROR (bad)")
    } catch {
      case e: Exception => println(s"PROBE-S2 wrongTypeError=${e.getMessage.linesIterator.next().take(120)}")
    }
    s.stop()
  }
}
