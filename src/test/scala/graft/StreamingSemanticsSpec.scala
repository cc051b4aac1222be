package graft

import graft.streaming.Ingest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming semantics: watermark late-row drop (the snapshot-horizon GC
  * analogue, kv/db/db_impl.cpp:1044-1051), session gap behavior, stateful
  * LWW upsert across micro-batches, and checkpoint restart recovery
  * (the recovery_test.cpp:184-380 analogue).
  */
class StreamingSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  case class Ev(user_id: Long, event_type: String, event_id: Long, value: Double, ts: Timestamp)

  test("watermark drops rows later than the horizon (append-mode window agg)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = Ingest.windowedCounts(mem.toDF(), "ts", watermark = "30 minutes", windowDuration = "1 hour")
    val name = "wm_test_sink"
    val q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1: rows in hour-0 and hour-2 -> watermark advances to 2h50m-30m
      mem.addData(Ev(1, "click", 1, 1.0, ts(10)), Ev(1, "click", 2, 1.0, ts(170)))
      q.processAllAvailable()
      // batch 2: a late row in hour-0 (before watermark) must be DROPPED,
      // a row in hour-2 (open window) must be kept
      mem.addData(Ev(1, "click", 3, 100.0, ts(20)), Ev(1, "click", 4, 7.0, ts(175)))
      q.processAllAvailable()
      // batch 3: advance watermark far so hour-2 closes and emits
      mem.addData(Ev(1, "click", 5, 1.0, ts(600)))
      q.processAllAvailable()
      val out = spark.table(name).select("w_start", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1), r.getDouble(2))).toSet
      // hour-0 window: only the on-time row (late event_id=3 dropped);
      // hour-2 window: both rows
      assert(out.contains((0L, 1L, 1.0)), s"hour-0 must have exactly the on-time row: $out")
      assert(out.contains((120L, 2L, 8.0)), s"hour-2 must contain both rows: $out")
    } finally q.stop()
  }

  test("session windows merge by gap and split beyond it (streaming)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sess = Ingest.sessionCounts(mem.toDF(), "ts", watermark = "10 minutes", gap = "30 minutes")
    val name = "sess_test_sink"
    val q = sess.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // user 1: rows at 0, 29, 58 chain into ONE session (each gap < 30m);
      // row at 120 starts a second session. user 2: single row.
      mem.addData(
        Ev(1, "a", 1, 0, ts(0)), Ev(1, "a", 2, 0, ts(29)), Ev(1, "a", 3, 0, ts(58)),
        Ev(1, "a", 4, 0, ts(120)), Ev(2, "a", 5, 0, ts(5)))
      q.processAllAvailable()
      mem.addData(Ev(9, "a", 9, 0, ts(2000))) // advance watermark, close sessions
      q.processAllAvailable()
      val out = spark.table(name).select("user_id", "s_start", "s_end", "n").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000,
          r.getTimestamp(2).getTime / 60000, r.getLong(3))).toSet
      assert(out.contains((1L, 0L, 88L, 3L)), s"chained session 0..58+30: $out")
      assert(out.contains((1L, 120L, 150L, 1L)), s"second session: $out")
      assert(out.contains((2L, 5L, 35L, 1L)), s"user-2 session: $out")
    } finally q.stop()
  }

  test("streaming LWW upsert: newest seq wins across micro-batches, tombstones tracked") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = "upsert_test_sink"
    val q = Ingest.streamingUpsert(mem.toDF(), isDelete = expr("event_id % 10 = 0"))
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      // seq%10==0 is the synthesized tombstone rule
      mem.addData(Ev(1, "a", 5, 1.0, ts(0)), Ev(1, "a", 3, 9.0, ts(1))) // max 5 wins
      q.processAllAvailable()
      mem.addData(Ev(1, "a", 4, 2.0, ts(2))) // stale: no emission
      q.processAllAvailable()
      mem.addData(Ev(1, "a", 20, 3.0, ts(3))) // tombstone (20%10==0)
      q.processAllAvailable()
      val updates = spark.table(name)
        .select("user_id", "event_type", "last_seq", "last_value", "is_delete").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      assert(updates.toSeq.sortBy(_._3) == Seq(
        (1L, "a", 5L, 1.0, false),
        (1L, "a", 20L, 3.0, true)), s"got ${updates.toSeq}")
    } finally q.stop()
  }

  test("streamingDedup keeps first occurrence per key with watermark-expirable state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dedup = Ingest.streamingDedup(
      mem.toDF(), tsCol = "ts", watermark = "30 minutes", keyCols = Seq("user_id", "event_type"))
    val name = "dedup_test_sink"
    val q = dedup.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      mem.addData(
        Ev(1, "a", 1, 1.0, ts(0)), Ev(1, "a", 2, 2.0, ts(5)), // dup within watermark -> dropped
        Ev(2, "a", 3, 3.0, ts(1)))
      q.processAllAvailable()
      mem.addData(Ev(1, "a", 4, 4.0, ts(6))) // still duplicate (cross-batch state)
      q.processAllAvailable()
      val out = spark.table(name).select("event_id").collect().map(_.getLong(0)).toSet
      // within one micro-batch the surviving duplicate is arbitrary (no
      // intra-batch ordering guarantee); the contract is one row per key and
      // cross-batch suppression
      assert(out.size == 2 && out.contains(3L), s"one row per key: $out")
      assert(out.intersect(Set(1L, 2L)).size == 1, s"exactly one of the key-1 dups: $out")
      assert(!out.contains(4L), s"cross-batch duplicate must be dropped: $out")
    } finally q.stop()
  }

  test("backpressure: a file flood drains as multiple bounded micro-batches (L0-throttle analogue)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bp_").toString
    // 8 source files, cap 3 per trigger -> AvailableNow must commit the
    // backlog as ceil(8/3) = 3 bounded batches, never one giant one
    spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .repartition(8).write.parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    val g = new Graft(spark, TestSpark.Sf0001)
    val q = g.ingest(s"$tmp/src", schema, s"$tmp/sink", s"$tmp/ckpt",
      orderCols = Seq("event_id"), spec = graft.core.Tables.eventsSpec,
      maxFilesPerTrigger = Some(3))
    q.awaitTermination()

    val marks = new java.io.File(s"$tmp/ckpt/graft-marks").listFiles()
      .filter(_.getName.forall(_.isDigit))
      .map { f =>
        val Array(batchId, base, count) =
          new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.split(" ")
        (batchId.toLong, base.toLong, count.toLong)
      }.sortBy(_._1)
    assert(marks.length == 3, s"8 files / cap 3 must give 3 micro-batches: ${marks.toSeq}")
    assert(marks.forall(_._3 > 0) && marks.forall(_._3 < 1000),
      s"every batch bounded below the full input: ${marks.toSeq}")
    // seqs contiguous ACROSS batch boundaries: each base = previous base+count
    marks.sliding(2).foreach { case Array((_, b1, c1), (_, b2, _)) =>
      assert(b2 == b1 + c1, s"batch bases must chain contiguously: ${marks.toSeq}")
    }
    val seqs = Ingest.readCommitted(spark, s"$tmp/sink", s"$tmp/ckpt")
      .select("seq").collect().map(_.getLong(0))
    assert(seqs.length == 1000 && seqs.toSet == (1L to 1000L).toSet,
      "global seq sequence contiguous 1..N across all bounded batches")
  }

  test("ingest recovers from checkpoint restart with identical seqs (recovery_test analogue)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rec_").toString
    spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .repartition(3).write.parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    def run(): Unit = {
      val q = Ingest.startChangelogIngest(
        spark, s"$tmp/src", schema, s"$tmp/sink", s"$tmp/ckpt",
        orderCols = Seq("event_id"), maxFilesPerTrigger = Some(1))
      q.awaitTermination()
    }
    run()
    val before = spark.read.parquet(s"$tmp/sink").select("event_id", "seq")
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(before.length == 1000)
    assert(before.map(_._2).toSet == (1L to 1000L).toSet, "seqs contiguous 1..N")
    // simulate crash after data write but before checkpoint commit: remove
    // the last commit marker (and its local-FS crc sibling), restart
    val commits = new java.io.File(s"$tmp/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val last = commits.last
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    last.delete(); if (crc.exists()) crc.delete()
    run()
    val after = spark.read.parquet(s"$tmp/sink").select("event_id", "seq")
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(before.sameElements(after), "replayed batch must be byte-identical (exactly-once)")
  }

  test("repairMarks rebuilds lost high-water metadata from sink footers (RepairDB analogue)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_repair_").toString
    spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .repartition(3).write.parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    val q = Ingest.startChangelogIngest(
      spark, s"$tmp/src", schema, s"$tmp/sink", s"$tmp/ckpt",
      orderCols = Seq("event_id"), maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    val before = Ingest.readCommitted(spark, s"$tmp/sink", s"$tmp/ckpt")
      .select("event_id", "seq").orderBy("event_id").collect().map(_.toSeq)
    // lose the marks entirely
    val marks = new java.io.File(s"$tmp/ckpt/graft-marks")
    marks.listFiles().foreach(_.delete())
    intercept[IllegalArgumentException](Ingest.readCommitted(spark, s"$tmp/sink", s"$tmp/ckpt"))
    val repaired = Ingest.repairMarks(spark, s"$tmp/sink", s"$tmp/ckpt")
    assert(repaired == 3)
    val after = Ingest.readCommitted(spark, s"$tmp/sink", s"$tmp/ckpt")
      .select("event_id", "seq").orderBy("event_id").collect().map(_.toSeq)
    assert(before.toSeq == after.toSeq, "repaired marks must restore the exact committed view")
    // destroy removes everything
    Ingest.destroy(spark, s"$tmp/sink", s"$tmp/ckpt")
    assert(!new java.io.File(s"$tmp/sink").exists() && !new java.io.File(s"$tmp/ckpt").exists())
  }

  test("readCommitted hides batch directories without a committed mark (manifest rule)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mani_").toString
    spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .repartition(2).write.parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    val q = Ingest.startChangelogIngest(
      spark, s"$tmp/src", schema, s"$tmp/sink", s"$tmp/ckpt",
      orderCols = Seq("event_id"), maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    assert(Ingest.readCommitted(spark, s"$tmp/sink", s"$tmp/ckpt").count() == 1000)
    // simulate a crashed writer: a data directory exists but its mark does not
    val marks = new java.io.File(s"$tmp/ckpt/graft-marks")
    // only digit-named files are marks (hadoop local FS adds .crc siblings)
    val highest = marks.listFiles()
      .filter(_.getName.forall(_.isDigit)).map(_.getName.toLong).max
    val crc = new java.io.File(marks, s".$highest.crc")
    new java.io.File(marks, highest.toString).delete(); if (crc.exists()) crc.delete()
    val visible = Ingest.readCommitted(spark, s"$tmp/sink", s"$tmp/ckpt")
    assert(visible.count() < 1000, "uncommitted batch must be invisible")
    assert(visible.select("batch_id").distinct().count() == highest,
      "only committed batch dirs are readable")
  }
}
