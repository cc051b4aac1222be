package graft

import graft.core.{Changelog, ChangelogSpec, Maintenance, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** The compaction maintenance job: rewrite preserves every read at
  * snapshot >= retention, and the trivial-move check skips already-compact
  * data (the recovery_test / autocompact_test territory of the reference).
  */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val spec = Tables.eventsSpec

  test("compactTable rewrite preserves reads at snapshots >= retention; recompaction is a no-op") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_maint_").toString
    // materialize the raw changelog (events with synthesized tombstones)
    Tables.events(spark, TestSpark.Sf0001).write.parquet(s"$tmp/log")
    val retention = 500L

    val written = Maintenance.compactTable(spark, s"$tmp/log", s"$tmp/compacted", spec, retention)
    assert(written > 0, "fixture has tombstones below the horizon, must compact")

    val original = spark.read.parquet(s"$tmp/log")
    val compacted = spark.read.parquet(s"$tmp/compacted")
    assert(compacted.count() < original.count(), "compaction must drop shadowed/tombstoned rows")

    for (snap <- Seq(retention, 700L, 1000L)) {
      def state(df: org.apache.spark.sql.DataFrame) =
        Changelog.collapseAt(df, spec, snap)
          .select("user_id", "event_type", "event_id", "value")
          .collect().map(_.toSeq).toSet
      assert(state(compacted) == state(original), s"read at snapshot $snap must be unchanged")
    }

    // compacted output at the same horizon: nothing left to do (trivial move)
    val second = Maintenance.compactTable(spark, s"$tmp/compacted", s"$tmp/again", spec, retention)
    assert(second == -1L, "recompaction at the same horizon must be skipped")
  }

  test("compactRange rewrites only intersecting files; out-of-range files byte-identical (CompactRange analogue)") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cr_").toString
    val retention = 500L
    // two far-apart key clusters, range-partitioned into key-disjoint files:
    // cluster A (user_id <= 50) intersects the compaction range, cluster B
    // (user_id >= 1001) does not
    val events = Tables.events(spark, TestSpark.Sf0001)
    val shifted = events.filter(col("user_id") >= 25)
      .withColumn("user_id", col("user_id") + lit(1000L))
    events.filter(col("user_id") <= 50).coalesce(1).write.parquet(s"$tmp/log")
    shifted.coalesce(1).write.mode("append").parquet(s"$tmp/log")

    val metrics = Maintenance.compactRangeMetrics(
      spark, s"$tmp/log", s"$tmp/out", spec, retention, lo = 0L, hi = 500L)
    assert(metrics.nonEmpty, "range holds tombstones below the horizon, must compact")
    val written = metrics.get.rowsWritten
    assert(written > 0)
    // job metrics: exactly one trivial-move copy (the B-cluster file), at
    // least one rewritten file, nonzero output bytes
    assert(metrics.get.filesCopied == 1L)
    assert(metrics.get.filesProduced >= 1L)
    assert(metrics.get.bytesWritten > 0L)

    val original = spark.read.parquet(s"$tmp/log")
    val out = spark.read.parquet(s"$tmp/out")

    // the B-cluster file must be copied BYTE-IDENTICAL (same name, same bytes)
    def filesOf(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(f => f.getName -> f).toMap
    val inFiles = filesOf(s"$tmp/log")
    val outFiles = filesOf(s"$tmp/out")
    val copied = inFiles.keySet.intersect(outFiles.keySet)
    assert(copied.size == 1, s"exactly the non-intersecting file is carried over: $copied")
    copied.foreach { name =>
      val a = java.nio.file.Files.readAllBytes(inFiles(name).toPath)
      val b = java.nio.file.Files.readAllBytes(outFiles(name).toPath)
      assert(java.util.Arrays.equals(a, b), s"$name must be byte-identical")
    }

    // out-of-range history is fully preserved (B cluster not compacted)
    assert(
      out.filter(col("user_id") >= 1000).count() ==
        original.filter(col("user_id") >= 1000).count(),
      "out-of-range rows must not be dropped")
    // in-range side actually compacted
    assert(
      out.filter(col("user_id") < 1000).count() <
        original.filter(col("user_id") < 1000).count(),
      "in-range shadowed/tombstoned rows must be dropped")

    // every read at snapshot >= retention unchanged
    for (snap <- Seq(retention, 800L)) {
      def state(df: org.apache.spark.sql.DataFrame) =
        Changelog.collapseAt(df, spec, snap)
          .select("user_id", "event_type", "event_id", "value")
          .collect().map(_.toSeq).toSet
      assert(state(out) == state(original), s"read at snapshot $snap must be unchanged")
    }
  }

  test("compactTable writes parquet bloom filters on the key columns (file-skip parity)") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloom_").toString
    // High-cardinality keys: with few distinct keys parquet encodes the whole
    // chunk from the dictionary and (correctly) omits the bloom filter — the
    // dictionary already serves as an exact membership filter. The bloom
    // filter matters exactly when the dictionary falls back to plain
    // encoding, so that is the case under test.
    val highCard = ChangelogSpec(Seq("k"), "seq")
    spark.range(300000).select(
      xxhash64(col("id")).as("k"),
      col("id").as("seq"),
      (col("id") * 1.5).as("value"))
      .write.parquet(s"$tmp/log")
    val written = Maintenance.compactTable(
      spark, s"$tmp/log", s"$tmp/compacted", highCard, retention = 300000L, force = true)
    assert(written == 300000L)
    val parts = new java.io.File(s"$tmp/compacted").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    parts.foreach { part =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
      try reader.getRowGroups.asScala.foreach { block =>
        val bloomReader = reader.getBloomFilterDataReader(block)
        val keyMeta = block.getColumns.asScala.find(_.getPath.toDotString == "k").get
        assert(bloomReader.readBloomFilter(keyMeta) != null,
          s"${part.getName}: bloom filter missing for key column 'k'")
        // non-key columns must NOT pay for a filter (also plain-encoded here)
        val other = block.getColumns.asScala.find(_.getPath.toDotString == "value").get
        assert(bloomReader.readBloomFilter(other) == null,
          "non-key column must not carry a bloom filter")
      } finally reader.close()
    }
    // the point-get read path over the bloom-filtered output is unchanged
    val someKey = spark.read.parquet(s"$tmp/compacted").select("k").head().getLong(0)
    val got = Changelog.pointGet(
      spark.read.parquet(s"$tmp/compacted"), highCard, col("k") === someKey, 300000L)
      .collect().map(_.toSeq).toSet
    val want = Changelog.pointGet(
      spark.read.parquet(s"$tmp/log"), highCard, col("k") === someKey, 300000L)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("bloom filters actually SKIP row groups on point gets (scan metrics, not presence)") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._

    val tmp = java.nio.file.Files.createTempDirectory("graft_bloomskip_").toString
    val highCard = ChangelogSpec(Seq("k"), "seq")
    spark.range(300000).select(
      xxhash64(col("id")).as("k"),
      col("id").as("seq"),
      (col("id") * 1.5).as("value"))
      .write.parquet(s"$tmp/log")
    // shrink the row-group size so each output file holds MANY row groups —
    // the unit the bloom filter must prove it skips
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", (64 * 1024).toString)
    try Maintenance.compactTable(
      spark, s"$tmp/log", s"$tmp/compacted", highCard, retention = 300000L, force = true)
    finally if (oldBlock == null) hconf.unset("parquet.block.size")
    else hconf.set("parquet.block.size", oldBlock)

    val parts = new java.io.File(s"$tmp/compacted").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val groupCount = parts.map { part =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.getAbsolutePath), hconf))
      try r.getRowGroups.size() finally r.close()
    }.sum
    assert(groupCount > 8, s"need many row groups to prove skipping, got $groupCount")

    // Probe key: absent, but INSIDE one row group's [min,max] — the output is
    // range-partitioned + sorted by k, so column stats alone skip every
    // OTHER group; only the bloom filter can skip the straddling one.
    val keys = spark.read.parquet(parts(parts.length / 2).getAbsolutePath)
      .select("k").collect().map(_.getLong(0)).sorted
    val probe = keys.sliding(2).collectFirst {
      case Array(a, b) if b - a > 1 => a + 1
    }.get

    // rows the scan node materializes = rows in row groups that survived
    // footer-level (stats/dictionary/bloom) pruning
    def scanned(build: => DataFrame): Long = {
      val df = build
      df.collect()
      val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, "expected a v1 parquet scan node")
      scans.map(_.metrics("numOutputRows").value).sum
    }

    val withBloom = scanned(
      spark.read.parquet(s"$tmp/compacted").filter(col("k") === probe))
    val statsOnly = scanned(
      spark.read
        .option("parquet.filter.bloom.enabled", "false")
        .option("parquet.filter.dictionary.enabled", "false")
        .parquet(s"$tmp/compacted").filter(col("k") === probe))
    val oldPushdown = spark.conf.get("spark.sql.parquet.filterPushdown")
    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    val noPushdown =
      try scanned(spark.read.parquet(s"$tmp/compacted").filter(col("k") === probe))
      finally spark.conf.set("spark.sql.parquet.filterPushdown", oldPushdown)

    assert(noPushdown == 300000L, s"pushdown off must read everything, read $noPushdown")
    assert(statsOnly > 0 && statsOnly < noPushdown,
      s"stats alone must leave the straddling row group unskipped ($statsOnly)")
    assert(withBloom == 0L,
      s"bloom must skip the row group stats cannot ($withBloom rows materialized)")
  }

  test("concurrent maintenance + mid-batch crash: compaction sees only committed batches, restart replays exactly") {
    import graft.streaming.Ingest
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ccrash_").toString
    spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .repartition(6).write.parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    val sinkSpec = ChangelogSpec(Seq("user_id", "event_type"), "seq")
    def run(): Unit = {
      val q = Ingest.startChangelogIngest(
        spark, s"$tmp/src", schema, s"$tmp/sink", s"$tmp/ckpt",
        orderCols = Seq("event_id"), maxFilesPerTrigger = Some(2))
      q.awaitTermination()
    }
    run() // 6 files / cap 2 -> batches 0,1,2 committed

    // CRASH batch 2 mid-write: lose its checkpoint commit marker, its mark,
    // and part of its data — the state an ingest killed between the sink
    // write and the mark commit leaves behind
    val commits = new java.io.File(s"$tmp/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val lastBatch = commits.last.getName.toInt
    commits.last.delete()
    val crc = new java.io.File(s"$tmp/ckpt/commits", s".$lastBatch.crc")
    if (crc.exists()) crc.delete()
    new java.io.File(s"$tmp/ckpt/graft-marks/$lastBatch").delete()
    val bDir = new java.io.File(s"$tmp/sink/batch_id=$lastBatch")
    bDir.listFiles().filter(_.getName.endsWith(".parquet")).take(1).foreach(_.delete())

    // manifest rule: the committed view hides the crashed batch entirely
    val s0 = Ingest.readCommitted(spark, s"$tmp/sink", s"$tmp/ckpt").drop("batch_id")
      .localCheckpoint() // pin the pre-restart view for post-restart compare
    val hw = s0.agg(max("seq")).head().getLong(0)
    val preCrash = s0.select("event_id", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(preCrash.size.toLong == hw && hw < 1000,
      s"crashed batch must be invisible: highwater $hw")

    // CONCURRENT maintenance while the sink is in the crashed state: the
    // compaction must capture exactly the committed prefix
    val written = Ingest.compactCommitted(
      spark, s"$tmp/sink", s"$tmp/ckpt", s"$tmp/compacted", sinkSpec,
      retention = hw, force = true)
    assert(written > 0)
    val compacted = spark.read.parquet(s"$tmp/compacted")
    assert(compacted.agg(max("seq")).head().getLong(0) <= hw,
      "no uncommitted (markless) rows may leak into the compacted output")
    def state(df: org.apache.spark.sql.DataFrame) =
      Changelog.collapseAt(df, sinkSpec, hw)
        .select("user_id", "event_type", "event_id", "seq")
        .collect().map(_.toSeq).toSet
    assert(state(compacted) == state(s0),
      "compaction of the committed view must preserve its collapsed state")

    // RESTART: the crashed batch replays with the same base (marks 0..B-1
    // intact) and overwrite makes the rewrite idempotent
    run()
    val after = Ingest.readCommitted(spark, s"$tmp/sink", s"$tmp/ckpt")
    val seqs = after.select("seq").collect().map(_.getLong(0))
    assert(seqs.length == 1000 && seqs.toSet == (1L to 1000L).toSet,
      "post-restart seqs must be contiguous 1..N: no losses, no duplicates")
    val prefixAfter = after.filter(col("seq") <= hw).select("event_id", "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefixAfter == preCrash,
      "replay must not disturb the committed prefix the compaction captured")
    // the pre-crash compacted output is a consistent snapshot of that prefix
    assert(state(compacted) == state(after.drop("batch_id").filter(col("seq") <= hw)),
      "the concurrent compaction remains a valid snapshot after the replay")
  }

  test("snapshot registry: refcounted floor semantics (GetSnapshot/ReleaseSnapshot)") {
    val reg = new graft.core.Snapshots
    assert(reg.retentionFloor(currentSeq = 900L) == 900L, "no snapshots -> latest seq")
    val a = reg.acquire(300L)
    val b = reg.acquire(500L)
    val a2 = reg.acquire(300L)
    assert(reg.oldestLive.contains(300L) && reg.retentionFloor(900L) == 300L)
    reg.release(a)
    assert(reg.retentionFloor(900L) == 300L, "second holder still pins 300")
    reg.release(a) // double release: must NOT free a2's pin
    assert(reg.retentionFloor(900L) == 300L, "double release is a no-op")
    reg.release(a2)
    assert(reg.retentionFloor(900L) == 500L)
    reg.release(b)
    assert(reg.retentionFloor(900L) == 900L && reg.openCount == 0)
  }

  test("compaction at the registry floor never changes reads at held snapshots (property)") {
    import graft.core.Snapshots
    import org.apache.spark.sql.functions._
    val df = Tables.events(spark, TestSpark.Sf0001).localCheckpoint()
    val maxSeq = df.agg(max(spec.seqCol)).head().getLong(0)
    def state(d: org.apache.spark.sql.DataFrame, snap: Long) =
      Changelog.collapseAt(d, spec, snap)
        .select("user_id", "event_type", "event_id", "value")
        .collect().map(_.toSeq).toSet

    val reg = new Snapshots
    val rnd = new scala.util.Random(7L)
    var held = Vector.empty[Snapshots.Handle]
    for (_ <- 1 to 8) {
      // random acquire/release traffic
      if (held.nonEmpty && rnd.nextBoolean()) {
        val i = rnd.nextInt(held.size)
        reg.release(held(i))
        held = held.patch(i, Nil, 1)
      } else {
        held :+= reg.acquire(1L + rnd.nextLong(maxSeq))
      }
      val floor = reg.retentionFloor(maxSeq)
      assert(held.forall(_.seq >= floor), "floor must bound every held snapshot")
      val compacted = Changelog.compact(df, spec, floor)
      held.foreach { h =>
        assert(state(compacted, h.seq) == state(df, h.seq),
          s"held snapshot ${h.seq} must read identically after compacting at floor $floor")
      }
    }
  }
}
