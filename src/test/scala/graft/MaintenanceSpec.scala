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
}
