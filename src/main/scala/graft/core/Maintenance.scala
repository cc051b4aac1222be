package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance jobs over changelog tables — the reference's background
  * compaction driver (kv/db/db_impl.cpp:1031-1220) as explicit batch jobs.
  */
object Maintenance {

  /** Is there anything to compact at this horizon? Mirrors the reference's
    * trivial-move shortcut (no-merge promotion, kv/db/db_impl.cpp:843-861):
    * if no key has more than one version at-or-below the horizon and no
    * tombstone sits at-or-below it, a rewrite would be a byte-identical
    * copy — skip it. Both probes are LIMIT-1 existence checks. */
  def needsCompaction(df: DataFrame, spec: ChangelogSpec, retention: Long): Boolean = {
    val pre = df.filter(col(spec.seqCol) <= retention)
    val hasTombstone = spec.deleteCol.exists(d =>
      pre.filter(col(d)).limit(1).count() > 0)
    def hasShadowed =
      pre.groupBy(spec.keyCols.map(col): _*)
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .limit(1).count() > 0
    hasTombstone || hasShadowed
  }

  /** Compact a changelog parquet directory into `outDir`: apply
    * [[Changelog.compact]] at `retention`, range-partition by the user key
    * (the reference's sorted, non-overlapping output files,
    * kv/db/version_set.cpp:1816-1844), sort within partitions by
    * (key, seq), and bound output file sizes with `maxRecordsPerFile`
    * (the 2 MB output-split analogue). Returns the number of rows written,
    * or -1 if the trivial-move check found nothing to do. */
  def compactTable(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      spec: ChangelogSpec,
      retention: Long,
      maxRecordsPerFile: Long = 1L << 20,
      force: Boolean = false): Long = {
    val df = spark.read.parquet(inDir)
    if (!force && !needsCompaction(df, spec, retention)) return -1L
    val keys = spec.keyCols.map(col)
    val compacted = Changelog.compact(df, spec, retention)
      .repartitionByRange(keys: _*)
      .sortWithinPartitions(keys :+ col(spec.seqCol): _*)
    compacted.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(outDir)
    spark.read.parquet(outDir).count()
  }
}
