package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine introspection — the reference's `DB::GetProperty` /
  * `GetApproximateSizes` surface (kv/db/db_impl.cpp:1621-1717: per-level
  * file counts, sizes, read/write stats, memory usage) re-expressed as
  * catalog/metadata queries over the engine's tables.
  */
object Stats {

  /** Per-table storage stats: file count and on-disk bytes from the
    * filesystem (the manifest analogue — no data scan), plus exact row
    * counts (parquet footer metadata; Spark's count() never reads data
    * pages). The reference's `num-files-at-level<N>` + `stats` properties. */
  def tableStats(spark: SparkSession, sfDir: String, tables: Seq[String] = Tables.names): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(sfDir), spark.sparkContext.hadoopConfiguration)
    // existence FIRST: rowCounts eagerly resolves every path, so counting
    // before the per-table exists check would throw PATH_NOT_FOUND for a
    // directory that lacks one of the tables — the very case the
    // (0 files, 0 rows) branch below reports gracefully
    val present = tables.filter(t =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$sfDir/$t.parquet")))
    // ONE Spark job for all row counts (unioned per-table footer-metadata
    // aggregates), not a driver loop of N sequential count() jobs — same
    // answers, one scheduling round-trip
    val counts =
      if (present.isEmpty) Map.empty[String, Long]
      else rowCounts(spark, sfDir, present).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = tables.map { t =>
      val path = new org.apache.hadoop.fs.Path(s"$sfDir/$t.parquet")
      val (nFiles, bytes) =
        if (!fs.exists(path)) (0L, 0L)
        else {
          // hidden/marker files (_SUCCESS, .crc) are excluded — the same
          // convention as Maintenance.outputFootprint, so the two
          // GetProperty surfaces agree on file counts. listFiles on a
          // plain single-file table returns the file itself, so no
          // separate fallback is needed.
          val it = fs.listFiles(path, true)
          var n = 0L; var b = 0L
          while (it.hasNext) {
            val f = it.next()
            val name = f.getPath.getName
            if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
            { n += 1; b += f.getLen }
          }
          (n, b)
        }
      (t, nFiles, bytes, counts.getOrElse(t, 0L))
    }
    spark.createDataFrame(rows).toDF("table_name", "n_files", "bytes", "n_rows")
      .orderBy("table_name")
  }

  /** Exact row counts per table — the oracle-checkable slice of the stats
    * surface. Global (ungrouped) aggregates, NOT groupBy over a literal: a
    * grouped aggregate over an empty table yields zero rows, while the
    * oracle's scalar COUNT(*) yields one row with 0. */
  def rowCounts(spark: SparkSession, sfDir: String, tables: Seq[String] = Tables.names): DataFrame =
    tables.map(t =>
        Tables.load(spark, sfDir, t)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(t).as("table_name"), col("n_rows")))
      .reduce(_.unionByName(_))
      .orderBy("table_name")

  /** `GetProperty`-style key/value engine properties (versions + the
    * semantics-critical session confs). */
  def engineProperties(spark: SparkSession): Map[String, String] = Map(
    "graft.spark.version" -> spark.version,
    "graft.shuffle.partitions" -> spark.conf.get("spark.sql.shuffle.partitions"),
    "graft.aqe.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"),
    "graft.session.timezone" -> spark.conf.get("spark.sql.session.timeZone"),
    "graft.ansi.enabled" -> spark.conf.get("spark.sql.ansi.enabled"),
    "graft.broadcast.threshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
}
