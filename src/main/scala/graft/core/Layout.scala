package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical layout management — the engine's answer to the reference's
  * sorted, non-overlapping SSTable runs (kv/table/table_builder.cpp): tables
  * that will be joined repeatedly on the same key are written BUCKETED and
  * sorted by that key, so every co-bucketed join reads both sides without
  * any Exchange (no shuffle at all) — at 100 TB the difference between a
  * metadata-aligned merge join and re-shuffling the fact table per query.
  */
object Layout {

  /** Write `df` as a bucketed+sorted catalog table. Joins between tables
    * bucketed the same way (same columns, same bucket count) skip the
    * shuffle entirely; sort order makes the merge join sort-free too. */
  def bucketize(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    val spark = df.sparkSession
    // unqualified names only: a "db.tbl" name would make the backtick-
    // wrapped DROP target one literal identifier and the stale-location
    // path below wrong — both silently
    require(!table.contains("."),
      s"bucketize: unqualified table name required, got '$table'")
    // idempotent rewrite: drop any previous catalog entry AND its location
    // (an in-memory catalog forgets tables across sessions while the
    // warehouse directory persists, which would fail the managed-table
    // location check). The location uses the LOWERCASED name — the
    // catalog's formatTableName does the same, so a mixed-case call
    // would otherwise delete a path that never existed and leave the
    // real stale directory to fail saveAsTable.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/${table.toLowerCase(java.util.Locale.ROOT)}")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketized table back. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
