package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog semantics — the reference's signature operator set.
  *
  * The reference models a table as an ordered map with MVCC versions: each
  * write is `(user_key, seq, type, value)` where `type` is value-or-tombstone
  * (reference: kv/db/dbformat.h:49-101), reads at snapshot `S` see, per user
  * key, the newest version with `seq <= S`, and tombstoned keys disappear
  * (reference: kv/db/db_iter.cpp:191-228). Here a changelog is any DataFrame
  * with key columns, a unique monotone `seq` column, and an optional boolean
  * tombstone column.
  *
  * Scale design: `collapse` is implemented with `max_by(struct, seq)` — a hash
  * aggregation with map-side partial aggregation — rather than a window
  * `row_number() = 1`, because the aggregate form shrinks data before the
  * shuffle (each map task emits one candidate row per key instead of all
  * versions). At 100 TB of changelog with hot keys this is the difference
  * between shuffling the full history and shuffling ~|keys| rows.
  */
final case class ChangelogSpec(
    keyCols: Seq[String],
    seqCol: String,
    deleteCol: Option[String] = None)

object Changelog {

  /** Newest row per key (last-write-wins), tombstoned keys removed.
    * Mirrors the collapse rule applied in the reference's read path and
    * compaction (kv/db/db_iter.cpp:199-222, kv/db/db_impl.cpp:1113-1130). */
  def collapse(df: DataFrame, spec: ChangelogSpec): DataFrame = {
    val nonKey = df.columns.filterNot(spec.keyCols.contains)
    val keep = df
      .groupBy(spec.keyCols.map(col): _*)
      .agg(max_by(struct(nonKey.map(col): _*), col(spec.seqCol)).as("_newest"))
      .select(spec.keyCols.map(col) ++ nonKey.map(c => col(s"_newest.$c")): _*)
    // null delete flags are LIVE (!coalesce, not a bare negation): a
    // nullable flag column where null means "not deleted" — the common
    // CDC shape — must never silently destroy rows, and
    // Maintenance.needsCompaction already treats null as not-a-tombstone,
    // so a bare !col(d) would make the compaction gate and the rewrite
    // disagree on the same data
    spec.deleteCol.fold(keep)(d => keep.filter(!coalesce(col(d), lit(false))))
  }

  /** Collapse as of snapshot `seq <= snapshot` (reference snapshot reads,
    * kv/db/snapshot.h:13-32: a snapshot is just a pinned sequence number). */
  def collapseAt(df: DataFrame, spec: ChangelogSpec, snapshot: Long): DataFrame =
    collapse(df.filter(col(spec.seqCol) <= snapshot), spec)

  /** Window-based collapse variant (kept for plans that need the full row
    * ordering, e.g. "newest k versions"); prefer [[collapse]] for k = 1. */
  def collapseWindowed(df: DataFrame, spec: ChangelogSpec, k: Int = 1): DataFrame = {
    // the helper column name is reserved (the AsOf.join discipline): a
    // caller's same-named column would be silently overwritten and then
    // dropped from the output
    require(!df.columns.contains("_rn"),
      "collapseWindowed: input must not carry a '_rn' column (reserved helper name)")
    val w = Window
      .partitionBy(spec.keyCols.map(col): _*)
      .orderBy(col(spec.seqCol).desc)
    val ranked = df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
    spec.deleteCol.fold(ranked)(d => ranked.filter(!coalesce(col(d), lit(false)))) // null flag = live (see collapse)
  }

  /** Point lookup at a snapshot: the reference's `DB::Get`
    * (kv/db/db_impl.cpp:1292-1349). Filters are pushed to the scan; at scale
    * this prunes files by parquet min/max exactly as the reference prunes
    * SSTables by manifest key ranges. */
  def pointGet(
      df: DataFrame,
      spec: ChangelogSpec,
      keyPredicate: Column,
      snapshot: Long): DataFrame =
    collapseAt(df.filter(keyPredicate), spec, snapshot)

  /** Ordered range scan over the collapsed view — the reference's iterator
    * with `Range{start inclusive, limit exclusive}` (kv/include/db.h:29-36).
    * `reverse = true` mirrors SeekToLast/Prev (kv/db/db_iter.cpp:230-314). */
  def rangeScan(
      df: DataFrame,
      spec: ChangelogSpec,
      rangePredicate: Column,
      orderCols: Seq[String],
      reverse: Boolean = false): DataFrame = {
    val scanned = collapse(df.filter(rangePredicate), spec)
    val ord = orderCols.map(c => if (reverse) col(c).desc else col(c).asc)
    scanned.orderBy(ord: _*)
  }

  /** Compaction rewrite (reference: DoCompactionWork drop rules,
    * kv/db/db_impl.cpp:1113-1130). Given the oldest live snapshot `retention`,
    * the compacted changelog keeps:
    *   - every row with `seq > retention` (still visible to some snapshot), and
    *   - per key, the newest row with `seq <= retention` unless it is a
    *     tombstone (a tombstone that is newest at the horizon shadows only
    *     rows we are already dropping, so it is GC'd too — the reference's
    *     base-level tombstone drop, kv/db/version_set.cpp:1790-1814).
    * Every read at any snapshot >= retention gives identical results on the
    * compacted data. */
  def compact(df: DataFrame, spec: ChangelogSpec, retention: Long): DataFrame = {
    val newer = df.filter(col(spec.seqCol) > retention)
    val baseSpec = spec.copy(deleteCol = None)
    val base = collapseAt(df, baseSpec, retention)
    val baseLive = spec.deleteCol.fold(base)(d => base.filter(!coalesce(col(d), lit(false)))) // null flag = live
    baseLive.unionByName(newer)
  }

  /** Approximate per-bucket size stats — the reference's
    * `GetApproximateSizes` (kv/db/db_impl.cpp:1699-1717) generalized to
    * key-range buckets: row counts plus approximate serialized bytes. */
  def approximateSizes(
      df: DataFrame,
      bucketExpr: Column,
      byteExpr: Column): DataFrame =
    df.groupBy(bucketExpr.as("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(byteExpr).as("approx_bytes"))
      .orderBy(col("bucket"))
}
