package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * One parquet file per table under the given sf directory. These are the
  * engine's "DBs" — the reference models a table as a persistent ordered map
  * (reference: kv/include/db.h:38-41); here each table is a columnar DataFrame
  * and ordering is declared per-query (`ORDER BY`), not physical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** Raw events: `ts` is a Long of nanos-since-epoch (the parquet file stores
    * TIMESTAMP(NANOS), which Spark reads via
    * `spark.sql.legacy.parquet.nanosAsLong=true`; see [[GraftSession]]). */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")

  /** Canonical events view: `ts` converted to a micros TimestampType by floor
    * division — the same truncation DuckDB applies when reading
    * TIMESTAMP(NANOS) parquet, so oracle comparisons line up exactly.
    *
    * This is the engine's changelog table (FIXTURES.md): user key =
    * `(user_id, event_type)`, seq = `event_id` (unique monotone, mirroring the
    * reference's SequenceNumber, kv/db/dbformat.h:63-67), payload =
    * `(value, props)`. The driver data has no tombstones, so deletes are
    * synthesized deterministically as `is_delete = event_id % 10 == 0`
    * (tombstones are ordinary typed records in the same stream in the
    * reference, kv/db/write_batch.cpp:5-7). */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir)
      // Integer division, NOT `/` (which is double division: nanos ~1.7e18
      // exceed double's 2^53 exact range, so floor(ts/1000) can be off by
      // 1us vs DuckDB's exact nanos->micros truncation). `ts_us` (micros
      // since epoch, = DuckDB's epoch_us(ts)) is kept alongside for exact
      // integer time arithmetic in range joins / frames.
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("is_delete", col("event_id") % 10 === 0)

  /** The changelog spec for [[events]]. */
  val eventsSpec: ChangelogSpec =
    ChangelogSpec(Seq("user_id", "event_type"), "event_id", Some("is_delete"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
