package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming changelog ingest — the engine's write path.
  *
  * Maps the reference's write pipeline onto micro-batches:
  *   - a micro-batch = one group commit (reference: BuildBatchGroup,
  *     kv/db/db_impl.cpp:1486-1538 — concurrent writers' batches merged and
  *     committed by one leader);
  *   - sequence assignment: all rows of a batch get contiguous seqs stamped
  *     after the last committed seq (reference: WriteBatchInternal::SetSequence,
  *     kv/db/db_impl.cpp:1418-1424). `monotonically_increasing_id` is NOT
  *     contiguous, so seqs are `base + row_number() over (order by source
  *     order)` computed per batch;
  *   - durability/replay: the streaming checkpoint is the WAL+manifest
  *     (reference: kv/db/log_writer.cpp, version_set.cpp) — on restart the
  *     source replays from committed offsets, exactly-once into the sink.
  */
object Ingest {

  /** Start a file-source changelog ingest: reads parquet files appearing under
    * `sourceDir`, stamps contiguous seqs, appends to `sinkDir` as parquet.
    *
    * `orderCols` define the deterministic within-batch ordering used for seq
    * assignment (must be a total order on the batch, e.g. the upstream event
    * id). Returns the running query; callers stop it or await termination.
    */
  def startChangelogIngest(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      sinkDir: String,
      checkpointDir: String,
      orderCols: Seq[String],
      availableNow: Boolean = true,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)

    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // read the sink's current max seq — snapshot state must come from the
        // committed table, not driver memory (survives restarts)
        val base: Long =
          try {
            val prev = spark.read.parquet(sinkDir)
            if (prev.columns.contains("seq"))
              prev.agg(max(col("seq"))).head().getAs[Any](0) match {
                case null    => 0L
                case l: Long => l
              }
            else 0L
          } catch { case _: Throwable => 0L }
        val w = Window.orderBy(orderCols.map(col): _*)
        val stamped = batch
          .withColumn("seq", lit(base) + row_number().over(w).cast("long"))
          .withColumn("batch_id", lit(batchId))
        // sortWithinPartitions = the reference's sorted-run flush
        // (WriteLevel0Table, kv/db/db_impl.cpp:562-606)
        stamped
          .sortWithinPartitions(orderCols.map(col): _*)
          .write
          .mode("append")
          .parquet(sinkDir)
        ()
      }
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("1 second"))
      .start()
    q
  }

  /** Tumbling/sliding event-time window aggregation with watermark — the
    * streaming analogue of snapshot-horizon GC (reference smallest_snapshot,
    * kv/db/db_impl.cpp:1044-1051): state older than the watermark is dropped
    * exactly as versions below the oldest snapshot are GC'd. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      watermark: String,
      windowDuration: String,
      slideDuration: Option[String] = None): DataFrame = {
    val withWm = events.withWatermark(tsCol, watermark)
    val win = slideDuration
      .fold(window(col(tsCol), windowDuration))(s => window(col(tsCol), windowDuration, s))
    withWm
      .groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("w.start").as("w_start"),
        col("w.end").as("w_end"),
        col("event_type"),
        col("n"),
        col("sum_value"))
  }

  /** Per-key session windows (gap-based). */
  def sessionCounts(events: DataFrame, tsCol: String, watermark: String, gap: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s_start"), col("w.end").as("s_end"), col("n"))

  /** Streaming stateful dedup on key columns with watermark-bounded state —
    * the incremental form of the changelog collapse (keeps first occurrence;
    * reference: memtable+iterator dedup, kv/db/db_iter.cpp:199-222). */
  def streamingDedup(events: DataFrame, tsCol: String, watermark: String, keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicates(keyCols :+ tsCol)
}
