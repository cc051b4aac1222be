package graft.queries

import graft.core.Tables
import graft.streaming.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Streaming operators (SURVEY.md §2.2 Q21–Q23), run as REAL Structured
  * Streaming queries (file source → stateful transform → memory sink,
  * Trigger.AvailableNow) whose terminal results are deterministic and
  * oracle-checkable. Watermark/late-data semantics and restart recovery are
  * exercised in StreamingSpec (they need crafted late rows / kill-restart,
  * not expressible as a DuckDB query).
  */
object StreamingQueries {

  /** Stream the events parquet through a symlinked source directory (file
    * sources need directories), with the raw nanos `ts` converted exactly as
    * [[Tables.events]] does. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
    val srcDir = tmp.resolve("src")
    java.nio.file.Files.createDirectories(srcDir)
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    s.readStream.schema(schema).parquet(srcDir.toString)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  private def runToMemory(df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  val all: Seq[QueryDef] = Seq(

    // Q21: streaming tumbling-window aggregation with watermark. Complete
    // mode => the terminal state covers every window, so the oracle is the
    // full batch aggregation (watermark state-drop behavior is asserted
    // separately in StreamingSpec with crafted late rows).
    QueryDef(
      "q21_stream_window",
      (s, dir) => {
        val agg = Ingest.windowedCounts(
          eventsStream(s, dir), tsCol = "ts", watermark = "2 hours", windowDuration = "1 hour")
        runToMemory(agg, "complete")
          .select(
            unix_micros(col("w_start")).as("w_start_us"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("w_start_us", "event_type")
      },
      Some("""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w_start_us, event_type,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY w_start_us, event_type""".stripMargin)),

    // Q22: session windows (30-minute gap) per user — batch session_window
    // (same operator Structured Streaming uses; its streaming form is
    // exercised in StreamingSpec). Oracle reconstructs sessions with the
    // classic lag + cumulative-flag rewrite in exact integer micros.
    QueryDef(
      "q22_session_window",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(30, 10))).cast("double").as("sum_value"))
          .select(
            col("user_id"),
            unix_micros(col("w.start")).as("s_start_us"),
            unix_micros(col("w.end")).as("s_end_us"),
            col("n"), col("sum_value"))
          .orderBy("user_id", "s_start_us"),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
             |m AS (SELECT user_id, us, value,
             |             CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
             |                    OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
             |                  THEN 1 ELSE 0 END AS new_s
             |      FROM e),
             |s AS (SELECT user_id, us, value,
             |             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
             |                              ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM m)
             |SELECT user_id, min(us) AS s_start_us, max(us) + 1800000000 AS s_end_us,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sum_value
             |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start_us""".stripMargin)),

    // Q23: streaming stateful LWW upsert (flatMapGroupsWithState, Update
    // mode) — the incremental changelog collapse. The final update per key
    // equals the batch collapse; tombstoned keys are dropped on read.
    QueryDef(
      "q23_stream_upsert",
      (s, dir) => {
        val raw = eventsStream(s, dir)
        val updates = runToMemory(Ingest.streamingUpsert(raw), "update")
        val collapsed = updates
          .groupBy("user_id", "event_type")
          .agg(max_by(
            struct(col("last_seq"), col("last_value"), col("is_delete")),
            col("last_seq")).as("x"))
          .select(
            col("user_id"), col("event_type"),
            col("x.last_seq").as("last_seq"),
            col("x.last_value").as("last_value"),
            col("x.is_delete").as("is_delete"))
        collapsed.filter(!col("is_delete"))
          .drop("is_delete")
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id AS last_seq, value AS last_value
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
             |                                   ORDER BY event_id DESC) AS rn
             |      FROM events) t
             |WHERE rn = 1 AND NOT (event_id % 10 = 0)
             |ORDER BY user_id, event_type""".stripMargin))
  )
}
