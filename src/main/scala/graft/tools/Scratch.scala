package graft.tools

import graft.core.GraftSession
import graft.streaming.Ingest
import org.apache.spark.sql.functions._

/** Dev-only scratch main; not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(4)
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe_").toString
    // 3-file source -> maxFilesPerTrigger=1 -> 3 micro-batches
    s.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartition(3).write.parquet(s"$tmp/src")
    val schema = s.read.parquet(s"$tmp/src").schema

    def ingest(): Unit = {
      val q = Ingest.startChangelogIngest(
        s, s"$tmp/src", schema, s"$tmp/sink", s"$tmp/ckpt",
        orderCols = Seq("event_id"), maxFilesPerTrigger = Some(1))
      q.awaitTermination()
    }

    ingest()
    val sink1 = s.read.parquet(s"$tmp/sink")
    val n1 = sink1.count()
    val batches = sink1.select("batch_id").distinct().count()
    val seqStats = sink1.agg(min("seq"), max("seq"), countDistinct("seq")).head()
    println(s"PROBE1 rows=$n1 batches=$batches seqMin=${seqStats.get(0)} seqMax=${seqStats.get(1)} seqDistinct=${seqStats.get(2)}")
    // within each batch (one group commit), seq order must follow the
    // declared order columns (event_id); across batches seq tracks arrival
    // order, mirroring the reference's write-order sequencing
    val misordered = sink1.select("batch_id", "event_id", "seq").collect()
      .groupBy(_.getInt(0)).values.map { rows =>
        rows.sortBy(_.getLong(1)).sliding(2)
          .count(p => p.length == 2 && p(1).getLong(2) <= p(0).getLong(2))
      }.sum
    println(s"PROBE1b withinBatchMisordered=$misordered (expect 0)")

    // idempotent re-run: same checkpoint, no new files -> nothing changes
    ingest()
    val n2 = s.read.parquet(s"$tmp/sink").count()
    println(s"PROBE2 rowsAfterRerun=$n2 (expect $n1)")

    // crash replay: drop the last commit marker, restart -> batch replayed,
    // same seqs, no duplicates
    val commits = new java.io.File(s"$tmp/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val before = s.read.parquet(s"$tmp/sink").select("event_id", "seq")
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val crc = new java.io.File(commits.last.getParentFile, s".${commits.last.getName}.crc")
    commits.last.delete()
    if (crc.exists()) crc.delete()
    ingest()
    val after = s.read.parquet(s"$tmp/sink").select("event_id", "seq")
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"PROBE3 rowsAfterReplay=${after.length} identicalToBefore=${before.sameElements(after)}")
    s.stop()
  }
}
