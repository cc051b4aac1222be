package graft

import graft.operators.Dedup
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-dedup index contract: classifying a new batch against a
  * persisted corpus index must equal running [[Dedup.exact]] over the whole
  * union — without the incremental path ever reading the corpus text. Also
  * covers the index lifecycle: append segments, merged read view, compaction
  * idempotence, and wide-key inference.
  */
class DedupIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** documents split by the id midpoint: corpus ids all sort before batch
    * ids — the appending-pipeline contract the operator documents. */
  private def split(): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val cut = docs.agg(expr("max(doc_id) div 2")).head().getLong(0)
    (docs.filter(col("doc_id") <= cut), docs.filter(col("doc_id") > cut))
  }

  private def rows(df: DataFrame): Set[(Long, Long, Long, Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet

  test("exactIncremental == exact over the union, restricted to batch rows") {
    val (corpus, batch) = split()
    val tmp = java.nio.file.Files.createTempDirectory("graft_dix_").toString
    Dedup.writeExactIndex(corpus, tmp)

    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = rows(Dedup.exact(corpus.unionByName(batch)))
      .filter(r => batchIds.contains(r._1))
    val inc = rows(Dedup.exactIncremental(batch, tmp))
    assert(inc == full, "incremental classification must equal the full recompute")
    assert(inc.nonEmpty)
  }

  test("append + merged read view == index rebuilt over the union") {
    val (corpus, batch) = split()
    val tmp = java.nio.file.Files.createTempDirectory("graft_dixapp_").toString
    val fullTmp = java.nio.file.Files.createTempDirectory("graft_dixfull_").toString
    Dedup.writeExactIndex(corpus, tmp)
    val appended = Dedup.appendToExactIndex(batch, tmp)
    assert(appended > 0L)
    Dedup.writeExactIndex(corpus.unionByName(batch), fullTmp)

    def view(p: String) = Dedup.readExactIndex(spark, p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(view(tmp) == view(fullTmp),
      "segment-merge view must equal a from-scratch rebuild")
  }

  test("classification is stable across successive appends") {
    // three generations: index gen0, append gen1, classify gen2 — equal to
    // the full recompute over all three (the steady-state pipeline loop)
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val gen0 = docs.filter(col("doc_id") <= c1)
    val gen1 = docs.filter(col("doc_id") > c1 && col("doc_id") <= c2)
    val gen2 = docs.filter(col("doc_id") > c2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_dixgen_").toString
    Dedup.writeExactIndex(gen0, tmp)
    Dedup.appendToExactIndex(gen1, tmp)

    val gen2Ids = gen2.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = rows(Dedup.exact(docs)).filter(r => gen2Ids.contains(r._1))
    assert(rows(Dedup.exactIncremental(gen2, tmp)) == full)
  }

  test("compaction folds segments without changing the merged view") {
    val (corpus, batch) = split()
    val tmp = java.nio.file.Files.createTempDirectory("graft_dixcmp_").toString
    Dedup.writeExactIndex(corpus, tmp)
    Dedup.appendToExactIndex(batch, tmp)
    val before = Dedup.readExactIndex(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val segsBefore = Dedup.exactIndexStats(spark, tmp)("graft.dedup.segments").toLong

    Dedup.compactExactIndex(spark, tmp)
    val after = Dedup.readExactIndex(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stats = Dedup.exactIndexStats(spark, tmp)
    assert(after == before, "compaction must not change the merged view")
    assert(stats("graft.dedup.segments").toLong <= segsBefore)
    assert(stats("graft.dedup.docs").toLong ==
      Tables.documents(spark, TestSpark.Sf0001).count())
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("minHashIncremental == minHashLsh over the union, pairs touching the batch") {
    // batch = shifted-id copies of a corpus slice, so cross-index pairs are
    // GUARANTEED to exist (jaccard 1.0) and the equality test has teeth
    val corpus = Tables.documents(spark, TestSpark.Sf0001)
    val batch = corpus.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 10000)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mhx_").toString
    Dedup.writeMinHashIndex(corpus, tmp, shingleN = 3, numHashes = 64, bands = 16)

    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = pairSet(
      Dedup.minHashLsh(corpus.unionByName(batch),
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5))
      .filter(p => batchIds.contains(p._1) || batchIds.contains(p._2))
    val inc = pairSet(Dedup.minHashIncremental(batch, tmp, threshold = 0.5))
    assert(inc == full, "incremental pair search must equal the full recompute")
    assert(inc.nonEmpty, "the shifted copies must surface as cross-index pairs")
    // every planted copy is found against its original
    val planted = batchIds.map(b => (b - 10000, b))
    assert(planted.forall(p => inc.exists(x => (x._1, x._2) == p)))
  }

  test("minHash index append keeps incremental search equal to full recompute") {
    val corpus = Tables.documents(spark, TestSpark.Sf0001)
    val gen1 = corpus.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 20000)
    val gen2 = corpus.filter(col("doc_id") % 3 === 0)
      .withColumn("doc_id", col("doc_id") + 40000)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mhxapp_").toString
    Dedup.writeMinHashIndex(corpus, tmp, shingleN = 3, numHashes = 64, bands = 16)
    assert(Dedup.appendToMinHashIndex(gen1, tmp) == gen1.count())

    val gen2Ids = gen2.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = pairSet(
      Dedup.minHashLsh(corpus.unionByName(gen1).unionByName(gen2),
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5))
      .filter(p => gen2Ids.contains(p._1) || gen2Ids.contains(p._2))
    assert(pairSet(Dedup.minHashIncremental(gen2, tmp, threshold = 0.5)) == full)
  }

  test("minHashIncremental after a replayed append emits each pair exactly once") {
    // crash-replay shape: appendToMinHashIndex(batch) committed, the job
    // died, and the retry re-classifies the same batch — each batch doc now
    // has signature rows in BOTH the index and the in-flight batch, which
    // must not multiply the verified pairs
    val corpus = Tables.documents(spark, TestSpark.Sf0001)
    val batch = corpus.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 10000)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mhxrp_").toString
    Dedup.writeMinHashIndex(corpus, tmp, shingleN = 3, numHashes = 64, bands = 16)
    val before = pairSet(Dedup.minHashIncremental(batch, tmp, threshold = 0.5))
    Dedup.appendToMinHashIndex(batch, tmp)
    val replayed = Dedup.minHashIncremental(batch, tmp, threshold = 0.5)
    assert(replayed.groupBy("doc_a", "doc_b").count().filter(col("count") > 1).count() == 0,
      "duplicated signature rows must not duplicate pair rows")
    assert(pairSet(replayed) == before,
      "replayed classification must equal the pre-append result")
  }

  test("simHashIncremental == simHashPairs over the union, pairs touching the batch") {
    val corpus = Tables.documents(spark, TestSpark.Sf0001)
    val batch = corpus.filter(col("doc_id") % 4 === 0)
      .withColumn("doc_id", col("doc_id") + 10000)
    val tmp = java.nio.file.Files.createTempDirectory("graft_shx_").toString
    Dedup.writeSimHashIndex(corpus, tmp)
    Dedup.appendToSimHashIndex(
      corpus.filter(col("doc_id") % 4 === 1).withColumn("doc_id", col("doc_id") + 20000), tmp)

    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val allDocs = corpus
      .unionByName(corpus.filter(col("doc_id") % 4 === 1).withColumn("doc_id", col("doc_id") + 20000))
      .unionByName(batch)
    val full = Dedup.simHashPairs(allDocs, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(p => batchIds.contains(p._1) || batchIds.contains(p._2)).toSet
    val inc = Dedup.simHashIncremental(batch, tmp, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(inc == full, "incremental simhash must equal the full recompute")
    // every planted identical copy is found at hamming 0
    val planted = batchIds.map(b => (b - 10000, b, 0))
    assert(planted.subsetOf(inc))
  }

  test("streaming dedup ingest keeps only first occurrences; crash replay is idempotent") {
    import org.apache.spark.sql.functions.lit
    val tmp = java.nio.file.Files.createTempDirectory("graft_dding_").toString
    val corpus = Tables.documents(spark, TestSpark.Sf0001)
    graft.operators.Dedup.writeExactIndex(corpus, s"$tmp/idx")
    val corpusText3 = corpus.filter(col("doc_id") === 3).select("text").head().getString(0)
    val corpusText7 = corpus.filter(col("doc_id") === 7).select("text").head().getString(0)

    import spark.implicits._
    // two source files; each becomes one micro-batch (maxFilesPerTrigger=1).
    // Only texts that never appeared (corpus, other batches, same batch)
    // may survive; batch processing order does not change the kept TEXT set.
    def writeSrc(name: String, rows: Seq[(Long, String)]): Unit = {
      rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/src_stage/$name")
      val dst = new java.io.File(s"$tmp/src"); dst.mkdirs()
      new java.io.File(s"$tmp/src_stage/$name").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(
          f.toPath, new java.io.File(dst, s"$name.parquet").toPath))
    }
    writeSrc("f1", Seq((1000L, corpusText3), (1001L, "a genuinely fresh document")))
    writeSrc("f2", Seq(
      (1002L, "a genuinely fresh document"), // cross-batch dup of 1001
      (1003L, "another fresh document"),
      (1004L, "another fresh document"),     // in-batch dup of 1003
      (1005L, corpusText7)))                 // corpus dup

    val schema = spark.read.parquet(s"$tmp/src").schema
    def run(): Unit = graft.streaming.Ingest.startDedupIngest(
      spark, s"$tmp/src", schema, s"$tmp/sink", s"$tmp/ckpt", s"$tmp/idx",
      maxFilesPerTrigger = Some(1)).awaitTermination()
    run()

    def sinkRows() = graft.streaming.Ingest
      .readCommitted(spark, s"$tmp/sink", s"$tmp/ckpt")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val kept = sinkRows()
    assert(kept.map(_._2) == Set("a genuinely fresh document", "another fresh document"),
      s"only never-seen texts survive: $kept")
    assert(kept.size == 2, s"one representative per fresh text: $kept")
    val stats = Dedup.exactIndexStats(spark, s"$tmp/idx")
    assert(stats("graft.dedup.docs").toLong == corpus.count() + 6,
      "index counts corpus + every streamed doc exactly once")

    // crash replay: drop the last streaming commit marker and restart —
    // the replayed batch must rewrite sink and index segment IDENTICALLY
    val commits = new java.io.File(s"$tmp/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val last = commits.last
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    last.delete(); if (crc.exists()) crc.delete()
    run()
    assert(sinkRows() == kept, "replayed batch must not change the kept set")
    assert(Dedup.exactIndexStats(spark, s"$tmp/idx")("graft.dedup.docs").toLong ==
      corpus.count() + 6, "replay must overwrite its segment, not append a duplicate")

    // a later file of ONLY duplicates: its batch keeps zero rows but still
    // commits (empty batch directory readable through readCommitted)
    writeSrc("f3", Seq((1006L, "a genuinely fresh document"), (1007L, corpusText3)))
    run()
    assert(sinkRows() == kept, "an all-duplicate batch adds nothing")
    assert(Dedup.exactIndexStats(spark, s"$tmp/idx")("graft.dedup.docs").toLong ==
      corpus.count() + 8, "the all-duplicate batch still folds into the index")
  }

  test("wide-key index is inferred by the incremental path and agrees with narrow") {
    val (corpus, batch) = split()
    val narrowTmp = java.nio.file.Files.createTempDirectory("graft_dixn_").toString
    val wideTmp = java.nio.file.Files.createTempDirectory("graft_dixw_").toString
    Dedup.writeExactIndex(corpus, narrowTmp)
    Dedup.writeExactIndex(corpus, wideTmp, wideKey = true)
    assert(Dedup.exactIndexStats(spark, wideTmp)("graft.dedup.wide-key") == "true")
    // collision-free corpus: both key widths classify the batch identically
    assert(rows(Dedup.exactIncremental(batch, wideTmp)) ==
      rows(Dedup.exactIncremental(batch, narrowTmp)))
  }
}
