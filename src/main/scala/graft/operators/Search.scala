package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus — the inspection/debugging
  * companion to the embedding search family ([[Similarity]], [[Ivf]]): a
  * curation engineer asks "which documents mention X" against 100 TB
  * without building an external search cluster. BM25 (Robertson-Spärck
  * Jones; the Lucene-style `ln(1 + (N - df + 0.5)/(df + 0.5))` idf
  * variant, which never goes negative) is public knowledge.
  */
object Search {

  /** Batch BM25 top-k: one (query_id, doc_id, rank, score) row per hit,
    * `rank` by (score desc, id asc) within each query, scores rounded to 4
    * decimals BEFORE ranking (the rounded value is the tie-break domain, so
    * ordering is robust to last-ulp float differences). Documents sharing
    * no term with a query are not hits (classic disjunctive retrieval); a
    * term absent from the corpus contributes nothing.
    *
    * Scale design: NO inverted index is built — the corpus is scanned once
    * per query BATCH, so cost amortizes over the batch (the ad-hoc
    * inspection pattern; a standing index is [[graft.core.Layout]]'s
    * bucketize territory). Document lengths are a map-only projection (one
    * slim single-row agg for N/avgdl); the exploded token stream is
    * filtered by the BROADCAST query-term set BEFORE any exchange, so the
    * only corpus-derived shuffle carries (doc, matched-term) partial
    * counts — web-corpus docs match a handful of terms, not their token
    * count. idf is a term-sized broadcast; per-term contributions
    * decimal-accumulate per (query, doc) and the final top-k is a window
    * over hit rows only. */
  def bm25(
      documents: DataFrame,
      queries: DataFrame,
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text",
      queryIdCol: String = "query_id",
      queryTextCol: String = "query_text"): DataFrame = {
    require(topK > 0, "topK must be positive")
    require(k1 > 0.0 && b >= 0.0 && b <= 1.0, s"bad BM25 params k1=$k1 b=$b")
    val toks = TextOps.tokens(coalesce(col(textCol), lit("")))
    // N and avgdl: map-only length projection, one single-row agg
    val stats = documents.select(size(toks).cast("long").as("dl"))
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
    val n = stats.getLong(0)
    require(n > 0, "Search.bm25: empty corpus")
    val avgdl = stats.getLong(1).toDouble / n.toDouble
    // distinct query terms (a repeated term in one query counts once — the
    // VALUES-set semantics the SQL twin mirrors)
    val terms = queries.select(
      col(queryIdCol).as("query_id"),
      explode(TextOps.tokens(coalesce(col(queryTextCol), lit("")))).as("tok"))
      .distinct()
      .localCheckpoint() // query-batch-sized; probed twice (filter + join)
    // per-(doc, matched term) frequencies; dl rides along (constant per doc)
    val tf = documents
      .select(col(idCol).as("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("tok"))
      .join(broadcast(terms.select("tok").distinct()), Seq("tok"), "left_semi")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"), max("dl").cast("double").as("dl"))
    scoreAndRank(tf, terms, n, avgdl, topK, k1, b)
  }

  /** The scoring tail shared by the scan and indexed paths — ONE definition
    * so the two can never diverge: df/idf from the matched (doc, term)
    * rows, decimal-accumulated per-(query, doc) scores, rounded BEFORE the
    * per-query rank window. `tf` = (doc_id, tok, tf, dl) doubles. */
  private def scoreAndRank(
      tf: DataFrame, terms: DataFrame, n: Long, avgdl: Double,
      topK: Int, k1: Double, b: Double): DataFrame = {
    val idf = tf.groupBy("tok")
      .agg(count(lit(1)).cast("double").as("df"))
      .select(col("tok"),
        log((lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
          .as("idf"))
    val contrib = col("idf") * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    val dec = org.apache.spark.sql.types.DecimalType(30, 10)
    val scored = tf
      .join(broadcast(terms), Seq("tok"))
      .join(broadcast(idf), Seq("tok"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(contrib.cast(dec)).cast("double"), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke, Büttcher 2009 — public
    * knowledge) of N per-query rankings: every input frame contributes
    * `w_i / (k0 + rank)` for each (query, doc) it ranks, contributions sum
    * per (query, doc), and the fused top-k re-ranks by the summed score.
    * A doc missing from some rankings simply collects fewer contributions
    * — the standard hybrid-retrieval combiner, robust to incomparable
    * score scales because only RANKS cross the boundary.
    *
    * Determinism/scale: contributions accumulate in DECIMAL (summation
    * order cannot perturb the 6-decimal rounded score), the fused rank
    * tie-breaks by (score desc, doc_id asc), and the only data moved is
    * (query_id, doc_id, rank) triples — ranking frames are top-k-sized,
    * never corpus-sized, so the union + one aggregation is
    * query-batch-bounded no matter the corpus behind the rankings. */
  def fuseRankings(
      rankings: Seq[DataFrame],
      topK: Int = 10,
      k0: Int = 60,
      weights: Seq[Double] = Nil): DataFrame = {
    require(rankings.nonEmpty, "fuseRankings: no rankings")
    require(topK > 0, "topK must be positive")
    require(k0 >= 0, "k0 must be >= 0")
    require(weights.isEmpty || weights.length == rankings.length,
      s"${weights.length} weights for ${rankings.length} rankings")
    val dec = org.apache.spark.sql.types.DecimalType(30, 10)
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      val wi = if (weights.isEmpty) 1.0 else weights(i)
      r.select(col("query_id"), col("doc_id"),
        (lit(wi) / (lit(k0).cast("double") + col("rank").cast("double")))
          .cast(dec).as("c"))
    }
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("c")).cast("double"), 6).as("rrf"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("rank"), col("rrf"))
  }

  /** Hybrid keyword + dense retrieval: BM25 ranks and cosine-similarity
    * ranks fused by [[fuseRankings]] — the standard two-tower retrieval
    * combiner (a doc strong on either signal surfaces; one strong on both
    * outranks it). `queries` carries BOTH a text and a vector column;
    * `embeddings` ids must be document ids. This convenience uses the
    * exact brute-force dense ranking — at index scale compute the dense
    * side with [[Ivf.topKIndexed]] / [[Pq.topKIndexed]] and fuse via
    * [[fuseRankings]] directly (rankings are the interchange format,
    * precisely so the dense implementation can swap). */
  def hybridTopK(
      documents: DataFrame,
      embeddings: DataFrame,
      queries: DataFrame,
      topK: Int = 10,
      fetchK: Int = 50,
      k0: Int = 60,
      keywordWeight: Double = 1.0,
      denseWeight: Double = 1.0,
      idCol: String = "doc_id",
      textCol: String = "text",
      vecIdCol: String = "vec_id",
      vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryTextCol: String = "query_text",
      queryVecCol: String = "query_vec"): DataFrame = {
    val kw = bm25(documents, queries, fetchK, idCol = idCol, textCol = textCol,
      queryIdCol = queryIdCol, queryTextCol = queryTextCol)
      .select(col("query_id"), col("doc_id"), col("rank"))
    // excludeSelf = false: query ids and document ids are DIFFERENT
    // namespaces here, so an id collision is coincidental — the default
    // self-exclusion would silently drop that document from the query's
    // dense ranking (e.g. the document whose embedding IS the query vector)
    val dn = Similarity.bruteForceTopK(
      embeddings.select(col(vecIdCol).as("_hy_id"), col(vecCol).as("_hy_vec")),
      queries.select(col(queryIdCol).as("_hy_id"), col(queryVecCol).as("_hy_vec")),
      fetchK, idCol = "_hy_id", vecCol = "_hy_vec", excludeSelf = false)
      .select(col("q_id").as("query_id"), col("n_id").as("doc_id"), col("rank"))
    fuseRankings(Seq(kw, dn), topK, k0, Seq(keywordWeight, denseWeight))
  }

  /** Persist an INVERTED INDEX for [[bm25Indexed]]: postings
    * (doc_id, tok, tf, dl) written `partitionBy(pb)` where
    * `pb = pmod(xxhash64(tok), buckets)` — the term-hash analogue of the
    * IVF inverted-file layout ([[Ivf.writeIndex]]) and the band-bucket
    * store: a query's terms map to a handful of `pb` values, so search
    * reads only those partition directories (path pruning) plus a
    * `tok IN` rowgroup filter inside them, instead of re-tokenizing the
    * corpus per batch. Corpus stats (N, Σdl, buckets) land in `meta`.
    * Tokenize once, search many — the standing-index path where [[bm25]]
    * is the ad-hoc scan. */
  def buildTextIndex(
      documents: DataFrame,
      path: String,
      buckets: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    require(buckets > 0, "buckets must be positive")
    val spark = documents.sparkSession
    val toks = TextOps.tokens(coalesce(col(textCol), lit("")))
    val m = documents.select(size(toks).cast("long").as("dl"))
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
    import spark.implicits._
    Seq((m.getLong(0), m.getLong(1), buckets)).toDF("n_docs", "sum_dl", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    postingsRows(documents, buckets, idCol, textCol)
      // one task per touched bucket => one file per bucket, not per
      // (task x bucket)
      .repartition(col("pb"))
      .write.partitionBy("pb").mode("overwrite").parquet(s"$path/postings")
  }

  /** The postings derivation — ONE definition shared by the batch build,
    * the batch append, and the streaming segment writer, so the three
    * write paths can never diverge on tokenizer, tf accounting, or the
    * bucket hash (the same single-definition discipline as
    * [[scoreAndRank]] on the read side): (doc_id, tok, tf, dl, pb) rows,
    * `pb = pmod(xxhash64(tok), buckets)`. */
  private def postingsRows(
      docs: DataFrame, buckets: Int, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(coalesce(col(textCol), lit("")))
    docs
      .select(col(idCol).as("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("long").as("tf"), max("dl").as("dl"))
      .withColumn("pb", pmod(xxhash64(col("tok")), lit(buckets.toLong)))
  }

  /** Append new documents to a persisted text index WITHOUT rebuilding:
    * the batch's postings land in the existing bucket partitions and the
    * corpus stats in `meta` grow by the batch — search after append is
    * IDENTICAL to a full [[buildTextIndex]] rebuild over the union
    * (df/tf come from the postings themselves and N/avgdl from meta, so
    * there is no trained state to go stale — unlike [[Ivf.appendToIndex]]
    * this append needs no rebuild gate, ever). Ids must be fresh (not
    * present, not tombstoned). Returns documents appended. */
  def appendToTextIndex(
      newDocs: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text"): Long = {
    val spark = newDocs.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val (n0, sd0, buckets) = (meta.getLong(0), meta.getLong(1), meta.getInt(2))
    val batch = postingsRows(newDocs, buckets, idCol, textCol).localCheckpoint()
    batch.repartition(col("pb"))
      .write.partitionBy("pb").mode("append").parquet(s"$path/postings")
    val bm = batch.select("doc_id", "dl").groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
    graft.core.Blocks.free(batch)
    import spark.implicits._
    Seq((n0 + bm.getLong(0), sd0 + bm.getLong(1), buckets))
      .toDF("n_docs", "sum_dl", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    bm.getLong(0)
  }

  /** Retract documents from a persisted text index by id — the takedown
    * path ([[Ivf.deleteFromIndex]]'s contract): tombstones carry the
    * removed documents' LENGTH MASS (looked up from the postings once, at
    * delete time), so reads reconstruct exact post-deletion N/avgdl from
    * `meta` minus the tombstone aggregate without rewriting anything —
    * search after delete is IDENTICAL to a rebuild without those docs.
    * Idempotent (re-deletes dedupe at read); ids must not be reused while
    * tombstoned. Returns distinct ids tombstoned by this call. */
  def deleteFromTextIndex(
      removedIds: DataFrame,
      path: String,
      idCol: String = "doc_id"): Long = {
    val spark = removedIds.sparkSession
    // ids pass through UNCAST: every other text-index entry point is
    // id-type-generic, and a long cast would null out string ids — turning
    // the takedown into a silent no-op
    val ids = removedIds.select(col(idCol).as("doc_id")).distinct()
    val batch = (s"$path/postings" +: liveSegments(spark, path).map(_ + "/postings"))
      .map(spark.read.parquet(_)).reduce(_ unionByName _)
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(max("dl").as("dl"))
      .localCheckpoint()
    batch.write.mode("append").parquet(s"$path/tombs")
    val n = batch.count()
    graft.core.Blocks.free(batch)
    n
  }

  /** The live STREAMED segments of a text index — the replay-idempotent
    * append form ([[writePostingsSegment]]): a segment is visible iff both
    * its postings tree and its `segmeta` committed (`segmeta` is written
    * last, so it is the commit point; a crash mid-write leaves the segment
    * invisible and the replay overwrites it whole). */
  private def liveSegments(
      spark: org.apache.spark.sql.SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$path/segs")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter { d =>
        fs.exists(new org.apache.hadoop.fs.Path(d, "postings/_SUCCESS")) &&
          fs.exists(new org.apache.hadoop.fs.Path(d, "segmeta/_SUCCESS"))
      }
      .map(_.toString).sorted.toSeq
  }

  /** Write a document batch's postings as a NAMED segment under
    * `segs/<segName>` with overwrite semantics plus its own stats row —
    * the streaming form of [[appendToTextIndex]]: a crash-replayed
    * micro-batch rewrites the same directory (postings AND per-segment
    * meta) instead of double-appending, and the base `meta` is never
    * mutated, so replay cannot double-count N/avgdl. Folded into the base
    * by [[compactTextIndex]]. Ids must be fresh. Returns docs written. */
  def writePostingsSegment(
      newDocs: DataFrame,
      path: String,
      segName: String,
      idCol: String = "doc_id",
      textCol: String = "text"): Long = {
    val spark = newDocs.sparkSession
    val buckets = spark.read.parquet(s"$path/meta").head().getInt(2)
    val batch = postingsRows(newDocs, buckets, idCol, textCol).localCheckpoint()
    batch.repartition(col("pb"))
      .write.partitionBy("pb").mode("overwrite").parquet(s"$path/segs/$segName/postings")
    val m = batch.select("doc_id", "dl").groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
    graft.core.Blocks.free(batch)
    import spark.implicits._
    Seq((m.getLong(0), m.getLong(1))).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/segs/$segName/segmeta")
    m.getLong(0)
  }

  /** Fold streamed segments AND tombstones into the base postings: one
    * flat bucket-partitioned tree again, deleted rows physically
    * reclaimed, `meta` recounted FROM THE LIVE POSTINGS (recount, not
    * subtraction — and (doc, tok)-deduped, so the operation is IDEMPOTENT:
    * re-running after any mid-way crash restores consistency).
    * STOP-THE-WORLD for this index (rewrites `postings/` in place, the
    * [[Ivf.compactIndexSegments]] contract). */
  def compactTextIndex(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val postingsDir = new org.apache.hadoop.fs.Path(s"$path/postings")
    val staging = new org.apache.hadoop.fs.Path(s"$path/postings_staging")
    // finish a crashed prior swap before anything else
    graft.core.Segments.healSwap(fs, staging, postingsDir)
    val tombsDir = new org.apache.hadoop.fs.Path(s"$path/tombs")
    val segs = liveSegments(spark, path)
    if (!fs.exists(tombsDir) && segs.isEmpty) return
    val raw = (s"$path/postings" +: segs.map(_ + "/postings"))
      .map(spark.read.parquet(_)).reduce(_ unionByName _)
      // (doc, tok) dedupe makes the fold IDEMPOTENT: a crash after the
      // base rewrite but before the segment delete leaves segment rows in
      // both trees, and the rerun must not double them
      .dropDuplicates("doc_id", "tok")
    val live = if (!fs.exists(tombsDir)) raw
      else raw.join(
        broadcast(spark.read.parquet(tombsDir.toString).select("doc_id").distinct()),
        Seq("doc_id"), "left_anti")
    // stage-then-swap (Segments.swapInto): the folded view streams from
    // the live trees into a durable sibling; a crash at any point leaves
    // a complete postings tree on disk, where the previous
    // localCheckpoint + in-place overwrite lost both if the JVM died
    // mid-write (checkpoint blocks are executor memory only)
    live.repartition(col("pb"))
      .write.partitionBy("pb").mode("overwrite").parquet(staging.toString)
    graft.core.Segments.swapInto(fs, staging, postingsDir)
    val liveRead = spark.read.parquet(postingsDir.toString)
    // the recounted meta lands BEFORE the segment/tombstone deletes: a
    // crash in between leaves readers double-counting segment stats until
    // the rerun (which re-folds through the dedupe and re-deletes), but
    // never the unrecoverable inverse — deleting the segmeta/tombstone
    // stats first and dying before the meta write would strand a stale
    // meta that the segs-empty early return above could never repair
    val buckets = spark.read.parquet(s"$path/meta").head().getInt(2)
    val m = liveRead.select("doc_id", "dl").groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
    import spark.implicits._
    Seq((m.getLong(0), m.getLong(1), buckets)).toDF("n_docs", "sum_dl", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val segsDir = new org.apache.hadoop.fs.Path(s"$path/segs")
    if (fs.exists(segsDir)) { fs.delete(segsDir, true); () }
    if (fs.exists(tombsDir)) { fs.delete(tombsDir, true); () }
  }

  /** GetProperty-style health of a persisted text index (the
    * [[graft.operators.Dedup.exactIndexStats]] /[[Ivf.indexStats]]
    * contract): live document count and average length (exactly what
    * scoring will use), posting-row and distinct-term counts, streamed
    * segments awaiting a fold, pending tombstones. The posting counts
    * scan the slim postings trees only — never document text. */
  def textIndexStats(
      spark: org.apache.spark.sql.SparkSession, path: String): Map[String, String] = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val (n0, sd0, buckets) = (meta.getLong(0), meta.getLong(1), meta.getInt(2))
    val segs = liveSegments(spark, path)
    val (nS, sdS) = segs.foldLeft((n0, sd0)) { case ((a, d), seg) =>
      val r = spark.read.parquet(s"$seg/segmeta").head()
      (a + r.getLong(0), d + r.getLong(1))
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tombsDir = new org.apache.hadoop.fs.Path(s"$path/tombs")
    val (tombN, tombDl) =
      if (!fs.exists(tombsDir)) (0L, 0L)
      else {
        val g = spark.read.parquet(tombsDir.toString)
          .groupBy("doc_id").agg(max("dl").as("dl"))
          .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
        (g.getLong(0), g.getLong(1))
      }
    val (n, sd) = (nS - tombN, sdS - tombDl)
    val p = (s"$path/postings" +: segs.map(_ + "/postings"))
      .map(spark.read.parquet(_)).reduce(_ unionByName _)
      .agg(count(lit(1)), approx_count_distinct(col("tok"))).head()
    Map(
      "graft.text.docs" -> n.toString,
      "graft.text.sum-tokens" -> sd.toString,
      "graft.text.avgdl" -> f"${if (n > 0) sd.toDouble / n else 0.0}%.4f",
      "graft.text.postings" -> p.getLong(0).toString,
      "graft.text.terms-approx" -> p.getLong(1).toString,
      "graft.text.buckets" -> buckets.toString,
      "graft.text.segments" -> segs.size.toString,
      "graft.text.tombstones" -> tombN.toString)
  }

  /** BM25 over a [[buildTextIndex]] index: IDENTICAL results to [[bm25]]
    * on the indexed corpus (same scoring tail, stats from `meta` minus any
    * tombstoned documents), but the per-batch cost is a pruned postings
    * read — only the query terms' hash buckets are listed and scanned —
    * instead of a corpus scan. The term-bucket set is computed with one
    * query-batch-sized job; corpus data never reaches the driver. */
  def bm25Indexed(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      queryIdCol: String = "query_id",
      queryTextCol: String = "query_text"): DataFrame = {
    require(topK > 0, "topK must be positive")
    val meta = spark.read.parquet(s"$path/meta").head()
    val (n0, sd0, buckets) = (meta.getLong(0), meta.getLong(1), meta.getInt(2))
    // live streamed segments contribute their own stats rows — the base
    // meta never mutates on the streaming path, so a replayed batch
    // cannot double-count
    val segs = liveSegments(spark, path)
    val (nS, sdS) = segs.foldLeft((n0, sd0)) { case ((a, d), seg) =>
      val r = spark.read.parquet(s"$seg/segmeta").head()
      (a + r.getLong(0), d + r.getLong(1))
    }
    // tombstoned docs leave N/avgdl exactly as a rebuild-without-them
    // would: their length mass rides the tombstones (takedown-sized)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tombsDir = new org.apache.hadoop.fs.Path(s"$path/tombs")
    val tombs = if (fs.exists(tombsDir))
      Some(spark.read.parquet(tombsDir.toString)
        .groupBy("doc_id").agg(max("dl").as("dl")).localCheckpoint())
    else None
    val (n, sumDl) = tombs.fold((nS, sdS)) { t =>
      val g = t.agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
      (nS - g.getLong(0), sdS - g.getLong(1))
    }
    require(n > 0, "Search.bm25Indexed: empty index")
    val avgdl = sumDl.toDouble / n.toDouble
    val terms = queries.select(
      col(queryIdCol).as("query_id"),
      explode(TextOps.tokens(coalesce(col(queryTextCol), lit("")))).as("tok"))
      .distinct()
      .localCheckpoint()
    // the terms' partition buckets — a query-batch-sized collect
    val pbs = terms.select(pmod(xxhash64(col("tok")), lit(buckets.toLong)))
      .distinct().collect().map(_.getLong(0)).toSeq
    val termList = terms.select("tok").distinct().collect().map(_.getString(0)).toSeq
    // base + streamed segments, each root bucket-pruned independently
    val raw = (s"$path/postings" +: segs.map(_ + "/postings"))
      .map(spark.read.parquet(_)
        .filter(col("pb").isin(pbs: _*) && col("tok").isin(termList: _*)))
      .reduce(_ unionByName _)
    val live = tombs.fold(raw)(t =>
      raw.join(broadcast(t.select("doc_id")), Seq("doc_id"), "left_anti"))
    val tf = live.select(col("doc_id"), col("tok"),
      col("tf").cast("double").as("tf"), col("dl").cast("double").as("dl"))
    scoreAndRank(tf, terms, n, avgdl, topK, k1, b)
  }
}
