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
}
