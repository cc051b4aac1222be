package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding columns.
  *
  * Baseline is brute-force cosine top-k: queries x corpus via broadcast join,
  * per-query top-k via window rank. Partition-parallel over the corpus, never
  * collects vectors to the driver. The scale path buckets the corpus with
  * random-hyperplane LSH so each query probes only its bucket (and its
  * Hamming-1 neighbors at higher recall settings).
  */
object Similarity {

  /** Brute-force top-k cosine neighbors for each query row.
    *
    * `queries` and `corpus` both need (`idCol`, `vecCol`). The query side is
    * broadcast (it is the small side by construction — a batch of query
    * vectors); the corpus streams through, so the cost is one corpus scan per
    * query batch regardless of corpus size. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("score", VectorOps.cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("score"), 6).as("score"))
  }

  /** LSH-bucketed ANN: corpus and queries bucketed by random-hyperplane sign
    * hash; each query scans only matching buckets. `planes` are deterministic
    * pseudo-random hyperplanes derived from a seed, so results are stable.
    * Recall < 1.0; intended as the 100 TB path where a full scan per query
    * batch is too expensive. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int,
      numPlanes: Int = 8,
      seed: Long = 42L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = typedLit(Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    def bucketed(df: DataFrame, id: String, vec: String) =
      df.select(
        col(idCol).as(id),
        col(vecCol).as(vec),
        VectorOps.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val c = bucketed(corpus, "n_id", "n_vec")
    val q = bucketed(queries, "q_id", "q_vec")
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("score", VectorOps.cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("score"), 6).as("score"))
  }

  /** All pairs with cosine >= threshold, blocked on an exact-match column
    * (e.g. label) to bound the pair count; the LSH bucket plays this role at
    * scale when no natural blocking key exists. */
  def nearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      blockCol: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol), col(blockCol))
    c.as("a")
      .join(c.as("b"), col(s"a.$blockCol") === col(s"b.$blockCol") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("score", VectorOps.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .filter(col("score") >= threshold)
      .select(
        col(s"a.$idCol").as("id_a"),
        col(s"b.$idCol").as("id_b"),
        round(col("score"), 6).as("score"))
  }
}
