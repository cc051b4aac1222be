package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation for training-data assembly: budgeted selection of the
  * best documents per stratum (language, source, ...). The reference has no
  * analogue — this is part of the LLM-pipeline surface the engine adds on
  * top of the KV semantics (SURVEY.md §2.3).
  */
object Curation {

  /** Greedy per-stratum token-budget fill: within each stratum, order
    * documents best-first (`score` desc, id asc) and keep them while the
    * running token total — including the current document — stays within
    * `budgetTokens`. The standard "fill an N-token training mix with the
    * highest-quality documents per language" selection; output is one row
    * per kept document with its running total.
    *
    * Scale design: the greedy fill is BY DEFINITION a total order per
    * stratum, so a naive window would sort a whole stratum in one task —
    * at 100 TB a single language can be most of the corpus. The prefilter
    * (on by default) bounds that sort: per stratum it estimates the score
    * threshold that keeps ~2x the budget in tokens (a fixed approx-quantile
    * grid, one aggregation, driver data = strata x 21 doubles), keeps only
    * docs at-or-above the threshold, and VERIFIES losslessness — survivors
    * must still carry >= min(budget, total) tokens; any stratum failing the
    * check (pathological score/length correlation) falls back to its full
    * doc set. Survivors form a PREFIX of the stratum's sort order, and a
    * verified prefix holds at least the budget, so the fill over survivors
    * is provably identical to the fill over everything (CurationSpec
    * asserts equality) — the exact window then sorts ~2x-budget tokens per
    * stratum regardless of corpus size. */
  def tokenBudget(
      documents: DataFrame,
      budgetTokens: Long,
      score: Column,
      strataCol: String = "lang",
      idCol: String = "doc_id",
      textCol: String = "text",
      prefilter: Boolean = true): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = documents.sparkSession
    // tokens + score computed ONCE; everything downstream moves only
    // (id, stratum, n_tokens, score) — the text never rides a shuffle
    val base = documents
      .select(
        col(idCol), col(strataCol),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"),
        score.as("_score"))
      .localCheckpoint()
    val survivors =
      if (!prefilter) base
      else {
        val grid = (0 to 20).map(_ / 20.0)
        // one aggregation: per-stratum token total + a coarse score CDF
        val stats = base.groupBy(col(strataCol))
          .agg(
            sum(col("n_tokens")).as("_total"),
            percentile_approx(col("_score"), typedLit(grid), lit(10000)).as("_q"))
          .collect()
        val thrRows = stats.map { r =>
          val total = r.getLong(1)
          val q = r.getSeq[Double](2)
          val thr =
            if (total <= budgetTokens) Double.NegativeInfinity // under budget: keep all
            else {
              // keep the top fraction of docs expected to carry ~2x the
              // budget in tokens (docs ~ tokens exchangeability heuristic;
              // the check below makes it safe when the heuristic is wrong)
              val keepFrac = math.min(1.0, 2.0 * budgetTokens / total)
              q(math.max(0, math.min(grid.size - 1, math.round((1.0 - keepFrac) * 20).toInt)))
            }
          org.apache.spark.sql.Row(r.get(0), thr)
        }
        // threshold relation keyed by the stratum's ORIGINAL type
        val thrDf = spark.createDataFrame(
          java.util.Arrays.asList(thrRows: _*),
          org.apache.spark.sql.types.StructType(Seq(
            base.schema(strataCol),
            org.apache.spark.sql.types.StructField(
              "_thr", org.apache.spark.sql.types.DoubleType))))
        val cand = base
          .join(broadcast(thrDf), strataCol)
          .filter(col("_score") >= col("_thr"))
          .drop("_thr")
        // losslessness check: survivors are a PREFIX of each stratum's sort
        // order; if the prefix still carries >= min(budget, total) tokens,
        // the greedy fill cannot reach past it. Strata failing the check —
        // including a null stratum, which the equi-join above always drops —
        // fall back to their full doc set (exactness over the shortcut).
        val kept = cand.groupBy(col(strataCol)).agg(sum(col("n_tokens")).as("_kept"))
          .collect().map(r => Option(r.get(0)) -> r.getLong(1)).toMap
        val fallback = stats.collect {
          case r if kept.getOrElse(Option(r.get(0)), 0L) <
            math.min(budgetTokens, r.getLong(1)) => Option(r.get(0))
        }.toSeq
        def inFallback(c: Column): Column = {
          val vals = fallback.flatten
          val nonNull = if (vals.nonEmpty) c.isin(vals: _*) else lit(false)
          if (fallback.contains(None)) nonNull || c.isNull else nonNull
        }
        if (fallback.isEmpty) cand
        else cand.filter(!inFallback(col(strataCol)))
          .unionByName(base.filter(inFallback(col(strataCol))))
      }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("_score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    survivors
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(idCol), col(strataCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Deterministic stratified sampling for dataset mixing: keep a document
    * iff `xxhash64(id, seed) mod 2^20 < rate(stratum) * 2^20`. Unlike
    * `DataFrame.sample`, membership is a pure function of (id, seed, rate):
    *   - DETERMINISTIC: the same inputs give the same SET on any
    *     partitioning, ordering, executor count, or retry — a mix recipe is
    *     reproducible bit-for-bit;
    *   - NESTED: raising a stratum's rate only ADDS documents (the hash
    *     threshold grows), so rate-sweep experiments are strictly
    *     comparable and a 1% pilot is a subset of the 10% run;
    *   - MAP-SIDE ONLY: one codegen'd filter, no shuffle, no RNG state.
    * Strata missing from `rates` fall back to `defaultRate`; a null
    * stratum uses `defaultRate` too. CurationSpec pins all three
    * properties. */
  def stratifiedSample(
      documents: DataFrame,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      seed: Long = 0L,
      strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val buckets = 1L << 20
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    documents.filter(
      pmod(xxhash64(col(idCol), lit(seed)), lit(buckets)) <
        (rate * lit(buckets.toDouble)).cast("long"))
  }
}
