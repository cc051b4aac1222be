package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose hot keys would overload single
  * reducers at 100 TB (AQE's skew-join split — on by default in
  * GraftSession — handles sort-merge skew after the fact; salting is the
  * explicit a-priori form for known-skewed keys, and works for aggregations
  * too).
  */
object Skew {

  /** Salted equi-join: the LEFT (large, skewed) side gets a salt in
    * [0, saltFactor) from hashing the row CONTENT plus a per-row id — the id
    * matters because real hot keys are often byte-identical duplicate rows,
    * which a content-only hash would send to ONE salt (zero spread exactly
    * when it's needed). The RIGHT side is replicated saltFactor times
    * (explode over the salt domain). The join key becomes (key, salt): each
    * hot key spreads over saltFactor reducers. Salt values depend on
    * partitioning (monotonically_increasing_id), but the JOIN RESULT does
    * not — every salt matches a replicated right row.
    *
    * Result equals `left.join(right, keys)` exactly; cost is
    * |right| * saltFactor through the shuffle — use for moderate-size right
    * sides that are too big to broadcast but small enough to replicate. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedLeft = left.withColumn(
      "_salt",
      pmod(xxhash64(left.columns.map(col).toSeq :+ monotonically_increasing_id(): _*),
        lit(saltFactor)).cast("int"))
    val replicatedRight = right.withColumn(
      "_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(replicatedRight, keys :+ "_salt")
      .drop("_salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: aggregate
    * per (key, salt) first — map-side + a spread shuffle — then merge the
    * partials per key. `partial` builds the salted aggregation exprs,
    * `merge` combines partials; both phases are ordinary hash aggregates.
    * Example: count -> partial count(*) as c, merge sum(c). */
  def twoPhaseAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn(
      "_salt",
      pmod(xxhash64(df.columns.map(col).toSeq :+ monotonically_increasing_id(): _*),
        lit(saltFactor)).cast("int"))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
