package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the newest right row with the same key and
  * right.time <= left.time — the reference's "newest version <= snapshot"
  * read rule (kv/db/dbformat.h:103-121) generalized to two tables.
  */
object AsOf {

  /** Join + per-left-row rank. `leftTime`/`rightTime` are column names on the
    * respective sides; `tieBreak` orders rows with equal right time.
    *
    * Plan shape: equi-join on the key columns (shuffle or broadcast chosen by
    * Catalyst/AQE) with the time bound as a join-side filter, then a window
    * keeping rank 1 per left row. At scale the equi-key join keeps this a
    * standard partitioned join — no cross product; the window partitions by
    * the left row id, so state per partition is bounded by matches per row.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      leftId: Seq[String],
      tieBreak: Seq[String] = Seq.empty,
      joinType: String = "left"): DataFrame = {
    val l = left.as("l")
    val r = right.as("r")
    val keyCond = keys
      .map { case (lk, rk) => col(s"l.$lk") === col(s"r.$rk") }
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    val cond = keyCond && col(s"r.$rightTime") <= col(s"l.$leftTime")
    val joined = l.join(r, cond, joinType)
    val ord: Seq[Column] =
      col(s"r.$rightTime").desc +: tieBreak.map(c => col(s"r.$c").desc)
    val w = Window.partitionBy(leftId.map(c => col(s"l.$c")): _*).orderBy(ord: _*)
    joined.withColumn("_asof_rn", row_number().over(w)).filter(col("_asof_rn") === 1).drop("_asof_rn")
  }
}
