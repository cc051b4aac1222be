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
    *
    * `horizon`: the UNBOUNDED form pairs each left row with its key's entire
    * earlier history before the rank-1 filter — per-key join fan-out is
    * |lefts| x |rights| on hot keys, the one cost here that grows
    * super-linearly with history depth. Passing `horizon = Some(h)` bounds
    * the lookback to `l.time - h <= r.time <= l.time` and turns the time
    * bound into a bucketed equi-join on `time div h` (the [[graft.queries]]
    * q10 interval-join shape): the right side carries its bucket, the left
    * side probes `{bucket - 1, bucket}` — any in-horizon right row lands in
    * one of the two — so per-key fan-out is bounded by rows per (key, 2h)
    * window instead of all history. Matches inside the horizon are identical
    * to the unbounded form; left rows whose newest match is older than the
    * horizon get the `joinType` miss behavior (nulls for "left") instead.
    * For UNBOUNDED lookback over skewed keys prefer [[joinSorted]], which is
    * linear on any key distribution (this form's hot-key fan-out OOMs at a
    * 5%-hot key, 10M events — BASELINE.md round-5 zipf study).
    * Requires NUMERIC (integral) time columns, e.g. epoch micros; bucketing
    * is exact integer floor-division, so negative times (pre-1970 epochs)
    * bucket correctly too.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      leftId: Seq[String],
      tieBreak: Seq[String] = Seq.empty,
      joinType: String = "left",
      horizon: Option[Long] = None): DataFrame = {
    horizon.foreach(h => require(h > 0, s"asof horizon must be positive, got $h"))
    // refuse inputs that already carry a helper name rather than clobber
    // them: _asof_rn is always added; the bucket helpers only on the horizon
    // path (where the final drop removes EVERY matching column from either
    // side). Case-insensitive to match Spark's default column resolution.
    val reserved = "_asof_rn" +:
      (if (horizon.isDefined) Seq("_asof_probe", "_asof_bucket") else Nil)
    for (cols <- Seq(left.columns, right.columns); c <- cols; r <- reserved)
      require(!c.equalsIgnoreCase(r), s"asof join reserves column name $r")
    // Exact integer floor-division for the bucket: `div` truncates toward
    // zero, so adjust by one when a negative time has a remainder. All-long
    // arithmetic — a float/double detour would round at ns-epoch magnitudes
    // (> 2^53) and mis-bucket. Built from Columns, not SQL-string
    // interpolation, so column names needing backticks work unchanged.
    def bucketOf(t: Column, h: Long): Column = {
      val q = call_function("div", t, lit(h))
      (q - when(t % lit(h) < 0, lit(1L)).otherwise(lit(0L))).cast("long")
    }
    val l = horizon
      .fold(left)(h => left.withColumn("_asof_probe",
        explode(array(bucketOf(col(leftTime), h) - 1, bucketOf(col(leftTime), h)))))
      .as("l")
    val r = horizon
      .fold(right)(h => right.withColumn("_asof_bucket", bucketOf(col(rightTime), h)))
      .as("r")
    val keyCond = keys
      .map { case (lk, rk) => col(s"l.$lk") === col(s"r.$rk") }
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    val boundCond = horizon.fold(lit(true))(h =>
      col("l._asof_probe") === col("r._asof_bucket") &&
        col(s"r.$rightTime") >= col(s"l.$leftTime") - h)
    val cond = keyCond && col(s"r.$rightTime") <= col(s"l.$leftTime") && boundCond
    val joined = l.join(r, cond, joinType)
    val ord: Seq[Column] =
      col(s"r.$rightTime").desc +: tieBreak.map(c => col(s"r.$c").desc)
    // rank 1 per left row; desc = desc_nulls_last, so a probe's null-miss row
    // never outranks a real match, and a both-probes-miss left row collapses
    // to one all-null-right row (the two exploded copies are identical)
    val w = Window.partitionBy(leftId.map(c => col(s"l.$c")): _*).orderBy(ord: _*)
    val ranked = joined.withColumn("_asof_rn", row_number().over(w)).filter(col("_asof_rn") === 1)
    // drop the helper columns only when this call added them — a same-named
    // caller column on the unbounded path must pass through untouched
    horizon.fold(ranked.drop("_asof_rn"))(_ =>
      ranked.drop("_asof_rn", "_asof_probe", "_asof_bucket"))
  }

  /** Unbounded as-of join as a SORTED CARRY-FORWARD — the skew-immune form.
    *
    * [[join]] without a horizon pairs each left row with its key's entire
    * earlier history before ranking, so a hot key costs |lefts| x |rights|
    * (measured: a user owning 5% of 10M events OOMs the join form where this
    * form runs flat — BASELINE.md round-5 zipf study). Here both sides union
    * into one (key)-partitioned stream sorted by time; a running
    * `last(right_row, ignoreNulls)` window carries the newest right row at
    * or before every left row. ONE shuffle, cost linear in |left| + |right|
    * regardless of key distribution — the merge-scan shape of the
    * reference's snapshot read (newest version <= seq, kv/db/dbformat.h:
    * 103-121), done as one pass instead of a per-row probe.
    *
    * Differences from [[join]]: no `leftId` needed (carry-forward answers
    * per ROW, so duplicate left ids are fine), and because the output is one
    * flat frame rather than an aliased join, right columns come back
    * prefixed with `rightPrefix` instead of being addressed as `r.<col>`.
    * Ties at equal time: rights sort before lefts (`<=` semantics), and
    * among equal-time rights the greatest `tieBreak` wins — identical
    * winners to [[join]]. `joinType`: "left" or "inner".
    */
  def joinSorted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      tieBreak: Seq[String] = Seq.empty,
      rightPrefix: String = "r_",
      joinType: String = "left"): DataFrame = {
    require(joinType == "left" || joinType == "inner",
      s"joinSorted supports left|inner, got $joinType")
    val rightOut = right.columns.map(c => rightPrefix + c)
    val clash = left.columns.toSet.intersect(rightOut.toSet)
    require(clash.isEmpty, s"prefixed right columns clash with left: ${clash.mkString(", ")}")
    for (c <- left.columns ++ right.columns)
      require(!c.toLowerCase.startsWith("_asof_"), s"joinSorted reserves the _asof_ prefix, got $c")

    val kN = keys.indices.map(i => s"_asof_k$i")
    val lU = left.select(
      keys.zipWithIndex.map { case ((lk, _), i) => col(lk).as(kN(i)) } ++ Seq(
        col(leftTime).as("_asof_t"),
        lit(1).as("_asof_side"),
        struct(left.columns.map(col): _*).as("_asof_l"),
        lit(null).cast(org.apache.spark.sql.types.StructType(right.schema)).as("_asof_r")): _*)
    val rU = right.select(
      keys.zipWithIndex.map { case ((_, rk), i) => col(rk).as(kN(i)) } ++ Seq(
        col(rightTime).as("_asof_t"),
        lit(0).as("_asof_side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema)).as("_asof_l"),
        struct(right.columns.map(col): _*).as("_asof_r")): _*)
    // rights before lefts at equal time (<=); among equal-time rights the
    // carry keeps the LAST in sort order, so tieBreak asc = greatest wins
    val ord = col("_asof_t").asc +: col("_asof_side").asc +:
      tieBreak.map(c => col("_asof_r").getField(c).asc)
    val w = Window.partitionBy(kN.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // [[join]]'s equi-join condition is null-rejecting: a null-key right
    // row can match nothing, so drop it before the union — null-key lefts
    // then carry no right row (miss under "left", dropped under "inner"),
    // identical winners to [[join]] instead of a null-equals-null partition.
    // Also keeps the corpus's null-key mass out of one skewed hash partition.
    // reduceLeftOption: empty keys = ONE global partition, which [[join]]
    // supports (its condition falls back to lit(true)) — a bare reduceLeft
    // would throw on the empty list instead
    val nullKey = kN.map(col(_).isNull).reduceLeftOption(_ || _).getOrElse(lit(false))
    // a NULL-time right must also drop: `r.time <= l.time` is null in the
    // join form (a miss), but the asc sort puts nulls FIRST, so the carry
    // would hand the null-time right to every left before the first real
    // right — a match [[join]] never produces. Null-time LEFTS need no
    // filter: they sort to the head, see no prior right, and come out as
    // misses — the join form's verdict for them too.
    val carried = lU.unionByName(rU.filter(!nullKey && col("_asof_t").isNotNull))
      .withColumn("_asof_rc", last(col("_asof_r"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
    val matched =
      if (joinType == "inner") carried.filter(col("_asof_rc").isNotNull) else carried
    matched.select(
      left.columns.map(c => col("_asof_l").getField(c).as(c)) ++
        right.columns.map(c => col("_asof_rc").getField(c).as(rightPrefix + c)): _*)
  }
}
