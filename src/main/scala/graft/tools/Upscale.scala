package graft.tools

import graft.core.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger benchmark dataset by replicating the driver
  * testdata `reps` times with consistent key shifts — used to check that
  * operator cost scales ~linearly with input (the sf1 non-linearity probe;
  * the driver only ships sf <= 0.1).
  *
  * Replication rules keep per-operator OUTPUT linear in input, so wall-clock
  * ratios are attributable to the operators, not to output blow-up:
  *   - facts (customer/supplier/part/orders/lineitem/events) shift all
  *     primary/foreign keys by `r * (max+1)` consistently — joins stay
  *     1:1 per replica; region/nation stay fixed (TPC-H scaling rule);
  *   - documents: replica 0 is verbatim; replicas > 0 replace TWO of every
  *     three tokens with replica-salted tokens and suffix the lang label, so
  *     cross-replica near-dup pairs do not exist (no 3-shingle survives, and
  *     simhash signatures — which are designed to shrug off a 1/3
  *     perturbation — move far beyond any useful Hamming budget; a 1/3
  *     replacement measurably left cross-replica hamming at 8-23, flooding
  *     banded candidate generation) — dedup pair counts scale by reps;
  *   - embeddings: vec_id and label shift per replica (blocked pair queries
  *     stay within-replica); vectors verbatim. Brute/LSH/IVF top-k output is
  *     bounded by k per query regardless.
  *
  * Usage: runMain graft.tools.Upscale [srcDir] [dstDir] [reps] [hotPct]
  *
  * `hotPct` > 0 switches events to a SKEWED key distribution: that
  * percentage of all event rows is remapped to a single hot user_id (0),
  * event ids untouched — the zipfian-head stress for keyed aggregation,
  * as-of joins, and windows (the reference's semantic precedent is its
  * single-writer queue: every write serializes through one key,
  * kv/db/db_impl.cpp:1396-1410). The hot rows are chosen by event-id hash,
  * so the skew is deterministic and spread across replicas/time.
  */
object Upscale {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1synth")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val hotPct = args.lift(3).map(_.toInt).getOrElse(0)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-upscale")
    spark.sparkContext.setLogLevel("ERROR")

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    // many files per table: a single ~30 MB parquet file would be ONE input
    // split (files.maxPartitionBytes), serializing per-row-heavy operators —
    // unrepresentative of a real large table's thousands of splits
    def write(df: DataFrame, name: String): Unit =
      df.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")
    def maxOf(df: DataFrame, c: String): Long = df.agg(max(col(c))).head().getLong(0)
    /** Cross-join each row with replica index r (0-based) as column `_r`. */
    def rep(df: DataFrame): DataFrame =
      df.withColumn("_r", explode(sequence(lit(0), lit(reps - 1)))).withColumn("_rl", col("_r").cast("long"))
    def shift(c: String, span: Long) = col(c) + col("_rl") * lit(span)

    // dims stay fixed
    write(tbl("region"), "region")
    write(tbl("nation"), "nation")

    val custSpan = maxOf(tbl("customer"), "c_custkey") + 1
    val suppSpan = maxOf(tbl("supplier"), "s_suppkey") + 1
    val partSpan = maxOf(tbl("part"), "p_partkey") + 1
    val orderSpan = maxOf(tbl("orders"), "o_orderkey") + 1

    write(rep(tbl("customer")).withColumn("c_custkey", shift("c_custkey", custSpan))
      .drop("_r", "_rl"), "customer")
    write(rep(tbl("supplier")).withColumn("s_suppkey", shift("s_suppkey", suppSpan))
      .drop("_r", "_rl"), "supplier")
    write(rep(tbl("part")).withColumn("p_partkey", shift("p_partkey", partSpan))
      .drop("_r", "_rl"), "part")
    write(rep(tbl("orders"))
      .withColumn("o_orderkey", shift("o_orderkey", orderSpan))
      .withColumn("o_custkey", shift("o_custkey", custSpan))
      .drop("_r", "_rl"), "orders")
    write(rep(tbl("lineitem"))
      .withColumn("l_orderkey", shift("l_orderkey", orderSpan))
      .withColumn("l_partkey", shift("l_partkey", partSpan))
      .withColumn("l_suppkey", shift("l_suppkey", suppSpan))
      .drop("_r", "_rl"), "lineitem")

    // events: ts (nanos-long under nanosAsLong) shifts per replica by the
    // hour-aligned history span — replica r is the NEXT month of history, not
    // a 100x-denser copy of the same month. Carrying ts verbatim densifies
    // every time bucket by `reps`, which makes any unkeyed interval join's
    // OUTPUT grow as reps^2 (measured: q10 pairs 5.7e7 at 10x but 5.7e9 at
    // 100x, OOM) — a replication artifact, not an operator cost. Hour
    // alignment keeps bucket boundaries consistent; replicas are
    // bucket-disjoint, so interval-join output scales by reps.
    // Normalize ts to long NANOS whatever the driver wrote (nanos-long or
    // timestamp[us] parquet) — the upscaled dir always stores nanos longs,
    // which is the Tables.events LongType branch on re-read.
    val ev0 = tbl("events")
    val ev = ev0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => ev0
      case dt => ev0.withColumn("ts", graft.core.Tables.tsMicros(dt) * lit(1000L))
    }
    val evSpan = maxOf(ev, "event_id") + 1
    val userSpan = maxOf(ev, "user_id") + 1
    val hourNs = 3600L * 1000000000L
    val (tsMin, tsMax) = {
      val r = ev.agg(min(col("ts")), max(col("ts"))).head()
      (r.getLong(0), r.getLong(1))
    }
    // +2, not +1: the shift must exceed the history span by MORE than the
    // q10 interval-join window (1h inclusive), or boundary events of replica
    // r still pair with the first events of r+1 (gap would be <= 1h)
    val tsSpan = ((tsMax - tsMin) / hourNs + 2) * hourNs
    val uniform = rep(ev)
      .withColumn("event_id", shift("event_id", evSpan))
      .withColumn("user_id", shift("user_id", userSpan))
      .withColumn("ts", shift("ts", tsSpan))
    val skewed =
      if (hotPct <= 0) uniform
      else uniform.withColumn("user_id",
        when(pmod(xxhash64(col("event_id")), lit(100)) < hotPct, lit(0L))
          .otherwise(col("user_id")))
    write(skewed.drop("_r", "_rl"), "events")

    val docs = tbl("documents")
    val docSpan = maxOf(docs, "doc_id") + 1
    val toks = graft.functions.TextOps.tokens(col("text"))
    val salted = concat_ws(" ",
      zip_with(toks, sequence(lit(0), size(toks) - 1), (t, i) =>
        when(pmod(i, lit(3)) < 2,
          concat(lit("zz"), conv(abs(hash(col("doc_id"), col("_r"), i)).cast("string"), 10, 16)))
          .otherwise(t)))
    write(rep(docs)
      .withColumn("doc_id", shift("doc_id", docSpan))
      // replica 0 stays VERBATIM (the rebuilt string would collapse unusual
      // whitespace and drift the baseline comparison); only replicas > 0 are
      // decorrelated
      .withColumn("text", when(col("_r") === 0, col("text")).otherwise(salted))
      .withColumn("lang", when(col("_r") === 0, col("lang"))
        .otherwise(concat(col("lang"), lit("_"), col("_r"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_r", "_rl"), "documents")

    val emb = tbl("embeddings")
    val vecSpan = maxOf(emb, "vec_id") + 1
    val labelSpan = emb.agg(max(col("label"))).head().getInt(0).toLong + 1
    write(rep(emb)
      .withColumn("vec_id", shift("vec_id", vecSpan))
      .withColumn("label", (col("label") + col("_rl") * lit(labelSpan)).cast("int"))
      .drop("_r", "_rl"), "embeddings")

    println(s"""{"upscaled":"$dst","reps":$reps}""")
    spark.stop()
  }
}
