package graft

import graft.core.{Changelog, ChangelogSpec, Tables}
import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CollapseWindowToMaxBy optimizer rule: fires on the top-row-per-key
  * window pattern (plan becomes an aggregate — map-side combinable), leaves
  * k>1 rankings untouched, and never changes results.
  */
class CollapseRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val spec = ChangelogSpec(Seq("user_id", "event_type"), "event_id", Some("is_delete"))

  private def events = Tables.events(spark, TestSpark.Sf0001)

  test("rule rewrites windowed collapse (k=1) to max_by aggregate") {
    val df = Changelog.collapseWindowed(events, spec, 1)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_by"), optimized.take(1500))
    assert(!optimized.contains("Window"), "window must be rewritten away:\n" + optimized.take(1500))
  }

  test("rewritten windowed collapse returns exactly collapse()'s rows") {
    val viaWindow = Changelog.collapseWindowed(events, spec, 1)
      .select("user_id", "event_type", "event_id", "value")
      .collect().map(_.toSeq).toSet
    val viaAgg = Changelog.collapse(events, spec)
      .select("user_id", "event_type", "event_id", "value")
      .collect().map(_.toSeq).toSet
    assert(viaWindow == viaAgg)
  }

  test("k > 1 ranking keeps its window (rule must not fire)") {
    val df = Changelog.collapseWindowed(events, spec, 2)
    assert(df.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("null order keys: rewrite matches window semantics (outer-join shape)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // groups: (1) mixed null/non-null order keys, (2) all-null, (3) plain
    val df = Seq(
      (1L, Some(10L), "m1"), (1L, None, "m-null"), (1L, Some(7L), "m2"),
      (2L, None, "only-null"),
      (3L, Some(5L), "plain"))
      .toDF("k", "ord", "payload")
    val w = Window.partitionBy($"k").orderBy($"ord".desc) // desc = nulls last
    val viaWindow = df.withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1).drop("_rn")
    assert(viaWindow.queryExecution.optimizedPlan.toString.contains("max_by"),
      "rewrite should fire on this shape")
    val got = viaWindow.select("k", "ord", "payload").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSet
    assert(got == Set(
      (1L, Some(10L), "m1"),     // largest non-null wins, null key last
      (2L, None, "only-null"),   // all-null group still yields its row
      (3L, Some(5L), "plain")), s"got $got")
  }

  test("non-default null ordering (desc_nulls_first) must NOT be rewritten") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, Some(10L), "a"), (1L, None, "b")).toDF("k", "ord", "payload")
    val w = Window.partitionBy($"k").orderBy($"ord".desc_nulls_first)
    val viaWindow = df.withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1).drop("_rn")
    assert(viaWindow.queryExecution.optimizedPlan.toString.contains("Window"))
    val got = viaWindow.collect().map(r => (r.getLong(0), Option(r.get(1)), r.getString(2))).toSet
    assert(got == Set((1L, None, "b")))
  }

  test("as-of join is rewritten to aggregate and stays correct") {
    val errors = events.filter(col("event_type") === "error")
    val clicks = events.filter(col("event_type") === "click")
    val joined = AsOf.join(errors, clicks, Seq("user_id" -> "user_id"),
      "ts_us", "ts_us", Seq("event_id"), Seq("event_id"))
      .select(col("l.event_id").as("error_id"), col("r.event_id").as("click_id"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("max_by"),
      "as-of rank-1 should lower to max_by")
    // correctness vs a literal reimplementation with groupBy
    val expected = errors.as("l").join(clicks.as("r"),
        col("l.user_id") === col("r.user_id") && col("r.ts_us") <= col("l.ts_us"), "left")
      .groupBy(col("l.event_id").as("error_id"))
      .agg(max_by(col("r.event_id"), struct(col("r.ts_us"), col("r.event_id"))).as("click_id"))
    val a = joined.collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val b = expected.collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(a == b)
  }
}
