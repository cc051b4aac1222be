package graft

import graft.operators.Curation
import graft.functions.TextOps
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-budget fill semantics: greedy best-first selection per stratum,
  * budget boundary behavior, and the prefilter's exactness guarantee (the
  * scale path must change nothing).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toks(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("greedy fill keeps best-first within budget; ties break by id") {
    import spark.implicits._
    val docs = Seq(
      (1L, toks(10), "a", 0.9),
      (2L, toks(10), "a", 0.8), // ties with 3: lower id wins the slot
      (3L, toks(10), "a", 0.8),
      (4L, toks(5), "b", 0.1), // stratum under budget: kept regardless of score
      (5L, toks(30), "c", 0.9),
      (6L, toks(10), "c", 0.8)) // 30 + 10 > 25: excluded
      .toDF("doc_id", "text", "lang", "q")
    val out = Curation.tokenBudget(docs, budgetTokens = 25L, score = col("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // lang a: 0.9 then the 0.8 tie won by id 2 (cum 20); id 3 would hit 30.
    // lang b: under budget, all kept. lang c: best doc alone exceeds the
    // budget (cum 30 > 25) and blocks the prefix — nothing kept.
    assert(out == Set((1L, "a", 10L, 10L), (2L, "a", 10L, 20L), (4L, "b", 5L, 5L)),
      s"unexpected fill: $out")
  }

  test("a top-ranked document larger than the whole budget is excluded (cum > budget)") {
    import spark.implicits._
    val docs = Seq(
      (1L, toks(40), "a", 0.9), // alone exceeds the budget
      (2L, toks(10), "a", 0.8))
      .toDF("doc_id", "text", "lang", "q")
    val out = Curation.tokenBudget(docs, budgetTokens = 25L, score = col("q"))
      .collect().map(_.getLong(0)).toSet
    // greedy is a PREFIX fill: the oversized best doc blocks the stratum
    // (cum 40 > 25 for doc 1; doc 2 lands at cum 50) — nothing qualifies
    assert(out == Set.empty[Long], s"prefix-fill contract: $out")
  }

  test("prefilter path is exactly equal to the full window across budgets") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val score = TextOps.qualityScore(col("text"))
    for (budget <- Seq(50L, 500L, 5000L, 1000000L)) {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val slow = rows(Curation.tokenBudget(docs, budget, score, prefilter = false))
      // forced engagement (minTokens = 0): the threshold machinery itself
      val forced = rows(Curation.tokenBudget(docs, budget, score, prefilterMinTokens = 0L))
      assert(forced == slow, s"engaged prefilter must be lossless at budget=$budget")
      // default engagement bar: tiny strata pass through untouched
      val auto = rows(Curation.tokenBudget(docs, budget, score))
      assert(auto == slow, s"auto prefilter must be lossless at budget=$budget")
    }
  }

  test("stratifiedSample: deterministic, nested across rates, rate-accurate") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSeq
    val lowRates = langs.map(_ -> 0.3).toMap
    val highRates = langs.map(_ -> 0.7).toMap

    def ids(rates: Map[String, Double], reshuffle: Boolean): Set[Long] = {
      val d = if (reshuffle) docs.repartition(13) else docs
      Curation.stratifiedSample(d, rates, seed = 42L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val low = ids(lowRates, reshuffle = false)
    // deterministic: same set under a different partitioning
    assert(ids(lowRates, reshuffle = true) == low)
    // nested: the 30% sample is a strict subset of the 70% sample
    val high = ids(highRates, reshuffle = false)
    assert(low.subsetOf(high), "raising rates must only add documents")
    // rate-accurate within binomial noise (n = corpus size)
    val n = docs.count().toDouble
    assert(math.abs(low.size / n - 0.3) < 0.15, s"~30% expected, got ${low.size / n}")
    assert(math.abs(high.size / n - 0.7) < 0.15, s"~70% expected, got ${high.size / n}")
    // rate 0 / rate 1 extremes are exact
    assert(ids(langs.map(_ -> 0.0).toMap, reshuffle = false).isEmpty)
    assert(ids(langs.map(_ -> 1.0).toMap, reshuffle = false).size == n.toLong)
  }

  test("redact scrubs emails, IPs, and phones sequentially with exact counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at jo.doe+spam@mail-host.org or admin@x.io thanks"),
      (2L, "server 10.0.255.7 and 192.168.1.1 are up"),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "ip 10.0.0.1 then phone 555-123-9999"), // ip must not double-count as phone
      (5L, "nothing sensitive here"),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.operators.Curation.redact(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4)), r.getString(5))).toMap
    assert(out(1L)._1 == ((2, 0, 0)), s"two emails: ${out(1L)}")
    assert(out(1L)._2 == "reach me at [PII] or [PII] thanks")
    assert(out(2L)._1 == ((0, 2, 0)), s"two ips: ${out(2L)}")
    assert(out(3L)._1 == ((0, 0, 1)), s"one phone: ${out(3L)}")
    assert(out(3L)._2 == "call [PII] now")
    assert(out(4L)._1 == ((0, 1, 1)), s"ip and phone counted once each: ${out(4L)}")
    assert(out(5L)._1 == ((0, 0, 0)) && out(5L)._2 == "nothing sensitive here")
    assert(out(6L)._1 == ((0, 0, 0)) && out(6L)._2 == "", "null text redacts to empty")
  }

  test("null strata survive the prefilter via fallback") {
    import spark.implicits._
    val docs = Seq(
      (1L, toks(10), "a", 0.9),
      (2L, toks(10), null.asInstanceOf[String], 0.5),
      (3L, toks(10), null.asInstanceOf[String], 0.9))
      .toDF("doc_id", "text", "lang", "q")
    // minTokens = 0 forces the threshold machinery, whose equi-join always
    // drops the null stratum — the fallback must restore it
    val out = Curation.tokenBudget(docs, budgetTokens = 15L, score = col("q"),
        prefilterMinTokens = 0L)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(out == Set((1L, Some("a")), (3L, None)),
      s"null stratum fills independently: $out")
  }
}
