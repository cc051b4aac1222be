package graft.queries

import graft.core.Tables
import graft.operators.AsOf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational query surface (SURVEY.md §2.2 Q7–Q20): joins, aggregations,
  * windows, top-k, set ops, scalar/array/JSON functions. The reference has no
  * relational layer (kv/include/db.h:41-110 is a KV API); these operators make
  * its data queryable as analytics and lower entirely to Spark's built-in
  * physical operators (SortMergeJoin/BroadcastHashJoin/HashAggregate/Window/
  * TakeOrderedAndProject/Generate) — SURVEY.md §4.
  *
  * Scale notes (100 TB):
  *   - dimension joins are explicitly `broadcast()` (region/nation/supplier
  *     stay tiny at any SF; the fact side never shuffles for them);
  *   - the interval join (q10) is a bucketed equi-join — each right interval
  *     lands in at most 2 hour-buckets, so the join is a standard partitioned
  *     hash join on the bucket key, NOT a broadcast-nested-loop O(n*m) scan;
  *   - aggregations use `decSum`/`decAvg` (decimal accumulate, double out):
  *     exact, order-independent, still map-side-combinable;
  *   - top-k lowers to TakeOrderedAndProject (per-partition heap + driver
  *     merge of k rows, no global sort).
  */
object RelationalQueries {
  import QueryDef._

  private val HourUs = 3600L * 1000 * 1000

  val all: Seq[QueryDef] = Seq(

    // Q7: 3-way equi inner join lineitem ⋈ orders ⋈ customer. Catalyst picks
    // SMJ/BHJ per side; AQE re-plans at runtime sizes.
    QueryDef(
      "q07_join_inner",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .select("l_orderkey", "l_linenumber", "o_custkey", "c_name", "o_totalprice")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, o_custkey, c_name, o_totalprice
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      headline = true),

    // Q8: fact ⋈ broadcast dims — revenue by region/nation through
    // lineitem ⋈ supplier ⋈ nation ⋈ region. All three dims broadcast: the
    // fact table never moves for the joins, only for the final aggregation.
    QueryDef(
      "q08_join_broadcast",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(decSum(revenueExpr).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name"),
      Some(s"""SELECT r_name, n_name, ${decSumSql(revenueSql)} AS revenue, COUNT(*) AS n_items
              |FROM lineitem
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name, n_name
              |ORDER BY r_name, n_name""".stripMargin),
      headline = true),

    // Q9: left outer join — every customer with order count and order total
    // (customers with no orders appear with n_orders = 0).
    QueryDef(
      "q09_join_left",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey", "c_name")
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            decSum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spent"))
          .orderBy("c_custkey"),
      Some(s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
              |       ${decSumSql("COALESCE(o_totalprice, 0)")} AS total_spent
              |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              |GROUP BY c_custkey, c_name
              |ORDER BY c_custkey""".stripMargin)),

    // Q9b: left semi — customers having at least one order over 150k.
    QueryDef(
      "q09b_join_semi",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(
            Tables.orders(s, dir).filter(col("o_totalprice") > 150000),
            col("c_custkey") === col("o_custkey"),
            "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
             |ORDER BY c_custkey""".stripMargin)),

    // Q9c: left anti — customers with no order above 450k.
    QueryDef(
      "q09c_join_anti",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(
            Tables.orders(s, dir).filter(col("o_totalprice") > 450000),
            col("c_custkey") === col("o_custkey"),
            "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
             |ORDER BY c_custkey""".stripMargin)),

    // Q10: interval (theta) join — purchases within 1h after a signup.
    // Scale shape: NOT a nested-loop scan. Each signup interval
    // [ts, ts+1h] spans at most 2 hour-buckets; exploding the right side to
    // those buckets turns the theta join into a bucketed equi-join (standard
    // shuffle hash join on the bucket key) with the exact interval predicate
    // applied as a post-join filter.
    QueryDef(
      "q10_join_range",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts_us").as("p_us"))
          .withColumn("bucket", expr(s"p_us div $HourUs"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("ts_us").as("s_us"))
          .withColumn("bucket", explode(array(expr(s"s_us div $HourUs"), expr(s"s_us div $HourUs") + 1)))
        signups
          .join(purchases, Seq("bucket"))
          .filter(col("p_us") >= col("s_us") && col("p_us") <= col("s_us") + HourUs)
          .select("signup_id", "purchase_id")
          .distinct() // bucket+bucket+1 can duplicate pairs on exact-boundary matches
          .orderBy("signup_id", "purchase_id")
      },
      Some(s"""SELECT b.event_id AS signup_id, a.event_id AS purchase_id
              |FROM events a, events b
              |WHERE a.event_type = 'purchase' AND b.event_type = 'signup'
              |  AND epoch_us(a.ts) >= epoch_us(b.ts)
              |  AND epoch_us(a.ts) <= epoch_us(b.ts) + $HourUs
              |ORDER BY signup_id, purchase_id""".stripMargin)),

    // Q11: as-of join — for each 'error' event, the latest 'click' of the
    // same user at or before it (the reference's "newest version <= snapshot"
    // rule, kv/db/dbformat.h:103-121, generalized to two streams).
    QueryDef(
      "q11_join_asof",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
        val clicks = ev.filter(col("event_type") === "click")
        AsOf.join(
          errors, clicks,
          keys = Seq("user_id" -> "user_id"),
          leftTime = "ts_us", rightTime = "ts_us",
          leftId = Seq("event_id"), tieBreak = Seq("event_id"))
          .select(
            col("l.event_id").as("error_id"),
            col("l.user_id").as("user_id"),
            col("r.event_id").as("click_id"),
            col("r.ts_us").as("click_us"))
          .orderBy("error_id")
      },
      Some("""SELECT error_id, user_id, click_id, click_us FROM (
             |  SELECT a.event_id AS error_id, a.user_id AS user_id,
             |         b.event_id AS click_id, epoch_us(b.ts) AS click_us,
             |         row_number() OVER (PARTITION BY a.event_id
             |                            ORDER BY b.ts DESC, b.event_id DESC) AS rn
             |  FROM (SELECT * FROM events WHERE event_type = 'error') a
             |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
             |    ON a.user_id = b.user_id AND epoch_us(b.ts) <= epoch_us(a.ts)
             |) t WHERE rn = 1 ORDER BY error_id""".stripMargin)),

    // Q11b: BOUNDED as-of join — same rule with the lookback capped at 1h.
    // The scale shape: the horizon turns the time bound into a bucketed
    // equi-join (right carries ts div h, left probes {bucket-1, bucket}), so
    // per-key join fan-out is bounded by rows per (key, 2h) window instead of
    // |lefts| x |rights| over all history on hot keys.
    QueryDef(
      "q11b_join_asof_bounded",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
        val clicks = ev.filter(col("event_type") === "click")
        AsOf.join(
          errors, clicks,
          keys = Seq("user_id" -> "user_id"),
          leftTime = "ts_us", rightTime = "ts_us",
          leftId = Seq("event_id"), tieBreak = Seq("event_id"),
          horizon = Some(HourUs))
          .select(
            col("l.event_id").as("error_id"),
            col("l.user_id").as("user_id"),
            col("r.event_id").as("click_id"),
            col("r.ts_us").as("click_us"))
          .orderBy("error_id")
      },
      Some(s"""SELECT error_id, user_id, click_id, click_us FROM (
              |  SELECT a.event_id AS error_id, a.user_id AS user_id,
              |         b.event_id AS click_id, epoch_us(b.ts) AS click_us,
              |         row_number() OVER (PARTITION BY a.event_id
              |                            ORDER BY b.ts DESC, b.event_id DESC) AS rn
              |  FROM (SELECT * FROM events WHERE event_type = 'error') a
              |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
              |    ON a.user_id = b.user_id AND epoch_us(b.ts) <= epoch_us(a.ts)
              |   AND epoch_us(b.ts) >= epoch_us(a.ts) - $HourUs
              |) t WHERE rn = 1 ORDER BY error_id""".stripMargin)),

    // Q11c: the same unbounded as-of rule as q11 via the SORTED
    // CARRY-FORWARD form — one (key)-partitioned sort instead of a
    // history-deep join: linear on any key distribution (the zipf study's
    // skew-immune path; q11's join form OOMs on a 5%-hot key at 100x).
    QueryDef(
      "q11c_join_asof_sorted",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
        val clicks = ev.filter(col("event_type") === "click")
        AsOf.joinSorted(
          errors, clicks,
          keys = Seq("user_id" -> "user_id"),
          leftTime = "ts_us", rightTime = "ts_us",
          tieBreak = Seq("event_id"))
          .select(
            col("event_id").as("error_id"),
            col("user_id"),
            col("r_event_id").as("click_id"),
            col("r_ts_us").as("click_us"))
          .orderBy("error_id")
      },
      Some("""SELECT error_id, user_id, click_id, click_us FROM (
             |  SELECT a.event_id AS error_id, a.user_id AS user_id,
             |         b.event_id AS click_id, epoch_us(b.ts) AS click_us,
             |         row_number() OVER (PARTITION BY a.event_id
             |                            ORDER BY b.ts DESC, b.event_id DESC) AS rn
             |  FROM (SELECT * FROM events WHERE event_type = 'error') a
             |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
             |    ON a.user_id = b.user_id AND epoch_us(b.ts) <= epoch_us(a.ts)
             |) t WHERE rn = 1 ORDER BY error_id""".stripMargin)),

    // Q12: hash aggregation, TPC-H Q1 shape — partial (map-side) agg then
    // final, decimal accumulation for order-independent money sums.
    QueryDef(
      "q12_agg_hash",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            decSum(col("l_quantity")).as("sum_qty"),
            decSum(col("l_extendedprice")).as("sum_base_price"),
            decSum(revenueExpr).as("sum_disc_price"),
            decSum(revenueExpr * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            decAvg(col("l_quantity")).as("avg_qty"),
            decAvg(col("l_extendedprice")).as("avg_price"),
            decAvg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${decSumSql("l_quantity")} AS sum_qty,
              |  ${decSumSql("l_extendedprice")} AS sum_base_price,
              |  ${decSumSql(revenueSql)} AS sum_disc_price,
              |  ${decSumSql(s"$revenueSql * (1 + l_tax)")} AS sum_charge,
              |  ${decAvgSql("l_quantity")} AS avg_qty,
              |  ${decAvgSql("l_extendedprice")} AS avg_price,
              |  ${decAvgSql("l_discount")} AS avg_disc,
              |  COUNT(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // Q13: distinct aggregation — customers and orders per calendar month.
    QueryDef(
      "q13_agg_distinct",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(
            year(col("o_orderdate")).cast("long").as("o_year"),
            month(col("o_orderdate")).cast("long").as("o_month"))
          .agg(
            countDistinct(col("o_custkey")).as("n_cust"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_year", "o_month"),
      Some("""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             |       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
             |       COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
             |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin)),

    // Q13b: sketch variant — HLL approximate distinct (O17's sketch
    // analogue). Not exactly reproducible in another engine, so no SQL
    // oracle; exactness bounds are asserted in AggregationSpec.
    QueryDef(
      "q13b_agg_approx",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"))
          .orderBy("o_year"),
      None),

    // Q14: rollup — revenue by (nation, order priority) with subtotals and
    // grand total. grouping_id disambiguates synthetic NULLs.
    QueryDef(
      "q14_rollup",
      (s, dir) => {
        // Expressed through the engine's SQL surface: Spark 4's
        // ambiguous-self-join check false-positives on the Dataset
        // rollup().agg() form after multi-table joins (Expand duplicates the
        // grouping attributes). Semantics and plan (Expand + HashAggregate)
        // are identical. Input is pruned to 3 columns before Expand
        // multiplies rows per grouping set.
        // unique view names per invocation: fixed names in the shared
        // session catalog would race under concurrent query execution
        val tag = java.util.UUID.randomUUID().toString.replace("-", "")
        Tables.orders(s, dir).createOrReplaceTempView(s"v_orders_$tag")
        Tables.customer(s, dir).createOrReplaceTempView(s"v_customer_$tag")
        Tables.nation(s, dir).createOrReplaceTempView(s"v_nation_$tag")
        val df = s.sql(
          s"""SELECT n_name, o_orderpriority, ${decSumSql("o_totalprice")} AS revenue,
             |       COUNT(*) AS n, CAST(grouping_id(n_name, o_orderpriority) AS BIGINT) AS lvl
             |FROM v_orders_$tag
             |JOIN v_customer_$tag ON o_custkey = c_custkey
             |JOIN v_nation_$tag ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, o_orderpriority)
             |ORDER BY lvl, n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
        // sql() analyzes eagerly (views are inlined into the plan) -> safe to
        // drop immediately: no catalog residue per invocation
        Seq(s"v_orders_$tag", s"v_customer_$tag", s"v_nation_$tag")
          .foreach(s.catalog.dropTempView)
        df
      },
      Some(s"""SELECT n_name, o_orderpriority, ${decSumSql("o_totalprice")} AS revenue,
              |       COUNT(*) AS n, CAST(GROUPING(n_name, o_orderpriority) AS BIGINT) AS lvl
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY ROLLUP(n_name, o_orderpriority)
              |ORDER BY lvl, n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // Q14b: full cube over (market segment, order status).
    QueryDef(
      "q14b_cube",
      (s, dir) => {
        val tag = java.util.UUID.randomUUID().toString.replace("-", "")
        Tables.orders(s, dir).createOrReplaceTempView(s"v_orders_$tag")
        Tables.customer(s, dir).createOrReplaceTempView(s"v_customer_$tag")
        val df = s.sql(
          s"""SELECT c_mktsegment, o_orderstatus, ${decSumSql("o_totalprice")} AS revenue,
             |       COUNT(*) AS n, CAST(grouping_id(c_mktsegment, o_orderstatus) AS BIGINT) AS lvl
             |FROM v_orders_$tag JOIN v_customer_$tag ON o_custkey = c_custkey
             |GROUP BY CUBE(c_mktsegment, o_orderstatus)
             |ORDER BY lvl, c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin)
        Seq(s"v_orders_$tag", s"v_customer_$tag").foreach(s.catalog.dropTempView)
        df
      },
      Some(s"""SELECT c_mktsegment, o_orderstatus, ${decSumSql("o_totalprice")} AS revenue,
              |       COUNT(*) AS n, CAST(GROUPING(c_mktsegment, o_orderstatus) AS BIGINT) AS lvl
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY CUBE(c_mktsegment, o_orderstatus)
              |ORDER BY lvl, c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    // Q15: ranking windows — orders ranked per customer by date.
    QueryDef(
      "q15_window_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, dir)
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            row_number().over(w).cast("long").as("rn"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            ntile(4).over(w).cast("long").as("quartile"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  CAST(row_number() OVER w AS BIGINT) AS rn,
             |  CAST(rank() OVER w AS BIGINT) AS rnk,
             |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
      headline = true),

    // Q16: analytic windows with frames — lag/lead, running first, a 4-row
    // moving sum (decimal accumulate) and a 1h range-frame count on the
    // events changelog per user. The range frame orders by the integer
    // micros column (tie-insensitive: equal ts_us rows share a frame).
    QueryDef(
      "q16_window_frames",
      (s, dir) => {
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val wMov = wOrd.rowsBetween(-3, 0)
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, 0)
        val wRange = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-HourUs, 0)
        Tables.events(s, dir)
          .select(
            col("user_id"), col("event_id"), col("ts_us"), col("value"),
            lag(col("value"), 1).over(wOrd).as("prev_v"),
            lead(col("value"), 1).over(wOrd).as("next_v"),
            first(col("value")).over(wRun).as("first_v"),
            sum(col("value").cast(DecimalType(30, 10))).over(wMov).cast("double").as("mov_sum4"),
            count(lit(1)).over(wRange).as("n_1h"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
             |  lag(value, 1) OVER wo AS prev_v,
             |  lead(value, 1) OVER wo AS next_v,
             |  first_value(value) OVER (wo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
             |  CAST(SUM(CAST(value AS DECIMAL(30,10))) OVER (wo ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum4,
             |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
             |                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h
             |FROM events
             |WINDOW wo AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Q17: global top-k — TakeOrderedAndProject (per-partition heap, no full
    // sort): top-10 customers by lifetime revenue.
    QueryDef(
      "q17_topk",
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .groupBy("c_custkey", "c_name")
          .agg(decSum(col("o_totalprice")).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(10),
      Some(s"""SELECT c_custkey, c_name, ${decSumSql("o_totalprice")} AS revenue
              |FROM customer JOIN orders ON c_custkey = o_custkey
              |GROUP BY c_custkey, c_name
              |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin),
      headline = true),

    // Q18: set operations — customer key sets of two order periods, all
    // three ops tagged into one deterministic result.
    QueryDef(
      "q18_setops",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        def keys(year: Int) =
          o.filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
              col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
            .select(col("o_custkey"))
        val a = keys(1996)
        val b = keys(2000)
        (a.union(b).distinct().withColumn("op", lit("union")))
          .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
          .unionByName(a.except(b).withColumn("op", lit("except")))
          .select("op", "o_custkey")
          .orderBy("op", "o_custkey")
      },
      Some("""WITH a AS (SELECT o_custkey FROM orders
             |           WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
             |     b AS (SELECT o_custkey FROM orders
             |           WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_orderdate < TIMESTAMP '2001-01-01')
             |SELECT 'union' AS op, o_custkey FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
             |UNION ALL
             |SELECT 'intersect' AS op, o_custkey FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
             |UNION ALL
             |SELECT 'except' AS op, o_custkey FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
             |ORDER BY op, o_custkey""".stripMargin)),

    // Q19: scalar string functions over part.
    QueryDef(
      "q19_scalar_string",
      (s, dir) =>
        Tables.part(s, dir)
          .select(
            col("p_partkey"),
            upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
            concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
            element_at(split(col("p_name"), " "), 2).as("second_word"),
            regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
            length(col("p_name")).cast("long").as("name_len"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  upper(substring(p_name, 1, 8)) AS name_prefix,
             |  concat(p_brand, '/', p_type) AS brand_type,
             |  string_split(p_name, ' ')[2] AS second_word,
             |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
             |  CAST(length(p_name) AS BIGINT) AS name_len
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Q19b: scalar date/math/conditional functions over orders.
    QueryDef(
      "q19b_scalar_datemath",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year"),
            date_trunc("month", col("o_orderdate")).as("o_month_start"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
            abs(col("o_totalprice") - 150000.0).as("price_dist"),
            round(sqrt(col("o_orderkey").cast("double")) + pow(col("o_orderkey") % 97, 2), 6).as("math_mix"),
            when(col("o_orderstatus") === "O", "open")
              .when(col("o_orderstatus") === "F", "finished")
              .otherwise("partial").as("status_word"),
            coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("URGENT!")).as("prio"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month_start,
             |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
             |  abs(o_totalprice - 150000.0) AS price_dist,
             |  round(sqrt(CAST(o_orderkey AS DOUBLE)) + pow(o_orderkey % 97, 2), 6) AS math_mix,
             |  CASE WHEN o_orderstatus = 'O' THEN 'open'
             |       WHEN o_orderstatus = 'F' THEN 'finished'
             |       ELSE 'partial' END AS status_word,
             |  COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Q20: arrays — explode (Generate, flatMap-shape: no shuffle) + per-row
    // array transforms; array outputs serialized to strings for engine-
    // neutral comparison.
    QueryDef(
      "q20_array",
      (s, dir) => {
        val toks = split(col("p_name"), " ")
        val parts = Tables.part(s, dir)
        val counts = parts
          .select(explode(toks).as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("n"))
        val perPart = parts.select(
          col("p_partkey").cast("string").as("tok_key"),
          lit("part").as("kind"),
          array_join(array_sort(array_distinct(toks)), ",").as("payload"))
        counts
          .select(col("tok").as("tok_key"), lit("tok").as("kind"), col("n").cast("string").as("payload"))
          .unionByName(perPart)
          .orderBy("kind", "tok_key")
      },
      Some("""SELECT tok AS tok_key, 'tok' AS kind, CAST(COUNT(*) AS VARCHAR) AS payload
             |FROM (SELECT unnest(string_split(p_name, ' ')) AS tok FROM part) GROUP BY tok
             |UNION ALL
             |SELECT CAST(p_partkey AS VARCHAR) AS tok_key, 'part' AS kind,
             |       array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS payload
             |FROM part
             |ORDER BY kind, tok_key""".stripMargin)),

    // Q20b: JSON — parse events.props with from_json (typed schema) and
    // aggregate the extracted field. The oracle extracts the same value with
    // a regexp so it carries no engine-specific JSON dependency.
    QueryDef(
      "q20b_json",
      (s, dir) =>
        Tables.events(s, dir)
          .select(
            col("event_type"),
            from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
          .groupBy("event_type")
          .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(k) AS n_k, CAST(SUM(k) AS BIGINT) AS sum_k,
             |       min(k) AS min_k, max(k) AS max_k
             |FROM (SELECT event_type,
             |             CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS k
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
