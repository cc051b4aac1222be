package graft

import graft.core.{Changelog, ChangelogSpec}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Model-based randomized test of the changelog semantics — the Spark
  * analogue of the reference's Harness (kv/test/table_test.cpp:463-718),
  * which compares engine iterators against an STL map model under random
  * workloads. Here: random Put/Delete changelogs are replayed into an
  * in-memory Map and compared against Changelog.collapse / collapseAt /
  * compact on every run.
  */
class ChangelogPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("event_id", LongType),
    StructField("value", DoubleType),
    StructField("is_delete", BooleanType)))
  private val spec = ChangelogSpec(Seq("user_id", "event_type"), "event_id", Some("is_delete"))

  private case class Op(key: Long, et: String, isDelete: Boolean, value: Double)

  private val genOps: Gen[List[Op]] = for {
    n <- Gen.choose(1, 600)
    ops <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, 40L)
      et <- Gen.oneOf("a", "b", "c")
      isDelete <- Gen.prob(0.25)
      value <- Gen.choose(-1000.0, 1000.0)
    } yield Op(key, et, isDelete, value))
  } yield ops

  /** seq = position + 1 (unique, monotone — the reference's SequenceNumber). */
  private def toDf(ops: List[Op]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        ops.zipWithIndex.map { case (op, i) =>
          Row(op.key, op.et, (i + 1).toLong, op.value, op.isDelete)
        }, 4),
      schema)

  /** The reference's read rule: per key the newest version with seq <= snap,
    * tombstones hide the key (kv/db/db_iter.cpp:191-228). */
  private def modelAt(ops: List[Op], snap: Long): Map[(Long, String), (Long, Double)] = {
    val m = mutable.Map[(Long, String), (Long, Double, Boolean)]()
    ops.zipWithIndex.foreach { case (op, i) =>
      val seq = (i + 1).toLong
      if (seq <= snap) m((op.key, op.et)) = (seq, op.value, op.isDelete)
    }
    m.collect { case (k, (seq, v, false)) => k -> (seq, v) }.toMap
  }

  private def collapsedToMap(df: DataFrame): Map[(Long, String), (Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
      (r.getAs[Long]("event_id"), r.getAs[Double]("value"))).toMap

  private def check(prop: Prop): Unit = {
    // GRAFT_SOAK=n raises the iteration count for soak runs
    val n = sys.env.get("GRAFT_SOAK").map(_.toInt).getOrElse(8)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("collapse == in-memory map replay (tombstone-aware LWW)") {
    check(Prop.forAll(genOps) { ops =>
      val got = collapsedToMap(Changelog.collapse(toDf(ops), spec))
      got == modelAt(ops, ops.size.toLong)
    })
  }

  test("collapseAt(snapshot) == model replay of the prefix") {
    check(Prop.forAll(genOps, Gen.choose(0.0, 1.0)) { (ops, frac) =>
      val snap = math.max(1L, (ops.size * frac).toLong)
      val got = collapsedToMap(Changelog.collapseAt(toDf(ops), spec, snap))
      got == modelAt(ops, snap)
    })
  }

  test("compact(retention) preserves every read at snapshot >= retention") {
    check(Prop.forAll(genOps, Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (ops, rf, sf) =>
      val n = ops.size.toLong
      val retention = math.max(1L, (n * rf).toLong)
      val snap = retention + ((n - retention) * sf).toLong
      val compacted = Changelog.compact(toDf(ops), spec, retention)
      val got = collapsedToMap(Changelog.collapseAt(compacted, spec, snap))
      got == modelAt(ops, snap)
    })
  }

  test("windowed collapse (k=1) agrees with aggregate collapse") {
    check(Prop.forAll(genOps) { ops =>
      val df = toDf(ops)
      collapsedToMap(Changelog.collapseWindowed(df, spec, 1)) ==
        collapsedToMap(Changelog.collapse(df, spec))
    })
  }

  test("pointGet returns at most one row and matches the model") {
    check(Prop.forAll(genOps, Gen.choose(0L, 40L), Gen.oneOf("a", "b", "c")) { (ops, k, et) =>
      import org.apache.spark.sql.functions.col
      val snap = math.max(1L, ops.size.toLong / 2)
      val rows = Changelog.pointGet(
        toDf(ops), spec, col("user_id") === k && col("event_type") === et, snap).collect()
      val expected = modelAt(ops, snap).get((k, et))
      rows.length <= 1 &&
        rows.headOption.map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"))) == expected
    })
  }
}
