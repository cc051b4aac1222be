package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns, built from Spark's
  * codegen'd higher-order functions (`zip_with` / `aggregate`) — no UDFs, so
  * the whole expression stays inside WholeStageCodegen.
  *
  * Accumulation is in Double, folding left-to-right in element order; this is
  * deterministic (same result on every run/partitioning) because the fold is
  * per-row, not a distributed aggregate.
  */
object VectorOps {

  /** Dot product of two float-array columns, accumulated in double.
    * Lowers to the native single-loop [[graft.plans.FloatVecDot]] expression
    * (registered by GraftExtensions) — same arithmetic as the higher-order
    * form but without allocating the zipped intermediate array per pair. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_vec_dot", a, b)

  /** Reference higher-order-function implementation of [[dot]]; kept for
    * equivalence testing of the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, normSq(a), normSq(b))

  /** Cosine with PRE-COMPUTED squared norms. For pairwise scoring,
    * materialize `normSq(vec)` once per row and pass it here: norms are 2/3
    * of the per-pair flops, so this is ~3x fewer operations than [[cosine]]
    * on all-pairs workloads — with bit-identical results (same dot/sqrt
    * arithmetic, the norm is just computed once instead of per pair). */
  def cosineWithNorms(a: Column, b: Column, naSq: Column, nbSq: Column): Column =
    when(naSq === 0.0 || nbSq === 0.0, lit(0.0))
      .otherwise(dot(a, b) / sqrt(naSq * nbSq))

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(
      aggregate(
        zip_with(a, b, (x, y) => {
          val diff = x.cast("double") - y.cast("double")
          diff * diff
        }),
        lit(0.0),
        (acc, x) => acc + x))

  /** Pre-normalized copy of a vector (unit L2); vectors should be normalized
    * once up front so batch cosine reduces to a dot product — at 100 TB this
    * halves the per-pair flops and lets the scan cache the normalized form.
    *
    * zip_with against array_repeat(norm, d), NOT `transform(a, x => x/n)`:
    * a norm referenced inside a transform lambda is re-evaluated PER
    * ELEMENT (higher-order functions do no cross-invocation subexpression
    * elimination), turning the O(d) normalize into O(d^2) flops per row —
    * at d=1024 that is ~1M multiply-adds where ~2k suffice, on exactly the
    * corpus-wide pass this function exists to make cheap. array_repeat
    * evaluates its element argument once. */
  def normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(
      zip_with(a, array_repeat(n, size(a)), (x, nn) => (x.cast("double") / nn).cast("float")))
  }

  /** Sign bucket for random-hyperplane LSH: the bit vector of
    * `sign(dot(v, plane_i))` packed into a Long. `planes` must be a literal
    * array-of-arrays column (the hyperplanes, broadcast by codegen). */
  def hyperplaneBucket(v: Column, planes: Column): Column =
    aggregate(
      transform(planes, p => when(dot(v, p) >= 0.0, 1L).otherwise(0L)),
      lit(0L),
      (acc, bit) => acc * 2 + bit)
}
