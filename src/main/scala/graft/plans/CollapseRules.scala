package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule rewriting the top-row-per-key window pattern
  *
  * {{{ Project(p, Filter(rn = 1, Window(rn <- row_number over (partition by k order by s), child))) }}}
  *
  * into a `max_by`/`min_by` hash aggregation
  *
  * {{{ Project(p, Project(k ++ newest.*, Aggregate(k, max_by(struct(others), s), child))) }}}
  *
  * — the reference's MVCC collapse (kv/db/db_iter.cpp:191-228) in its
  * cheapest distributed form: a hash aggregate gets map-side partial
  * aggregation, so each map task emits one candidate row per key and the
  * shuffle carries ~|keys| rows instead of the full version history. A
  * window sort shuffles and sorts everything. At changelog scale (hot keys,
  * long histories) this is the dominant cost of the collapse.
  *
  * Safety conditions (else no rewrite):
  *   - exactly one window expression, a bare `row_number()`;
  *   - the filter is `rn = 1` / `rn <= 1` and nothing above references rn
  *     (guaranteed by matching the enclosing Project);
  *   - partition and order keys are plain attributes, one common sort
  *     direction (desc -> max_by, asc -> min_by).
  *
  * Tie semantics: the window picks an arbitrary row among equal order keys;
  * `max_by` over a single struct likewise picks one row atomically (never a
  * column mix), so determinism is unchanged — and changelog seqs are unique
  * by construction (kv/db/dbformat.h:63-67).
  */
object CollapseWindowToMaxBy extends Rule[LogicalPlan] with PredicateHelper {

  /** Is `e` the `rn = 1` / `rn <= 1` predicate on `rn`? */
  private def isRnOne(e: Expression, rn: Attribute): Boolean = e match {
    case EqualTo(a: Attribute, Literal(1, _)) => a.exprId == rn.exprId
    case EqualTo(Literal(1, _), a: Attribute) => a.exprId == rn.exprId
    case LessThanOrEqual(a: Attribute, Literal(1, _)) => a.exprId == rn.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
          Filter(cond,
            Window(Seq(rnAlias @ Alias(WindowExpression(_: RowNumber, spec), _)), partSpec, orderSpec, child, _)))
        if spec.partitionSpec == partSpec && spec.orderSpec == orderSpec
          && partSpec.nonEmpty && partSpec.forall(_.isInstanceOf[Attribute])
          && orderSpec.nonEmpty && orderSpec.forall(_.child.isInstanceOf[Attribute])
          && (orderSpec.forall(_.direction == Descending) || orderSpec.forall(_.direction == Ascending))
          // null-ordering parity: the order key is struct-wrapped below, and
          // struct comparison places null FIELDS smallest — which matches the
          // window only for the default orderings (DESC NULLS LAST / ASC
          // NULLS FIRST). Non-default null placement => no rewrite.
          && orderSpec.forall(s =>
            (s.direction == Descending && s.nullOrdering == NullsLast) ||
              (s.direction == Ascending && s.nullOrdering == NullsFirst)) => {
      val rn = rnAlias.toAttribute
      // other predicates may have been merged into the rn filter (e.g. the
      // tombstone filter); keep them as a residual filter over the aggregate
      val (rnPreds, residual) = splitConjunctivePredicates(cond).partition(isRnOne(_, rn))
      val keys = partSpec.map(_.asInstanceOf[Attribute])
      val others = child.output.filterNot(a => keys.exists(_.exprId == a.exprId))
      val safe = rnPreds.nonEmpty &&
        residual.forall(!_.references.contains(rn)) &&
        !projList.exists(_.references.contains(rn)) &&
        others.nonEmpty
      if (!safe) p
      else {
        // ALWAYS struct-wrap the order key: max_by/min_by silently drop rows
        // whose bare order key is NULL, but a struct with null fields is
        // non-null and ordered nulls-smallest — preserving the window's
        // pick-one-row-per-group semantics even for groups whose order keys
        // are all null (e.g. the unmatched side of an outer join).
        val orderKey = CreateStruct(orderSpec.map(_.child))
        val payload = CreateStruct(others)
        val agg =
          if (orderSpec.head.direction == Descending) MaxBy(payload, orderKey)
          else MinBy(payload, orderKey)
        val newestAlias = Alias(
          AggregateExpression(agg, Complete, isDistinct = false), "_graft_newest")()
        val aggregate = Aggregate(keys, keys :+ newestAlias, child)
        // re-expose the child's columns under their ORIGINAL exprIds so the
        // enclosing Project's references keep resolving
        val restore = keys ++ others.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(newestAlias.toAttribute, i, Some(a.name)), a.name)(exprId = a.exprId)
        }
        val restored: LogicalPlan = Project(restore, aggregate)
        val filtered = residual.reduceOption(And).map(Filter(_, restored)).getOrElse(restored)
        Project(projList, filtered)
      }
    }
  }
}

/** SparkSessionExtensions hook: `GraftSession` injects this so every plan
  * built through the engine gets the collapse rewrite and the engine's
  * native functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, StringType}

  // one arity check + one extractor per literal shape, shared by every
  // builder below: a wrong-arity SQL call must surface as a clear
  // argument-count error, not a raw IndexOutOfBoundsException from
  // children(1), and the literal-extraction boilerplate must not be
  // copy-pasted per function (it was — and drifted on which builders
  // checked arity at all)
  private def arity(name: String, sig: String, children: Seq[Expression], n: Int): Unit =
    if (children.length != n) throw new IllegalArgumentException(
      s"$name($sig) takes $n arguments, got ${children.length}")

  private def intLit(name: String, sig: String, role: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name($sig): $role must be an integer literal, got $other")
  }

  private def floatMatrixLit(name: String, sig: String, role: String, e: Expression): Array[Array[Float]] = e match {
    case Literal(arr: ArrayData, ArrayType(ArrayType(FloatType, _), _)) =>
      Array.tabulate(arr.numElements())(i => arr.getArray(i).toFloatArray())
    case other => throw new IllegalArgumentException(
      s"$name($sig): $role must be an array<array<float>> literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CollapseWindowToMaxBy)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_simhash64", "hashes", children, 1)
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FloatVecDot].getName, "graft_vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_vec_dot", "a, b", children, 2)
        FloatVecDot(children(0), children(1))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_sorted_intersect_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedLongIntersectCount].getName, "graft_sorted_intersect_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_sorted_intersect_count", "a, b", children, 2)
        SortedLongIntersectCount(children(0), children(1))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_centroid_probes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CentroidProbes].getName, "graft_centroid_probes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_centroid_probes", "vec, cents, k", children, 3)
        val cents = floatMatrixLit("graft_centroid_probes", "vec, cents, k", "cents", children(1))
        val k = intLit("graft_centroid_probes", "vec, cents, k", "k", children(2))
        CentroidProbes(children.head, cents, k)
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hier_probes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HierCentroidProbes].getName, "graft_hier_probes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_hier_probes", "vec, cents, sizes, k", children, 4)
        val flat = floatMatrixLit("graft_hier_probes", "vec, cents, sizes, k", "cents", children(1))
        val sizes = children(2) match {
          case Literal(arr: ArrayData, ArrayType(IntegerType, _)) => arr.toIntArray()
          case other => throw new IllegalArgumentException(
            s"graft_hier_probes(vec, cents, sizes, k): sizes must be an array<int> literal, got $other")
        }
        require(sizes.sum == flat.length,
          s"graft_hier_probes: level sizes ${sizes.mkString(",")} do not partition ${flat.length} centroids")
        val levels = sizes.scanLeft(0)(_ + _).zip(sizes).map {
          case (off, len) => flat.slice(off, off + len)
        }
        val k = intLit("graft_hier_probes", "vec, cents, sizes, k", "k", children(3))
        HierCentroidProbes(children.head, levels, k)
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_token_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TokenHashes].getName, "graft_token_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_token_hashes", "text", children, 1)
        TokenHashes(children.head)
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bpe_tokens"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BpeTokens].getName, "graft_bpe_tokens"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_bpe_tokens", "text, vocab", children, 2)
        val vocab = children(1) match {
          case Literal(arr: ArrayData, ArrayType(StringType, _)) =>
            Array.tabulate(arr.numElements())(i =>
              if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString)
          case other => throw new IllegalArgumentException(
            s"graft_bpe_tokens(text, vocab): vocab must be an array<string> literal, got $other")
        }
        BpeTokens(children.head, vocab)
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_slots"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashSlots].getName, "graft_minhash_slots"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_minhash_slots", "arr, k", children, 2)
        MinHashSlots(children(0), intLit("graft_minhash_slots", "arr, k", "k", children(1)))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ngram_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NgramHashes].getName, "graft_ngram_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_ngram_hashes", "arr, n", children, 2)
        NgramHashes(children(0), intLit("graft_ngram_hashes", "arr, n", "n", children(1)))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_pos_ngram_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PositionalNgramHashes].getName, "graft_pos_ngram_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("graft_pos_ngram_hashes", "arr, n", children, 2)
        PositionalNgramHashes(children(0), intLit("graft_pos_ngram_hashes", "arr, n", "n", children(1)))
      }))
  }
}
