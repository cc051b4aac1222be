package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}

/** Native codegen'd SimHash: fold an `array<long>` of token hashes into the
  * 64-bit signature in ONE pass (64 sign counters), instead of 64 separate
  * higher-order-function folds re-traversing the array per bit. This is the
  * engine's hot-path custom Expression (SURVEY.md §4: prefer a native
  * Expression with doGenCode over UDFs when built-ins can't express the op
  * efficiently) — on corpus-scale simhash dedup the single-pass fold is the
  * difference between O(n) and O(64·n) array traversals per document.
  *
  * Semantics (identical to the HOF form in TextOps.simHashFromHashesHof):
  * bit b of the result is set iff sum over hashes h of (bit b of h ? +1 : -1)
  * is positive; null array elements are skipped.
  */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  // AbstractDataType is private[sql]; Seq covariance lets the override
  // narrow to the public DataType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) res |= (1L << b)
      b += 1
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val res = ctx.freshName("res")
      s"""
         |int[] $counts = new int[64];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $arr.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $res = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $res |= (1L << $b);
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Native codegen'd dot product of two `array<float>` embedding columns,
  * accumulated in double, left-to-right — semantically identical to the
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` form in VectorOps
  * (null element or length mismatch => null, matching zip_with's padding
  * null), but as ONE generated loop with no intermediate zipped-array
  * allocation per pair. On all-pairs similarity scoring the intermediate
  * array is the dominant allocation cost.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd intersection size of two SORTED `array<long>` columns
  * (distinct elements, ascending) — one merge walk, no hash sets, no
  * allocation. The per-pair kernel of exact Jaccard verification over
  * hashed shingle sets: `array_intersect` builds a hash set per call, which
  * dominates all-pairs verify cost. Callers sort once per document
  * (`sort_array`), pairs are O(n+m).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  // CONTRACT: element-NULL-FREE sorted arrays. A null slot reads as 0L
  // through ArrayData.getLong (two null slots would "intersect"), unlike
  // array_intersect which treats null as a distinct value. Every caller
  // passes xxhash64 folds, which are never null; the branch-per-element
  // a defensive check would cost has no payer in this engine.
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |int $n = $a.numElements(); int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Native fused nearest-centroid probe selection for IVF ANN: for an
  * `array<float>` vector, compute the squared-L2 distance to every centroid
  * (via `||c||² - 2·q·c`, the per-row-constant `||q||²` dropped) and return
  * the indices of the `k` nearest, ascending by (distance, index) — one loop
  * over a flat primitive matrix held once per task via a reference object.
  *
  * Replaces the `transform(sequence(...), i => element_at(normsLit, i+1) -
  * 2*dot(vec, element_at(centsLit, i+1)))` + `array_min`/`array_position`
  * pipeline, which evaluates the distance array twice, chases nested
  * ArrayData literals per element, and inflates the generated code with the
  * inlined centroid matrix (a fresh multi-KB codegen compile per job).
  * Arithmetic matches the composed form exactly: double accumulation
  * left-to-right, norms as sum of `c_i² ` in double, first index wins ties.
  */
case class CentroidProbes(child: Expression, centroids: Array[Array[Float]], k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(centroids.nonEmpty, "empty centroid matrix")
  require(k >= 1 && k <= centroids.length, s"k=$k out of range for ${centroids.length} centroids")
  // ragged rows would be SILENTLY truncated by the flat copy (a longer row
  // loses its tail in `flat` while `norms` uses the full row — wrong
  // distances for every input) or throw deep in an executor; fail at
  // construction like HierCentroidProbes
  require(centroids.forall(_.length == centroids.head.length), "ragged centroid dimensions")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_centroid_probes"

  private val dim: Int = centroids.head.length
  @transient private lazy val flat: Array[Float] = {
    val f = new Array[Float](centroids.length * dim)
    var b = 0
    while (b < centroids.length) {
      System.arraycopy(centroids(b), 0, f, b * dim, dim); b += 1
    }
    f
  }
  @transient private lazy val norms: Array[Double] =
    centroids.map(ct => ct.map(x => x.toDouble * x).sum)

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.centroidProbes(input.asInstanceOf[ArrayData], flat, norms, dim, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "float[]")
    val normsRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.plans.VectorKernels.centroidProbes(
         |  $v, $flatRef, $normsRef, $dim, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidProbes =
    copy(child = newChild)
}

/** Static kernel for [[CentroidProbes]]. */
object VectorKernels {
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  /** Indices of the `k` centroids nearest to `v` by squared L2, ascending by
    * (distance, index). Returns null on dimension mismatch or null elements
    * (mirroring the null-propagating dot of the composed form). */
  def centroidProbes(
      v: ArrayData, flat: Array[Float], norms: Array[Double], dim: Int, k: Int): ArrayData = {
    if (v.numElements() != dim) return null
    val c = norms.length
    val dists = new Array[Double](c)
    val q = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      q(j) = v.getFloat(j).toDouble
      j += 1
    }
    var b = 0
    while (b < c) {
      var acc = 0.0
      val base = b * dim
      var i = 0
      while (i < dim) { acc += q(i) * flat(base + i).toDouble; i += 1 }
      dists(b) = norms(b) - 2.0 * acc
      b += 1
    }
    // partial selection sort of k smallest (k << c); stable on ties by index.
    // NaN distances (dirty embeddings) never win a `<` comparison — fall back
    // to the lowest untaken index so a NaN row degrades deterministically
    // instead of crashing the job
    val out = new Array[Int](k)
    val taken = new Array[Boolean](c)
    var s = 0
    while (s < k) {
      var best = -1
      var bestD = Double.MaxValue
      var i = 0
      while (i < c) {
        if (!taken(i) && dists(i) < bestD) { best = i; bestD = dists(i) }
        i += 1
      }
      if (best == -1) {
        var j = 0
        while (j < c && best == -1) { if (!taken(j)) best = j; j += 1 }
      }
      taken(best) = true
      out(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Beam-search descend over a hierarchical (b-ary) centroid tree — the
    * multi-level sibling of [[centroidProbes]]. `flats(l)`/`norms(l)` hold
    * level `l`'s centroids (level sizes multiply: node `p` at level `l-1`
    * parents children `[p*b, (p+1)*b)` at level `l` where
    * `b = count(l)/count(l-1)`). The beam keeps the `k` best nodes per level
    * by (distance, index) and expands only their children, so a probe costs
    * `O(k * b * depth * dim)` instead of `O(leaves * dim)` — what makes
    * corpus-side assignment affordable when the list count grows with the
    * corpus. `k = 1` is greedy descend (the assignment quantizer);
    * `k >= leaves` degenerates to the exact flat scan. Tie and NaN rules
    * match [[centroidProbes]]: lower index wins ties, NaN distances never
    * win a `<` and fall back to the lowest untaken candidate.
    *
    * GREEDY-PATH CONTAINMENT: the greedy (k = 1) descend leaf is ALWAYS in
    * the returned probes. A pure width-k beam can drop the greedy path (at
    * some level >= k children of OTHER beam nodes may outrank the greedy
    * node's best child), and assignment uses k = 1 — so without this a
    * query probing the exact vector a corpus row was assigned by could
    * miss that row's bucket, breaking self-match recall. The greedy chain
    * is tracked alongside the beam (O(b * depth * dim) extra) and spliced
    * into the last slot when the beam lost it. */
  def hierProbes(
      v: ArrayData, flats: Array[Array[Float]], norms: Array[Array[Double]],
      dim: Int, k: Int): ArrayData = {
    if (v.numElements() != dim) return null
    val q = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      q(j) = v.getFloat(j).toDouble
      j += 1
    }
    var beam: Array[Int] = Array(0)
    var gNode = 0 // the greedy (k = 1) descend node at the previous level
    var level = 0
    var prevCount = 1
    while (level < flats.length) {
      val flat = flats(level)
      val nrm = norms(level)
      val b = nrm.length / prevCount
      // the greedy chain: best child of gNode by (distance, index), same
      // tie/NaN rules — tracked independently because the beam may drop it
      var gNext = gNode * b
      var gBest = Double.MaxValue
      var gc = 0
      while (gc < b) {
        val idx = gNode * b + gc
        var acc = 0.0
        val gBase = idx * dim
        var gi = 0
        while (gi < dim) { acc += q(gi) * flat(gBase + gi).toDouble; gi += 1 }
        val d = nrm(idx) - 2.0 * acc
        if (d < gBest) { gBest = d; gNext = idx }
        gc += 1
      }
      gNode = gNext
      val nc = beam.length * b
      val cand = new Array[Int](nc)
      val dists = new Array[Double](nc)
      var ci = 0
      var bi = 0
      while (bi < beam.length) {
        val childBase = beam(bi) * b
        var c = 0
        while (c < b) {
          val idx = childBase + c
          var acc = 0.0
          val base = idx * dim
          var i = 0
          while (i < dim) { acc += q(i) * flat(base + i).toDouble; i += 1 }
          cand(ci) = idx
          dists(ci) = nrm(idx) - 2.0 * acc
          ci += 1
          c += 1
        }
        bi += 1
      }
      // partial selection of the keep best by (distance, candidate index):
      // candidates are generated in ascending index order (beam stays
      // index-sorted), so "first untaken wins ties/NaN" is index order
      val keep = math.min(k, nc)
      val sel = new Array[Int](keep)
      val taken = new Array[Boolean](nc)
      var s = 0
      while (s < keep) {
        var best = -1
        var bestD = Double.MaxValue
        var i = 0
        while (i < nc) {
          if (!taken(i) && dists(i) < bestD) { best = i; bestD = dists(i) }
          i += 1
        }
        if (best == -1) {
          var t = 0
          while (t < nc && best == -1) { if (!taken(t)) best = t; t += 1 }
        }
        taken(best) = true
        sel(s) = cand(best)
        s += 1
      }
      if (level == flats.length - 1) {
        // greedy-path containment: splice the assignment leaf into the last
        // slot if the beam lost it. If present, sel is untouched and stays
        // ascending by (distance, index). If SPLICED, ordering is NOT
        // guaranteed: the greedy chain diverged at an internal level, so
        // the spliced leaf never scored in this final candidate set and
        // its distance may beat sel(0). Consumers treat the result as a
        // probe SET (explode + bucket join) — nothing may rely on rank
        // order of the returned probes when k > 1.
        var found = false
        var t = 0
        while (t < keep && !found) { if (sel(t) == gNode) found = true; t += 1 }
        if (!found) sel(keep - 1) = gNode
        return UnsafeArrayData.fromPrimitiveArray(sel)
      }
      java.util.Arrays.sort(sel) // keep the beam index-sorted for the tie rule
      beam = sel
      prevCount = nrm.length
      level += 1
    }
    UnsafeArrayData.fromPrimitiveArray(beam) // unreachable (flats nonEmpty)
  }
}

/** Beam-search probe selection over a HIERARCHICAL centroid tree — the
  * multi-level form of [[CentroidProbes]] for indexes whose list count grows
  * with the corpus (constant target list size). A flat scan of `C` lists
  * costs `O(C * dim)` per row and turns corpus-side assignment quadratic
  * when `C ~ n`; descending a b-ary tree costs `O(k * b * log_b(C) * dim)`.
  * Returns the `k` leaf indices chosen by a width-`k` beam, ascending by
  * (distance, index) within the final level. `k = 1` is the assignment
  * quantizer; `k >= leaves` probes every list (exact). Per-level arithmetic,
  * tie-breaks, and NaN handling are identical to [[CentroidProbes]].
  *
  * The greedy (`k = 1`) leaf is guaranteed to be among the returned probes
  * regardless of `k` (see [[VectorKernels.hierProbes]]): probing with the
  * same vector a row was assigned by always reaches that row's bucket — the
  * consistency invariant IVF search correctness rests on.
  */
case class HierCentroidProbes(child: Expression, levels: Array[Array[Array[Float]]], k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(levels.nonEmpty && levels.forall(_.nonEmpty), "empty centroid level")
  require(levels.iterator.sliding(2).withPartial(false).forall(w =>
    w(1).length % w(0).length == 0 && w(1).length >= w(0).length),
    "each level's size must be a positive multiple of its parent level's")
  require(k >= 1 && k <= levels.last.length,
    s"k=$k out of range for ${levels.last.length} leaves")
  private val dim: Int = levels.head.head.length
  require(levels.forall(_.forall(_.length == dim)), "ragged centroid dimensions")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hier_probes"

  @transient private lazy val flats: Array[Array[Float]] = levels.map { m =>
    val f = new Array[Float](m.length * dim)
    var b = 0
    while (b < m.length) { System.arraycopy(m(b), 0, f, b * dim, dim); b += 1 }
    f
  }
  @transient private lazy val norms: Array[Array[Double]] =
    levels.map(_.map(ct => ct.map(x => x.toDouble * x).sum))

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.hierProbes(input.asInstanceOf[ArrayData], flats, norms, dim, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatsRef = ctx.addReferenceObj("hierFlats", flats, "float[][]")
    val normsRef = ctx.addReferenceObj("hierNorms", norms, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.plans.VectorKernels.hierProbes(
         |  $v, $flatsRef, $normsRef, $dim, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HierCentroidProbes =
    copy(child = newChild)
}

/** Static kernel for [[TokenHashes]] — called from both interpreted eval and
  * generated code (Scala emits static forwarders for standalone objects, so
  * janino sees a plain static method; one call per row, no megamorphic
  * dispatch, and the loop itself JITs like hand-written Java). */
object TextKernels {
  import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.types.UTF8String

  /** Java-regex `\s` is exactly these six ASCII bytes; UTF-8 multi-byte
    * sequences never contain ASCII values, so a byte scan is exact. */
  @inline private def isWs(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** FNV prime for the n-gram polynomial fold (odd => bijective multiply). */
  final val NgramP = 0x100000001b3L

  /** Positional n-gram polynomial fold: one combined hash per start
    * offset, order preserved, duplicates kept, null elements fold as 0 —
    * the ONE definition behind BOTH n-gram expressions' eval AND codegen
    * paths, so the fold can never drift between the distinct and
    * positional forms (catalog/probe hash interop rests on the two
    * producing identical values for identical n-grams). */
  def posNgramHashes(arr: org.apache.spark.sql.catalyst.util.ArrayData, n: Int): UnsafeArrayData = {
    val m = arr.numElements() - (n - 1)
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < n) {
        val x = if (arr.isNullAt(i + j)) 0L else arr.getLong(i + j)
        h = h * NgramP + x
        j += 1
      }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** [[posNgramHashes]] then sort + dedup — the distinct (catalog) form. */
  def ngramHashes(arr: org.apache.spark.sql.catalyst.util.ArrayData, n: Int): UnsafeArrayData = {
    val pos = posNgramHashes(arr, n)
    val m = pos.numElements()
    if (m == 0) return pos
    val out = pos.toLongArray()
    java.util.Arrays.sort(out)
    var k = 0
    var i = 0
    while (i < m) {
      if (i == 0 || out(i) != out(i - 1)) { out(k) = out(i); k += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  /** Deterministic odd multiplier + offset per minhash signature slot
    * (splitmix64 finalizer over the slot index) — the single source of the
    * constants shared by [[MinHashSlots]] and the TextOps reference form. */
  def minHashCoeffs(i: Int): (Long, Long) = {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    (mix(i.toLong * 2) | 1L, mix(i.toLong * 2 + 1))
  }

  /** One-pass minhash: k running minima over the element hashes. */
  def minHashSlots(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    val k = a.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var s = 0
        while (s < k) {
          val v = h * a(s) + b(s)
          if (v < out(s)) out(s) = v
          s += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Tokenize-and-hash in ONE pass over the UTF-8 bytes: the hash of each
    * maximal non-whitespace run, bit-identical to
    * `transform(split(trim(regexp_replace(s, "\\s+", " ")), " "), xxhash64)`
    * — including the edge case that an empty/all-whitespace input yields one
    * empty token (split of "" returns [""]), hence `[xxhash64("")]`. */
  def tokenHashes(s: UTF8String, seed: Long): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    var i = 0
    var count = 0
    var prevWs = true
    while (i < n) {
      val ws = isWs(Platform.getByte(base, off + i))
      if (!ws && prevWs) count += 1
      prevWs = ws
      i += 1
    }
    if (count == 0)
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUnsafeBytes(base, off, 0, seed)))
    val out = new Array[Long](count)
    var k = 0
    i = 0
    while (i < n) {
      while (i < n && isWs(Platform.getByte(base, off + i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(Platform.getByte(base, off + i))) i += 1
        out(k) = XXH64.hashUnsafeBytes(base, off + start, i - start, seed)
        k += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Java-regex `\s` on chars (the String twin of the byte-level [[isWs]]). */
  @inline private def isWsChar(c: Char): Boolean = c == ' ' || (c >= '\t' && c <= '\r')

  /** Greedy longest-match subword tokenization (see [[graft.plans.BpeTokens]]).
    * Works on the decoded String: piece matching is substring equality, and
    * the single-character fallback steps by codepoint so surrogate pairs
    * stay intact. */
  def bpeTokens(s0: UTF8String, model: BpeVocabModel): ArrayData = {
    val s = s0.toString
    val n = s.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      if (isWsChar(s.charAt(i))) i += 1
      else {
        var j = i
        while (j < n && !isWsChar(s.charAt(j))) j += 1
        var p = i
        var first = true
        while (p < j) {
          var len = 0
          var l = math.min(model.maxLen, j - p)
          while (l >= 1 && len == 0) {
            if (model.set.contains(s.substring(p, p + l))) len = l
            l -= 1
          }
          if (len == 0)
            len = if (Character.isHighSurrogate(s.charAt(p)) && p + 1 < j) 2 else 1
          val piece = s.substring(p, p + len)
          out.add(UTF8String.fromString(if (first) " " + piece else piece))
          first = false
          p += len
        }
        i = j
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }
}

/** Native fused tokenizer: string -> `array<long>` of per-token xxhash64
  * values (seed 42, matching Spark's `xxhash64`), replacing the
  * regex-collapse + split + per-token-hash pipeline that dominates the
  * text-dedup hot path (regexp_replace allocates a rewritten string and the
  * split allocates a string array per document; this allocates only the
  * output longs). Downstream consumers (minhash, simhash, n-gram shingles)
  * only ever need the token HASHES, never the token strings.
  */
case class TokenHashes(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokenHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], 42L)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.TextKernels.tokenHashes($s, 42L);")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** Native fused MinHash signature: from an `array<long>` of set-element
  * hashes, all `k` signature slots in ONE pass (slot i = min over elements h
  * of `h·A_i + B_i`, the standard one-hash affine scheme; constants are
  * splitmix64-derived from the slot index — identical to the composed
  * `array_min(transform(...))` form in TextOps, which traverses the array k
  * times and allocates k transformed copies per document). Empty input =>
  * every slot Long.MaxValue. Null elements are skipped (xxhash64 never
  * produces them; defensive parity with the HOF form, where a null element
  * nulls the transformed entry and array_min ignores nulls).
  */
case class MinHashSlots(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "k must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_slots"

  @transient private lazy val coeffs: (Array[Long], Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      val (ai, bi) = TextKernels.minHashCoeffs(i)
      a(i) = ai; b(i) = bi; i += 1
    }
    (a, b)
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minHashSlots(input.asInstanceOf[ArrayData], coeffs._1, coeffs._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", coeffs._1, "long[]")
    val bRef = ctx.addReferenceObj("mhB", coeffs._2, "long[]")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.TextKernels.minHashSlots($arr, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSlots =
    copy(child = newChild)
}

/** Native codegen'd word-n-gram hash set: from an `array<long>` of token
  * hashes, produce the SORTED DISTINCT array of polynomial-combined n-gram
  * hashes — the hashed equivalent of "distinct n-gram shingle strings"
  * (distinct shingles map to distinct combined hashes w.h.p.), without ever
  * building the shingle strings: no concat_ws, no string allocation, output
  * ready for [[SortedLongIntersectCount]] Jaccard and minhash. Null token
  * hashes are treated as 0. Fewer than n tokens => empty array.
  */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"

  // both paths call the ONE static TextKernels fold (the file's own
  // static-kernel pattern): the JIT inlines it identically, and the fold
  // can never drift from PositionalNgramHashes' — which the catalog/probe
  // hash interop between the two forms rests on
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.ngramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.TextKernels.ngramHashes($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** Positional sibling of [[NgramHashes]]: one combined hash per n-gram START
  * OFFSET, order preserved, duplicates kept — `out(i)` is the hash of tokens
  * `[i, i+n)`. Same fold (h = h·P + x, null→0), so a value produced here
  * equals the [[NgramHashes]] value of the same n-gram: catalogs built from
  * the distinct form match probes built from the positional form. The kernel
  * behind passage-level (ExactSubstr-style) boilerplate detection, where the
  * OFFSET of a repeated n-gram — not just its presence — is what excision
  * needs. Fewer than n tokens => empty array.
  */
case class PositionalNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pos_ngram_hashes"

  // shared static kernel — see the NgramHashes note: one fold definition
  // across both expressions and both eval/codegen paths
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.posNgramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.TextKernels.posNgramHashes($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): PositionalNgramHashes =
    copy(child = newChild)
}

/** Vocabulary for [[BpeTokens]]: the piece set plus the longest piece
  * length, built once per deserialized instance (the hash set itself is
  * `@transient` — only the flat string array rides the serialized plan). */
final class BpeVocabModel(val pieces: Array[String]) extends Serializable {
  @transient lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, pieces.length * 2))
    pieces.foreach(p => if (p.nonEmpty) s.add(p))
    s
  }
  @transient lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else math.max(1, pieces.iterator.map(_.length).max)
}

/** Greedy longest-match subword tokenizer (the WordPiece/maximal-munch
  * scheme — public knowledge): pre-tokenize on whitespace exactly like
  * [[TokenHashes]], then within each word repeatedly take the LONGEST vocab
  * piece matching at the cursor; a position matching no piece falls back to
  * a single character (codepoint-aware, so surrogate pairs are never
  * split). Word-initial pieces carry a leading space marker (the GPT-2
  * byte-BPE convention) so `ltrim(concat(pieces))` reconstructs the
  * whitespace-normalized text exactly and chunk boundaries can land
  * mid-word without losing word-boundary information.
  *
  * The vocab is a constructor parameter (like [[CentroidProbes]]'
  * centroids): carried once per plan, shipped to executors as a codegen
  * reference object, with the lookup set built lazily per JVM. Empty or
  * all-whitespace input yields an empty array (a real tokenizer emits no
  * tokens for no text — unlike the whitespace form's split("") == [""]).
  */
case class BpeTokens(child: Expression, vocab: Array[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"

  @transient private lazy val model = new BpeVocabModel(vocab)

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bpeTokens(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeVocab", model, classOf[BpeVocabModel].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.TextKernels.bpeTokens($s, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
