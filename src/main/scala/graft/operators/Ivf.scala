package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** IVF-flat approximate nearest neighbors: a coarse k-means quantizer
  * partitions the corpus into C inverted lists; a query scans only the
  * `nProbe` lists whose centroids are nearest. The other classic ANN scale
  * path next to hyperplane LSH ([[Similarity.lshTopK]]): recall/cost tuned
  * by (C, nProbe) instead of (tables, planes).
  *
  * Training is a few Lloyd iterations, fully distributed and DETERMINISTIC:
  * init = C vectors chosen by id hash order; assignment via the broadcast
  * centroid literal; per-dimension means accumulated in DECIMAL (exact, so
  * independent of partitioning/row order — float means would make centroids,
  * and therefore results, nondeterministic run to run). Only the C x dim
  * centroid matrix (model metadata, not data) ever reaches the driver.
  */
object Ivf {

  /** `centroids` is the FLAT leaf matrix (index = bucket id — what the
    * on-disk index partitions by). `levels` is non-empty for a HIERARCHICAL
    * quantizer: the internal tree matrices top-down (sizes multiplying down
    * to `centroids`), which make both assignment and probing a beam descend
    * (`O(b * log_b C * dim)` per row) instead of a flat `O(C * dim)` scan —
    * the property that keeps corpus-side assignment near-linear when the
    * list count grows with the corpus (constant target list size). */
  final case class Model(centroids: Array[Array[Float]], levels: Seq[Array[Array[Float]]] = Nil) {
    def c: Int = centroids.length
    private[graft] def tree: Seq[Array[Array[Float]]] = levels :+ centroids
  }

  private def hierProbesCol(vec: Column, tree: Seq[Array[Array[Float]]], k: Int): Column =
    call_function("graft_hier_probes", vec,
      typedLit(tree.flatten.toArray), typedLit(tree.map(_.length).toArray), lit(k))

  /** Squared-L2 argmin is equivalent to argmin of `-2 q.c + ||c||^2` (the
    * `||q||^2` term is constant per row). Lowers to the native fused
    * [[graft.plans.CentroidProbes]] expression: all C distances + top-k
    * selection in one loop over a flat primitive matrix (the composed
    * `transform`/`element_at`/`array_min` form evaluated the distance array
    * twice and re-compiled a centroid-matrix-inlined codegen per job).
    * A hierarchical model routes to [[graft.plans.HierCentroidProbes]]
    * (width-k beam descend) — assignment and query probing share ONE
    * quantizer, so a corpus row's bucket is always reachable by a query
    * probing the same vector (the consistency IVF search correctness
    * rests on). */
  private def probes(vec: Column, model: Model, k: Int): Column =
    // clamp to the list count: train() clamps c to the corpus size, so a
    // caller's nProbe may exceed model.c (probe-everything, not an error)
    if (model.levels.isEmpty)
      call_function("graft_centroid_probes", vec, typedLit(model.centroids),
        lit(math.min(k, model.c)))
    else hierProbesCol(vec, model.tree, math.min(k, model.c))

  /** Index of the nearest centroid (0-based; ties -> lowest index). */
  def nearestCentroid(vec: Column, model: Model): Column =
    element_at(probes(vec, model, 1), 1)

  /** Indices of the `nProbe` nearest centroids, 0-based, ascending by
    * (distance, index). */
  def probeCentroids(vec: Column, model: Model, nProbe: Int): Column =
    probes(vec, model, nProbe)

  /** CLUSTER-BALANCED sampling — the diversity-aware selection step of the
    * embedding-space curation recipes (SemDeDup and the density-pruning
    * family sample per k-means cluster so dense regions of embedding space
    * cannot dominate a training mix): assign each vector to its quantizer
    * bucket and keep at most `perList` per bucket, chosen in deterministic
    * `xxhash64(id, seed)` order — the same (corpus, model, seed) always
    * selects the same rows. Returns (id, bucket) keep rows.
    *
    * Scale design: assignment is the map-side centroid kernel (beam
    * descend for a hierarchical model); the embedding column is DROPPED
    * before the per-bucket rank window, so the one exchange carries
    * (id, bucket, hash) — never vectors. */
  def balancedSample(
      corpus: DataFrame,
      model: Model,
      perList: Int,
      seed: Long = 0L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      prefilter: Boolean = true): DataFrame = {
    // un-assignable rows (null / wrong-dimension / null-element vectors
    // make the kernel return a NULL bucket) are EXCLUDED: they belong to
    // no cluster, and an unfiltered null bucket would NPE the driver's
    // prefilter count collect (get on null) and crash the job
    val assigned = corpus.select(
      col(idCol),
      nearestCentroid(col(vecCol), model).as("bucket"),
      xxhash64(col(idCol), lit(seed)).as("_h"))
      .filter(col("bucket").isNotNull)
    balancedKeep(assigned, perList, idCol, prefilter)
  }

  /** [[balancedSample]] generalized to an ARBITRARY grouping column — the
    * model-free diversity cap ("at most `perGroup` documents per domain /
    * language / source"): keep at most `perGroup` rows per distinct
    * `groupCol` value, chosen in deterministic `xxhash64(id, seed)` order.
    * Same lossless hash prefilter and exact-window semantics as the
    * quantizer-bucket form; null groups are excluded (a null key is no
    * group). Returns (id, bucket) keep rows. Being closed-form (no trained
    * model), this form is fully oracle-checkable end to end. */
  def balancedSampleBy(
      corpus: DataFrame,
      groupCol: String,
      perGroup: Int,
      seed: Long = 0L,
      idCol: String = "vec_id",
      prefilter: Boolean = true): DataFrame =
    balancedKeep(
      corpus.select(
        col(idCol),
        col(groupCol).as("bucket"),
        xxhash64(col(idCol), lit(seed)).as("_h"))
        .filter(col("bucket").isNotNull),
      perGroup, idCol, prefilter)

  /** The shared keep kernel over (id, bucket, _h) rows, generic in the
    * bucket type. */
  private def balancedKeep(
      assigned: DataFrame,
      perList: Int,
      idCol: String,
      prefilter: Boolean): DataFrame = {
    require(perList > 0, "perList must be positive")
    // LOSSLESS hash prefilter (the tokenBudget discipline: exactness over
    // the shortcut): the per-bucket rank window puts a whole bucket in ONE
    // task — fine for the slim (id, bucket, hash) rows at test scale, a
    // one-task sort of a billion-row hot list at 100 TB. Since keeps are
    // the perList SMALLEST uniform hashes, rows above a per-bucket
    // threshold at ~4x the expected k-th order statistic cannot win; the
    // verification pass falls any bucket whose survivor count dipped under
    // min(perList, size) back to its full row set, so the output is the
    // exact window answer regardless of how the tail probability lands.
    val spark = assigned.sparkSession
    // corpus-length block sets pinned by the prefilter passes; freed below
    // after the (perList x lists)-bounded result materializes, so a loop
    // of balancedSample calls cannot accumulate corpus-sized checkpoints
    val pinned = Seq.newBuilder[DataFrame]
    val survivors = if (!prefilter) assigned else {
      // the prefilter makes multiple passes (counts, candidates, rare
      // fallback): materialize the slim (id, bucket, hash) rows once so
      // the assignment kernel runs over the corpus exactly once
      val a = assigned.localCheckpoint()
      pinned += a
      val counts = a.groupBy("bucket").count().collect()
        .map(r => r.get(0) -> r.getLong(1)) // model-sized: one row per list
      val span = 1.8446744073709552e19 // 2^64 as double (exact power of two)
      val thrRows = counts.map { case (b, c) =>
        val thr =
          if (c <= 4L * perList) Long.MaxValue
          else {
            val frac = math.min(1.0, 4.0 * (perList + 1).toDouble / c.toDouble)
            val t = Long.MinValue.toDouble + frac * span
            if (t >= Long.MaxValue.toDouble) Long.MaxValue else t.toLong
          }
        org.apache.spark.sql.Row(b, thr)
      }
      if (thrRows.forall(_.getLong(1) == Long.MaxValue)) a
      else {
        val thrDf = spark.createDataFrame(
          java.util.Arrays.asList(thrRows: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "bucket", assigned.schema("bucket").dataType),
            org.apache.spark.sql.types.StructField(
              "_thr", org.apache.spark.sql.types.LongType))))
        val cand = a.join(broadcast(thrDf), Seq("bucket"))
          .filter(col("_h") <= col("_thr")).drop("_thr")
          .localCheckpoint() // verified then windowed: scan the corpus once
        pinned += cand
        val got = cand.groupBy("bucket").count().collect()
          .map(r => r.get(0) -> r.getLong(1)).toMap[Any, Long]
        val fallback = counts.collect {
          case (b, c) if got.getOrElse(b, 0L) < math.min(c, perList.toLong) => b
        }
        if (fallback.isEmpty) cand
        else cand.filter(!col("bucket").isin(fallback: _*))
          .unionByName(a.filter(col("bucket").isin(fallback: _*)))
      }
    }
    val w = Window.partitionBy(col("bucket")).orderBy(col("_h"), col(idCol))
    val keep = survivors
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= perList)
      .select(col(idCol), col("bucket"))
    val internal = pinned.result()
    if (internal.isEmpty) keep
    else {
      val out = keep.localCheckpoint() // keep-list-sized (<= perList * lists)
      internal.foreach(graft.core.Blocks.free(_))
      out
    }
  }

  /** Train C centroids with `iters` Lloyd iterations. Cluster count is
    * clamped to the corpus size (requesting 32 lists over 20 vectors must
    * not crash); an empty corpus is a caller error.
    *
    * `maxTrainRows` > 0 trains on a deterministic hash-sample of at most
    * ~that many vectors (the standard coarse-quantizer practice — e.g.
    * FAISS samples ~tens of vectors per centroid): assignment cost per
    * Lloyd iteration is rows x C x dim, and a deployment that grows C with
    * the corpus to keep list sizes constant would otherwise pay a QUADRATIC
    * training bill (measured: 36x wall for 10x corpus at C = n/120,
    * SemanticProbe). ~40-50 rows per centroid loses nothing a coarse
    * quantizer cares about; 0 keeps the exact full-corpus training. */
  def train(
      corpus: DataFrame,
      c: Int,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxTrainRows: Long = 0L): Model = {
    val proj = sampledProj(corpus, idCol, vecCol, maxTrainRows)
    try {
      // deterministic init: the C vectors with smallest xxhash64(id)
      val init = proj
        .orderBy(xxhash64(col("_gid")), col("_gid"))
        .limit(c)
        .collect()
        .map(_.getAs[scala.collection.Seq[Float]](1).toArray)
      require(init.nonEmpty, "Ivf.train: empty corpus")
      Model(lloyd(proj, init, iters, flatAssign))
    } finally proj.unpersist(blocking = false)
  }

  /** Train a HIERARCHICAL model: a `branch`-ary centroid tree whose leaf
    * level has `leaves` inverted lists (rounded up to a multiple of
    * `branch^(depth-1)` for the divisibility the beam kernel descends by),
    * `depth = ceil(log_branch leaves)`. Levels train top-down: level 0 is a
    * flat Lloyd fit of `branch` centroids; each deeper level initializes its
    * children from deterministic per-parent-bucket samples and refines with
    * Lloyd under GREEDY TREE ASSIGNMENT (grouped k-means — a row only moves
    * among its parent's children). Per-row assignment during training and
    * indexing costs `O(branch * depth * dim)` instead of the flat
    * `O(leaves * dim)`: with the training sample growing linearly in the
    * corpus (constant rows-per-centroid) total training cost is
    * `O(sampleRows * branch * depth^2 * dim)` — linear-with-log-factors in
    * corpus size, the scale fix for the flat trainer's quadratic default
    * when `leaves` tracks corpus size (measured 14x wall for 10x corpus at
    * C = n/120, SemanticProbe round 6). `leaves <= branch` falls back to
    * the flat trainer: a depth-1 tree IS the flat model. */
  def trainHier(
      corpus: DataFrame,
      leaves: Int,
      branch: Int = 32,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxTrainRows: Long = 0L): Model = {
    require(branch >= 2, s"Ivf.trainHier: branch=$branch must be >= 2")
    if (leaves <= branch) return train(corpus, leaves, iters, idCol, vecCol, maxTrainRows)
    val proj = sampledProj(corpus, idCol, vecCol, maxTrainRows)
    try {
      val nProj = proj.count()
      // INTERNAL levels refine on a NESTED hash-subsample sized to ~48 rows
      // per centroid of THAT level (same hash criterion as sampledProj, so a
      // tighter threshold is a strict subset — no second source scan). A
      // coarse internal split needs far fewer rows than the leaf fit; without
      // this every added tree level re-pays the full-sample Lloyd cost and
      // the 100x->1000x training ratio measured 18.7x instead of ~10x.
      def levelProj(size: Int): DataFrame = {
        val target = 48L * size
        if (nProj <= target) proj
        else {
          val buckets = 1000000L
          // max(1, ...): see sampledProj — a zero threshold would leave an
          // internal level training on an EMPTY sample (its centroids
          // frozen at init) once nProj exceeds buckets * target
          proj.filter(
            pmod(xxhash64(col("_gid")), lit(buckets)) <
              lit(math.max(1L, buckets * target / nProj)))
        }
      }
      val init0 = proj
        .orderBy(xxhash64(col("_gid")), col("_gid"))
        .limit(branch)
        .collect()
        .map(_.getAs[scala.collection.Seq[Float]](1).toArray)
      require(init0.nonEmpty, "Ivf.trainHier: empty corpus")
      if (init0.length < branch)
        // corpus smaller than one branching factor: flat-fit what exists
        return Model(lloyd(proj, init0, iters, flatAssign))
      val depth = math.max(2, math.ceil(math.log(leaves) / math.log(branch)).toInt)
      val sizes = Array.tabulate(depth) { l =>
        if (l < depth - 1) math.pow(branch, l + 1).toInt
        else {
          val p = math.pow(branch, depth - 1).toLong
          (((leaves + p - 1) / p) * p).toInt
        }
      }
      var tree = Vector(lloyd(levelProj(branch), init0, iters, flatAssign))
      for (l <- 1 until depth) {
        val parents = tree.last
        val cpp = sizes(l) / sizes(l - 1) // children per parent
        // this level's sample: the full proj for the leaf fit, the nested
        // subsample for internal levels
        val lp = if (l == depth - 1) proj else levelProj(sizes(l))
        // deterministic init WITHIN each parent's bucket: the cpp sample
        // vectors with smallest xxhash64(id) among the rows greedy-descend
        // assigns to that parent (one window job over the level sample;
        // the collect is model-sized — at most sizes(l) rows)
        val w = Window.partitionBy(col("_pb")).orderBy(xxhash64(col("_gid")), col("_gid"))
        val picks = lp
          .withColumn("_pb", element_at(hierProbesCol(col("_gvec"), tree, 1), 1))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= cpp)
          .select(col("_pb"), col("_rn"), col("_gvec"))
          .collect()
          .map(r => ((r.getInt(0), r.getInt(1)), r.getAs[scala.collection.Seq[Float]](2).toArray))
          .toMap
        val init = Array.tabulate(sizes(l)) { i =>
          // a parent with fewer sampled rows than children pads the missing
          // slots with copies of its own centroid — harmless duplicates
          // (ties go to the lowest index; the copy's list stays empty)
          picks.getOrElse((i / cpp, i % cpp + 1), parents(i / cpp))
        }
        val above = tree
        tree = tree :+ lloyd(lp, init, iters, (v, cents) =>
          element_at(hierProbesCol(v, above :+ cents, 1), 1))
      }
      Model(tree.last, tree.init)
    } finally proj.unpersist(blocking = false)
  }

  /** Count-driven trainer a deployment calls without sizing anything:
    * `lists = ceil(n / targetListSize)` from one cheap count (parquet footer
    * metadata — no data read), sampled at `rowsPerCentroid` rows per
    * centroid, and HIERARCHICAL ([[trainHier]]) once the list count
    * outgrows `4 * branch` — below that a flat scan of the centroid matrix
    * is already cheaper than a tree descend. This is the default that
    * survives 100x corpus growth unaided: both the list count and the
    * training sample scale linearly while per-row assignment cost stays
    * `O(branch * log leaves)`. */
  def trainAuto(
      corpus: DataFrame,
      targetListSize: Int = 128,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      branch: Int = 32,
      rowsPerCentroid: Int = 48): Model = {
    require(targetListSize >= 1, "targetListSize must be positive")
    val n = corpus.select(col(idCol)).count()
    require(n > 0, "Ivf.trainAuto: empty corpus")
    val lists = math.min(n, math.max(1L, (n + targetListSize - 1) / targetListSize)).toInt
    val sample = rowsPerCentroid.toLong * lists
    if (lists <= 4 * branch) train(corpus, lists, iters, idCol, vecCol, maxTrainRows = sample)
    else trainHier(corpus, lists, branch, iters, idCol, vecCol, maxTrainRows = sample)
  }

  /** The trainers' shared input: a `(_gid, _gvec)` projection, optionally
    * hash-sampled to ~`maxTrainRows` rows (deterministic hash-threshold
    * membership — no RNG state, no shuffle), PERSISTED so the source is
    * scanned once, not re-read per Lloyd iteration. At 100 TB the cached
    * projection is the id + embedding columns only; the persist cost is one
    * pass, amortized over the iterations. Caller unpersists. */
  private[operators] def sampledProj(
      corpus: DataFrame, idCol: String, vecCol: String, maxTrainRows: Long): DataFrame = {
    val projAll = corpus.select(col(idCol).as("_gid"), col(vecCol).as("_gvec"))
    val projSampled =
      if (maxTrainRows <= 0L) projAll
      else {
        val n = projAll.count()
        if (n <= maxTrainRows) projAll
        else {
          val buckets = 1000000L
          // max(1, ...): integer division floors to 0 once n exceeds
          // buckets * maxTrainRows (a 4e9-row corpus at maxTrainRows=3200)
          // — the sample would silently go EMPTY and train() would crash
          // with a spurious "empty corpus". The 1-bucket floor keeps
          // ~n/1e6 rows instead: larger than asked, never zero.
          projAll.filter(
            pmod(xxhash64(col("_gid")), lit(buckets)) <
              lit(math.max(1L, buckets * maxTrainRows / n)))
        }
      }
    // SPREAD the projection to the session's parallelism before caching:
    // embedding corpora often arrive as a handful of fat parquet splits
    // (blob-heavy rows pack thousands into one scan task), and every Lloyd
    // iteration re-scans this frame — a 2-partition cache serializes the
    // whole fit on 2 cores (measured 3x wall at iters=3, TrainProfile).
    // Keyed on _gid (deterministic under task retry, never round-robin);
    // the exchange moves the slim (id, vector) projection once, is
    // sample-bounded whenever maxTrainRows caps it, and no-ops entirely
    // when the scan already planned enough partitions. Centroid means are
    // exact decimal sums, so partitioning cannot move a single bit.
    val par = projSampled.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (projSampled.rdd.getNumPartitions < par) projSampled.repartition(par, col("_gid"))
      else projSampled
    spread.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  private[operators] def flatAssign(v: Column, cents: Array[Array[Float]]): Column =
    element_at(call_function("graft_centroid_probes", v, typedLit(cents), lit(1)), 1)

  /** `iters` Lloyd refinement steps over the cached projection with a
    * pluggable assignment (flat argmin for [[train]], greedy tree descend
    * for [[trainHier]]'s deeper levels). Assignment + per-dimension means
    * fuse into ONE aggregation job per iteration; decimal accumulation
    * makes centroids independent of partitioning/row order; empty clusters
    * keep their previous centroid. */
  private[operators] def lloyd(
      proj: DataFrame,
      init: Array[Array[Float]],
      iters: Int,
      assign: (Column, Array[Array[Float]]) => Column): Array[Array[Float]] = {
    var cents = init
    val dim = cents.head.length
    for (_ <- 1 to iters) {
      val means = proj
        .select(assign(col("_gvec"), cents).as("b"), posexplode(col("_gvec")))
        .groupBy(col("b"), col("pos"))
        .agg((sum(col("col").cast(DecimalType(30, 10))) / count(lit(1))).cast("double").as("m"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
        .toMap
      val prev = cents
      cents = Array.tabulate(prev.length) { b =>
        Array.tabulate(dim) { d =>
          means.get((b, d)).map(_.toFloat).getOrElse(prev(b)(d))
        }
      }
    }
    cents
  }

  /** Persist an IVF index: the corpus assigned to its inverted lists and
    * written `partitionBy(bucket)` (one directory per list, the on-disk
    * inverted-file layout), plus the centroid matrix as a tiny parquet.
    * Precomputed squared norms ride along so search never touches the
    * vectors twice. Train once, search many — and because `bucket` is a
    * PARTITION column, a search that probes `nProbe` of `c` lists reads
    * only `nProbe/c` of the data (partition pruning), the property that
    * makes IVF an index rather than a full scan at 100 TB. */
  def writeIndex(
      corpus: DataFrame,
      model: Model,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    corpus.select(
      col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorOps.normSq(col(vecCol)).as("n_nsq"),
      nearestCentroid(col(vecCol), model).as("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$path/lists")
    writeQuantizer(spark, model, path)
    import spark.implicits._
    // training-time corpus size: the baseline `needsRebuild` measures
    // growth against (footer-metadata count, no data read)
    Seq(Tuple1(spark.read.parquet(s"$path/lists").count()))
      .toDF("trained_rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    // a from-scratch build over an existing GENERATIONAL store retracts
    // the pointer last (the buildTextIndex discipline): the just-written
    // legacy trees become the base again and stale generations sweep at
    // the next gc. No-op when `path` is itself a generation dir (the
    // rebuildIndex publish) or a fresh store.
    val fs = Seg.fs(spark, path)
    val ptr = new org.apache.hadoop.fs.Path(path, ListsPointer)
    if (fs.exists(ptr)) { fs.delete(ptr, false); () }
  }

  /** Persist the quantizer tree, keyed by (level, bucket) with the leaf
    * matrix at level = levels.length — the [[readModel]] format, shared
    * with the PQ-compressed index writer: a hierarchical index reloaded by
    * readModel probes with the SAME beam descend its buckets were assigned
    * by (dropping the internal levels would silently degrade probing to
    * the flat quantizer AND break probe/assignment consistency). */
  private[operators] def writeQuantizer(
      spark: org.apache.spark.sql.SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.tree.zipWithIndex.flatMap { case (m, l) =>
      m.zipWithIndex.map { case (v, i) => (l, i, v) }
    }.toSeq
      .toDF("level", "bucket", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Append new vectors to a persisted index WITHOUT retraining: assign with
    * the stored centroid model and append to the existing list partitions —
    * the incremental-ingest path (the reference's L0-append shape: cheap
    * writes now, a rebuild later when [[needsRebuild]] trips). Search after
    * append is IDENTICAL to a full [[writeIndex]] rewrite under the same
    * model (IvfSpec proves it), because assignment depends only on the
    * stored centroids. Returns the number of vectors appended. */
  def appendToIndex(
      newVectors: DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    val spark = newVectors.sparkSession
    // the CURRENT generation's model and lists, read as one consistent
    // pair (pointer first, then that generation's immutable trees)
    val root = genRoot(Seg.fs(spark, path), path)
    val model = readModelAt(spark, root)
    // count the BATCH, not (after - before) over the whole lists dir: the
    // difference form lists every existing file's footer twice per append
    // and mis-attributes rows under a concurrent appender
    val batch = newVectors.select(
      col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorOps.normSq(col(vecCol)).as("n_nsq"),
      nearestCentroid(col(vecCol), model).as("bucket"))
      .localCheckpoint()
    batch.write.partitionBy("bucket").mode("append").parquet(s"$root/lists")
    val n = batch.count()
    graft.core.Blocks.free(batch) // free the blocks: append loops call this per batch
    n
  }

  private val Seg = graft.core.Segments

  // ---- base GENERATIONS: the `_LISTS` pointer (the Dedup `_BANDS` /
  // ---- Search `_POSTINGS` discipline, applied to the vector index) -----
  //
  // A generation is the atomic unit of QUANTIZER + ASSIGNMENT consistency:
  // `lists/`, `centroids/`, and `meta/` always live together under one
  // generation root (`gen_v<k>/` once a rebuild has published; the legacy
  // layout at the index root itself before any rebuild). [[rebuildIndex]]
  // retrains into a NEW generation invisibly and commits with one atomic
  // pointer write — readers planned against the old generation keep
  // serving through the whole retrain, and a crash at any point before
  // the flip leaves the old generation untouched and authoritative
  // (reference anchor: kv/db/version_set.cpp:920-1018 — LogAndApply
  // publishes new versions beside live readers). Streamed segments carry
  // a `_GEN` marker naming the generation whose quantizer ASSIGNED them;
  // every probe prunes each root in its own generation's bucket space
  // (the per-root `_BUCKETS` discipline of the band and postings stores),
  // so segments written beside a retrain stay exactly searchable across
  // the flip. Superseded generations outlive the flip until readers
  // drain ([[gcIndexSegments]]).

  private val ListsPointer = "_LISTS"

  /** The current generation's NAME: the pointer content, or "" for the
    * legacy root layout. */
  private def genNameOf(
      fs: org.apache.hadoop.fs.FileSystem, path: String): String = {
    val ptr = new org.apache.hadoop.fs.Path(path, ListsPointer)
    if (!fs.exists(ptr)) ""
    else scala.util.Try(Seg.readSmall(fs, ptr).trim).toOption
      .filter(n => n.nonEmpty && !n.contains('/')).getOrElse("")
  }

  /** Directory of a generation by name ("" = the index root itself). */
  private def genDirOf(path: String, gen: String): String =
    if (gen.isEmpty) path else s"$path/$gen"

  /** The current generation's root (lists/centroids/meta live here). */
  private[graft] def genRoot(
      fs: org.apache.hadoop.fs.FileSystem, path: String): String =
    genDirOf(path, genNameOf(fs, path))

  /** The generation that ASSIGNED a segment's rows — its `_GEN` marker;
    * absent (pre-generation segments) means whatever generation was
    * current at write time, which for a store that has never flipped is
    * the current one. */
  private def readSegGen(
      fs: org.apache.hadoop.fs.FileSystem,
      segDir: org.apache.hadoop.fs.Path, curGen: String): String = {
    val m = new org.apache.hadoop.fs.Path(segDir, "_GEN")
    if (!fs.exists(m)) curGen
    else scala.util.Try(Seg.readSmall(fs, m).trim).toOption.getOrElse(curGen)
  }

  /** Segment names a generation's lists ABSORBED at publish time — the
    * retire-list rides INSIDE the generation dir, so the pointer flip
    * atomically both publishes the new lists and retires the segments
    * they folded in (no window where a row is served twice). Carried
    * forward across rebuilds for any still-on-disk dir, so a crash-replay
    * rewrite of a long-retired segment stays excluded. */
  private def readAbsorbed(
      fs: org.apache.hadoop.fs.FileSystem, genDir: String): Set[String] = {
    val m = new org.apache.hadoop.fs.Path(genDir, "_ABSORBED")
    if (!fs.exists(m)) Set.empty
    else Seg.readSmall(fs, m).split("\n").map(_.trim).filter(_.nonEmpty).toSet
  }

  /** True iff the tree under `root` holds any parquet DATA file — a
    * zero-row partitioned write leaves only `_SUCCESS`, and schema
    * inference over it throws (the Search/Dedup no-data-files guard). */
  private def hasDataFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Boolean = {
    if (!fs.exists(root)) return false
    var hasData = false
    val it = fs.listFiles(root, true)
    while (!hasData && it.hasNext)
      hasData = it.next().getPath.getName.endsWith(".parquet")
    hasData
  }

  /** Live tombstoned ids (`n_id`), or None when none exist — data-file
    * gated: [[rebuildIndex]] deletes the tombstone files it folded in,
    * which can leave the dir holding only `_SUCCESS`. */
  private def tombsRows(
      spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String): Option[DataFrame] = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/tombs")
    if (!hasDataFiles(fs, dir)) None
    else Some(spark.read.parquet(dir.toString).select("n_id"))
  }

  /** The index's LIVE rows grouped by ASSIGNING GENERATION:
    * (genName, that generation's quantizer, tombstone-filtered rows of
    * every root it assigned). Each group's `bucket` values are meaningful
    * ONLY in its own generation's space — probes must prune each group
    * with bucket ids computed against ITS model. Data-less roots (a
    * zero-kept micro-batch's segment, an empty-corpus generation) are
    * skipped; a generation with no data-holding roots is dropped. */
  private[graft] def liveGenGroups(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, Model, DataFrame)] = {
    val fs = Seg.fs(spark, path)
    val curGen = genNameOf(fs, path)
    val (_, segs) = liveListSegs(spark, path)
    val byGen: Map[String, Seq[String]] =
      (segs.map(d => readSegGen(fs, d, curGen) -> d.toString)
        :+ (curGen -> s"${genDirOf(path, curGen)}/lists"))
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2) }
    val tombs = tombsRows(spark, fs, path)
    byGen.toSeq.sortBy(_._1).flatMap { case (g, roots) =>
      val withData = roots.filter(r =>
        hasDataFiles(fs, new org.apache.hadoop.fs.Path(r)))
      if (withData.isEmpty) None
      else {
        val m = readModelAt(spark, genDirOf(path, g))
        val raw = withData.map(spark.read.parquet(_)).reduce(_ unionByName _)
        val rows = tombs.fold(raw)(t =>
          raw.join(broadcast(t), Seq("n_id"), "left_anti"))
        Some((g, m, rows))
      }
    }
  }

  /** The LIVE streaming segments of a vector index, under the same
    * fold-marker protocol as the dedup doc-row indexes
    * ([[graft.operators.Dedup.foldDocSegments]]): markers under `_folded/`
    * are listed BEFORE segment directories (a marker committed between the
    * listings leaves the reader on the consistent pre-fold view), a
    * segment a marker lists as folded is excluded, a `compact_*` segment
    * is visible iff its marker committed, and a batch segment is committed
    * iff its parquet `_SUCCESS` job-commit mark exists (a fold snapshot
    * taken mid-rewrite during streaming replay skips the half-written
    * dir). */
  private def liveListSegs(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : (Map[String, Seq[String]], Seq[org.apache.hadoop.fs.Path]) = {
    val fs = Seg.fs(spark, path)
    val markers = Seg.readMarkers(fs, new org.apache.hadoop.fs.Path(path))
    // segments the current generation's lists absorbed at publish retire
    // exactly like folded ones — their rows already live in the base tree
    val folded = markers.values.flatten.toSet ++
      readAbsorbed(fs, genRoot(fs, path))
    val live = Seg.listDirs(fs, new org.apache.hadoop.fs.Path(s"$path/segs")).filter { d =>
      val name = d.getName
      !folded(name) && (
        if (name.startsWith("compact_")) markers.contains(name)
        else fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
    }
    (markers, live)
  }

  /** The index's LIVE inverted lists: the base `lists/` tree plus the live
    * named streaming segments under `segs/` (the replay-idempotent append
    * form of [[writeListSegment]], filtered through the fold-marker
    * protocol of [[liveListSegs]]), minus any tombstoned ids (the takedown
    * path, [[deleteFromIndex]]). Each root is its own bucket-partitioned
    * parquet tree, so a bucket filter prunes partitions in EVERY branch of
    * the union — probed-list reads stay partition-pruned across base and
    * streamed rows alike; the tombstone side is takedown-sized and
    * broadcasts AFTER the pruned scan, so with no tombstones the read is
    * the plain union. */
  private[graft] def readListsWithSegments(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val fs = Seg.fs(spark, path)
    // NOTE: bucket values in this union may span GENERATIONS (a live
    // segment assigned by a superseded quantizer) — valid for row-level
    // reads (compaction re-assigns, stats count); bucket-pruned probes
    // must go through [[liveGenGroups]] instead.
    val roots = (s"${genRoot(fs, path)}/lists"
      +: liveListSegs(spark, path)._2.map(_.toString))
      .filter(r => hasDataFiles(fs, new org.apache.hadoop.fs.Path(r)))
    require(roots.nonEmpty, s"no vector data under $path")
    val raw = roots.map(spark.read.parquet(_)).reduce(_ unionByName _)
    tombsRows(spark, fs, path).fold(raw)(t =>
      raw.join(broadcast(t), Seq("n_id"), "left_anti"))
  }

  /** Fold the LIVE streaming segments of a vector index into one — SAFE
    * BESIDE A RUNNING [[graft.streaming.Ingest.startSemanticIngest]],
    * exactly like [[graft.operators.Dedup.foldDocSegments]] beside the
    * near-dup ingest: the folded rows land as an invisible
    * `segs/compact_*` bucket-partitioned tree and become the view in one
    * atomic fold-marker rename; a concurrently-appended batch segment (not
    * in the fold snapshot) stays live untouched, and a crash before the
    * marker leaves the old view fully intact. The base `lists/` tree and
    * tombstones are NOT touched (that full fold is
    * [[compactIndexSegments]], stop-the-world) — this bounds the
    * per-probe listing+read cost of a week-long semantic ingest at O(1)
    * segments instead of O(batches).
    *
    * `gc = true` immediately deletes the folded directories — safe only
    * when no concurrent reader planned its scan before the marker; pass
    * `gc = false` beside a live ingest and run [[gcIndexSegments]] after
    * the per-micro-batch readers drain (one trigger). */
  def foldIndexSegments(
      spark: org.apache.spark.sql.SparkSession, path: String, gc: Boolean = true): Unit = {
    val fs = Seg.fs(spark, path)
    val curGen = genNameOf(fs, path)
    val (_, live) = liveListSegs(spark, path)
    // fold PER ASSIGNING GENERATION: bucket values from different
    // quantizers must never share one root (probes prune each root in its
    // own generation's bucket space). Normally one group; a mixed set
    // appears only in the drain window after a rebuild flip.
    live.groupBy(d => readSegGen(fs, d, curGen)).foreach { case (g, segs) =>
      if (segs.size > 1) {
        val name = s"compact_${java.util.UUID.randomUUID().toString.take(12)}"
        // each segment is its own bucket-partitioned tree: read per root and
        // union (one multi-root read trips partition discovery). repartition
        // by bucket before the write: a narrow union would map each input
        // file to an output file, so the compacted segment would carry the
        // SAME O(batches) tiny files it exists to consolidate
        val withData = segs.filter(d => hasDataFiles(fs, d))
        if (withData.nonEmpty)
          withData.map(d => spark.read.parquet(d.toString)).reduce(_ unionByName _)
            .repartition(col("bucket"))
            .write.partitionBy("bucket").mode("overwrite").parquet(s"$path/segs/$name")
        else // all-empty group: an empty (but committed) compact segment
          fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/segs/$name"))
        Seg.writeAtomic(fs, Seg.conf(spark),
          new org.apache.hadoop.fs.Path(s"$path/segs/$name/_GEN"), g)
        Seg.writeAtomic(fs, Seg.conf(spark),
          new org.apache.hadoop.fs.Path(s"$path/_folded/$name"),
          segs.map(_.getName).mkString("\n"))
      }
    }
    if (gc) { gcIndexSegments(spark, path); () }
  }

  /** Delete a vector index's folded (superseded) segment directories, fold
    * markers whose compacted segment is itself gone, and orphaned
    * uncommitted `compact_*` directories from a crashed fold — the
    * [[graft.operators.Dedup.gcDocIndex]] contract: run from the
    * maintenance actor only, after readers that planned before the last
    * fold marker have drained. Markers whose compacted segment is still
    * live OUTLIVE GC — they keep the `compact_*` segment visible and keep
    * a crash-replayed batch-segment rewrite excluded (its rows already
    * live in the compacted segment). Returns directories removed. */
  def gcIndexSegments(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val fs = Seg.fs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val markerDir = new org.apache.hadoop.fs.Path(root, "_folded")
    val markers = Seg.readMarkers(fs, root)
    val curGen = genNameOf(fs, path)
    var removed = 0L
    // folded segments AND segments the current generation's lists absorbed
    // at publish — both have their rows in a live tree already
    (markers.values.flatten.toSet ++
      readAbsorbed(fs, genDirOf(path, curGen))).foreach { name =>
      val d = new org.apache.hadoop.fs.Path(root, s"segs/$name")
      if (fs.exists(d)) { fs.delete(d, true); removed += 1 }
    }
    markers.keys.foreach { name =>
      if (!fs.exists(new org.apache.hadoop.fs.Path(root, s"segs/$name")))
        fs.delete(new org.apache.hadoop.fs.Path(markerDir, name), false)
    }
    Seg.listDirs(fs, new org.apache.hadoop.fs.Path(root, "segs")).foreach { d =>
      if (d.getName.startsWith("compact_") && !markers.contains(d.getName)) {
        fs.delete(d, true); removed += 1
      }
    }
    // superseded GENERATIONS: swept only when no live segment still probes
    // with their quantizer (a segment assigned under gen g needs g's
    // centroids until it folds or retires). Includes unreferenced gen dirs
    // from a rebuild that crashed before its flip, and the legacy root
    // trees once a generation serves.
    val liveGens = liveListSegs(spark, path)._2
      .map(d => readSegGen(fs, d, curGen)).toSet + curGen
    Seg.listDirs(fs, root).map(_.getName)
      .filter(n => n.startsWith("gen_v") && n != curGen && !liveGens(n))
      .foreach { n =>
        fs.delete(new org.apache.hadoop.fs.Path(root, n), true); removed += 1
      }
    if (curGen.nonEmpty && !liveGens("")) {
      Seq("lists", "centroids", "meta").foreach { t =>
        val d = new org.apache.hadoop.fs.Path(root, t)
        if (fs.exists(d)) { fs.delete(d, true); removed += 1 }
      }
    }
    removed
  }

  /** Retract vectors from a persisted index by id — the takedown path for
    * the vector index (one row per vector, so id-level deletion is exact;
    * [[graft.operators.Dedup.deleteFromDocIndex]]'s pattern applied to the
    * inverted lists): append the ids as tombstones that every reader
    * ([[topKIndexed]], [[indexStats]], [[needsRebuild]], the
    * [[graft.streaming.Ingest.startSemanticIngest]] probe) anti-joins
    * away, so a deleted vector neither surfaces in search nor suppresses a
    * future near-duplicate arrival. Physically reclaimed (and the
    * tombstones GC'd) by [[compactIndexSegments]] or [[rebuildIndex]].
    * Ids must not be reused while a tombstone is live (no sequence
    * ordering — the doc-index contract). Idempotent; returns distinct ids
    * tombstoned. */
  def deleteFromIndex(
      removedIds: DataFrame,
      path: String,
      idCol: String = "vec_id"): Long = {
    val batch = removedIds.select(col(idCol).cast("long").as("n_id"))
      .distinct().localCheckpoint()
    batch.write.mode("append").parquet(s"$path/tombs")
    val n = batch.count()
    graft.core.Blocks.free(batch)
    n
  }

  /** The SEMANTIC MICRO-PROBE shared by
    * [[graft.streaming.Ingest.startSemanticIngest]] and the pipeline
    * ingest's semantic stage — ONE definition so the two streams can
    * never diverge: assign the batch with the STORED model, prune the
    * index to the probed buckets (batch-bounded driver metadata), and
    * emit the >= `threshold` cosine near-dup pairs among
    * (corpus ∪ batch) ∪ in-batch, deduped to (doc_a < doc_b).
    *
    * NULL-vector rows are EXCLUDED from `assigned`: they can be neither
    * assigned nor compared, so they are never semantic duplicates —
    * callers pass them through to the sink (collapse keeps them: they
    * appear in no pair) and, because segment writes join against
    * `assigned`, they never enter the index. Without this filter ONE
    * null embedding would NPE the driver's bucket collect and, since the
    * failed batch replays on restart, permanently wedge the stream.
    *
    * Returns (assigned, pairs, assigningGen) — the frames locally
    * checkpointed (the caller frees both after its batch lands), and the
    * NAME of the generation whose quantizer assigned `bucket`. The caller
    * MUST pass that name to [[writeListSegment]]: a rebuild can flip the
    * pointer between this assignment and the segment write (a 100 TB
    * retrain runs for hours beside a live ingest), and a segment stamped
    * with the POST-flip generation while its buckets were computed under
    * the pre-flip quantizer is pruned in the wrong bucket space — its
    * rows silently stop matching future near-duplicates (caught by the
    * r14 semantic soak: every key of the one in-flight batch leaked). */
  private[graft] def semanticMicroPairs(
      batch: DataFrame,
      indexPath: String,
      threshold: Double,
      idCol: String,
      vecCol: String): (DataFrame, DataFrame, String) = {
    val ss = batch.sparkSession
    val fs = Seg.fs(ss, indexPath)
    val curGen = genNameOf(fs, indexPath)
    val model = readModelAt(ss, genDirOf(indexPath, curGen))
    val assigned = batch
      .select(col(idCol).cast("long").as("n_id"), col(vecCol).as("n_vec"))
      .withColumn("n_nsq", graft.functions.VectorOps.normSq(col("n_vec")))
      .withColumn("bucket", nearestCentroid(col("n_vec"), model))
      // filter on the BUCKET, not the vector: the kernel returns a null
      // bucket for null AND wrong-dimension AND null-element vectors — an
      // isNotNull on the vector alone would still let the latter two NPE
      // the probed-bucket collect below
      .filter(col("bucket").isNotNull)
      .localCheckpoint()
    // one candidate-pair frame PER GENERATION GROUP, each probed in its
    // own quantizer's bucket space (normally one group; old-generation
    // segments appear only in the drain window after a rebuild flip, and
    // re-assigning the small batch under their model is one cheap
    // projection off the checkpointed frame). The probed bucket set stays
    // batch-bounded driver metadata (the topKIndexed pattern) — a LITERAL
    // partition filter in every group.
    def pairsAgainst(aG: DataFrame, bSide: DataFrame): DataFrame = {
      val aSide = aG.select(col("bucket"), col("n_id").as("a_id"),
        col("n_vec").as("a_vec"), col("n_nsq").as("a_nsq"))
      broadcast(aSide)
        .join(bSide.select(col("bucket"), col("n_id").as("b_id"),
          col("n_vec").as("b_vec"), col("n_nsq").as("b_nsq")), Seq("bucket"))
        .filter(col("a_id") =!= col("b_id"))
        .withColumn("score", graft.functions.VectorOps.cosineWithNorms(
          col("a_vec"), col("b_vec"), col("a_nsq"), col("b_nsq")))
        .filter(col("score") >= threshold)
        .select(
          least(col("a_id"), col("b_id")).as("doc_a"),
          greatest(col("a_id"), col("b_id")).as("doc_b"))
    }
    val corpusPairs = liveGenGroups(ss, indexPath).map { case (g, m, rows) =>
      val aG =
        if (g == curGen) assigned
        else assigned.select(col("n_id"), col("n_vec"), col("n_nsq"))
          .withColumn("bucket", nearestCentroid(col("n_vec"), m))
          .filter(col("bucket").isNotNull)
      val probed = aG.select("bucket").distinct().collect().map(_.getInt(0)).toSeq
      pairsAgainst(aG, rows.filter(col("bucket").isin(probed: _*)))
    }
    // in-batch pairs are their own frame (current bucket space), so they
    // survive even when the index holds no rows yet (empty-seeded store)
    val pairs = (corpusPairs :+ pairsAgainst(assigned, assigned))
      .reduce(_ unionByName _)
      .dropDuplicates("doc_a", "doc_b")
      .localCheckpoint()
    (assigned, pairs, curGen)
  }

  /** Write already-assigned rows ((n_id, n_vec, n_nsq, bucket) — the
    * [[appendToIndex]] projection) as a NAMED segment under
    * `segs/<segName>`, overwrite semantics — the replay-idempotent
    * streaming form of [[appendToIndex]]: a crash-replayed micro-batch
    * rewrites the same directory instead of appending its vectors twice.
    * Folded into one segment beside a live ingest by [[foldIndexSegments]],
    * or into the main lists by the stop-the-world [[compactIndexSegments]]
    * / [[rebuildIndex]]. Returns rows written. */
  def writeListSegment(
      assigned: DataFrame, path: String, segName: String,
      assignedGen: Option[String] = None): Long = {
    val batch = assigned.select("n_id", "n_vec", "n_nsq", "bucket").localCheckpoint()
    // cluster by bucket before the partitioned write: each bucket lands in
    // exactly one task => ONE file per touched bucket per segment, not one
    // per (task x bucket) — a week of micro-batches would otherwise strand
    // rows-count tiny files per trigger
    batch.repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$path/segs/$segName")
    // stamp the ASSIGNING generation: probes prune this root in ITS
    // quantizer's bucket space even after a rebuild flips the base (the
    // per-root `_BUCKETS` discipline). The name must come from the caller
    // whenever assignment happened earlier in the batch
    // ([[semanticMicroPairs]] returns it): a rebuild publishing BESIDE the
    // live ingest can flip the pointer between assignment and this write,
    // and a re-read here would stamp the new generation onto old-model
    // buckets — the segment's rows would then be pruned in the wrong
    // bucket space forever (the writePostingsSegment single-read
    // discipline, which reads P once for both rows and marker).
    val spark = assigned.sparkSession
    val fs = Seg.fs(spark, path)
    Seg.writeAtomic(fs, Seg.conf(spark),
      new org.apache.hadoop.fs.Path(s"$path/segs/$segName/_GEN"),
      assignedGen.getOrElse(genNameOf(fs, path)))
    val n = batch.count()
    graft.core.Blocks.free(batch)
    n
  }

  /** Fold accumulated streaming segments AND tombstones into the main
    * inverted lists — one flat bucket-partitioned tree again, deleted rows
    * physically reclaimed, tombstones and fold markers GC'd.
    * STOP-THE-WORLD for this index (rewrites `lists/` in place); to bound
    * segment count BESIDE a running
    * [[graft.streaming.Ingest.startSemanticIngest]], use
    * [[foldIndexSegments]] instead. */
  def compactIndexSegments(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val curRoot = genRoot(fs, path)
    val listsDir = new org.apache.hadoop.fs.Path(s"$curRoot/lists")
    val staging = new org.apache.hadoop.fs.Path(s"$curRoot/lists_staging")
    Seg.healSwap(fs, staging, listsDir) // finish a crashed prior swap first
    val segsDir = new org.apache.hadoop.fs.Path(s"$path/segs")
    val tombsDir = new org.apache.hadoop.fs.Path(s"$path/tombs")
    if (!fs.exists(segsDir) && !fs.exists(tombsDir)) return
    // STAGE-THEN-SWAP, not overwrite-in-place: the merged view streams
    // from the live tree into a durable sibling (repartitioned so each
    // bucket lands as ONE file, not one per input segment file), then one
    // delete+rename flips it in. A crash at any point leaves a complete
    // tree on disk — the old one, or the staged one healSwap recovers —
    // where the previous localCheckpoint + overwrite lost BOTH if the
    // JVM died mid-write (checkpoint blocks are executor memory only).
    // dropDuplicates(n_id): a crash AFTER the swap but BEFORE the segs/tombs
    // deletes makes this rerun read lists/ (already holding the folded rows)
    // PLUS the same segments again — without the dedup the duplicated rows
    // would occupy two ranks in topKIndexed permanently. Rows per n_id are
    // byte-identical (same vector, same assignment), so id-level dedup
    // restores exact contents; compactTextIndex uses the same discipline.
    // RE-ASSIGN under the current generation's quantizer: live segments
    // may have been assigned by a superseded generation, and this fold
    // retires every segment into the current lists tree — mixed bucket
    // spaces in one root would mis-prune probes. For rows already in the
    // current space the recomputation is the identity (assignment is a
    // deterministic function of the stored centroids).
    val model = readModelAt(spark, curRoot)
    readListsWithSegments(spark, path)
      .dropDuplicates("n_id")
      .withColumn("bucket", nearestCentroid(col("n_vec"), model))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(staging.toString)
    Seg.swapInto(fs, staging, listsDir)
    if (fs.exists(segsDir)) { fs.delete(segsDir, true); () }
    if (fs.exists(tombsDir)) { fs.delete(tombsDir, true); () }
    val markerDir = new org.apache.hadoop.fs.Path(s"$path/_folded")
    if (fs.exists(markerDir)) { fs.delete(markerDir, true); () }
    // every root outside the current generation is retired here:
    // stop-the-world, so superseded generations sweep drain-free
    val curGen = genNameOf(fs, path)
    Seg.listDirs(fs, new org.apache.hadoop.fs.Path(path)).map(_.getName)
      .filter(n => n.startsWith("gen_v") && n != curGen)
      .foreach { n =>
        fs.delete(new org.apache.hadoop.fs.Path(path, n), true); ()
      }
    if (curGen.nonEmpty)
      Seq("lists", "centroids", "meta").foreach { t =>
        val d = new org.apache.hadoop.fs.Path(path, t)
        if (fs.exists(d)) { fs.delete(d, true); () }
      }
  }

  /** Inverted-list health of a persisted index: LIVE row totals (base
    * lists + streaming segments, minus tombstoned ids), growth since
    * training, list-size imbalance, and pending-tombstone count. The
    * per-list counts scan the partition and id columns only (no vector
    * data is read). */
  def indexStats(spark: org.apache.spark.sql.SparkSession, path: String): Map[String, String] = {
    val sizes = readListsWithSegments(spark, path)
      .groupBy("bucket").count().collect().map(_.getLong(1))
    val total = sizes.sum
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val trained = spark.read.parquet(s"${genRoot(fs, path)}/meta").head().getLong(0)
    val avg = if (sizes.nonEmpty) total.toDouble / sizes.length else 0.0
    val tombs = tombsRows(spark, fs, path)
      .fold(0L)(_.distinct().count())
    Map(
      "graft.ivf.lists" -> sizes.length.toString,
      "graft.ivf.rows" -> total.toString,
      "graft.ivf.trained-rows" -> trained.toString,
      "graft.ivf.max-list" -> (if (sizes.isEmpty) "0" else sizes.max.toString),
      "graft.ivf.tombstones" -> tombs.toString,
      "graft.ivf.growth" -> f"${if (trained > 0) total.toDouble / trained else 1.0}%.4f",
      "graft.ivf.imbalance" -> f"${if (avg > 0) sizes.max / avg else 1.0}%.4f")
  }

  /** Staleness trigger for a persisted index — the compaction-scheduling
    * analogue ([[graft.core.Maintenance.needsCompaction]]'s shape): retrain
    * when the corpus has grown well past the training sample (centroids no
    * longer summarize the distribution) or one list dominates (probes of
    * that list degrade toward a full scan). Appends alone never retrain;
    * this gate decides when the cheap path has been stretched too far. */
  def needsRebuild(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      maxGrowth: Double = 2.0,
      maxImbalance: Double = 4.0): Boolean = {
    val stats = indexStats(spark, path)
    stats("graft.ivf.growth").toDouble > maxGrowth ||
      stats("graft.ivf.imbalance").toDouble > maxImbalance
  }
  /** Retrain over the index's CURRENT contents and publish the result as
    * a NEW GENERATION behind the `_LISTS` pointer — SAFE BESIDE LIVE
    * READERS AND A RUNNING [[graft.streaming.Ingest.startSemanticIngest]]
    * (the version-publish discipline of the band stores
    * (`Dedup._BANDS`) and the postings store (`Search._POSTINGS`);
    * reference anchor: kv/db/version_set.cpp:920-1018, LogAndApply
    * publishing new versions beside live readers). What a caller runs
    * when [[needsRebuild]] fires; at 100 TB retrains are routine, not
    * maintenance windows.
    *
    * The fold set is snapshotted at entry: the live segment list and the
    * tombstone files. The retrain reads EXACTLY those plus the current
    * generation's lists — all immutable once committed — so segments and
    * tombstones landing beside the retrain are simply not in the new
    * generation and STAY LIVE across the flip, probed in their own
    * quantizer's bucket space ([[liveGenGroups]]). The absorbed-segment
    * list rides INSIDE the generation dir, so the single atomic pointer
    * write both publishes the new lists and retires the segments they
    * folded in — no window where a row is served twice. A crash at ANY
    * point before the flip leaves the old generation untouched and
    * serving (the unreferenced partial generation sweeps at the next gc);
    * a rerun is idempotent. Superseded generations outlive the flip until
    * readers drain ([[gcIndexSegments]]).
    *
    * `branch > 0` retrains hierarchically ([[trainHier]] — the choice for
    * a rebuild whose lists have grown with the corpus); the default keeps
    * the exact flat retrain. `maxTrainRows > 0` caps the training sample
    * either way. */
  def rebuildIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      lists: Int,
      iters: Int = 3,
      branch: Int = 0,
      maxTrainRows: Long = 0L): Unit = {
    val fs = Seg.fs(spark, path)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val curGen = genNameOf(fs, path)
    val curRoot = genDirOf(path, curGen)
    // ---- fold-set snapshot (names and files only; no data copied) ----
    val (_, segs0) = liveListSegs(spark, path)
    val tombsDir = new org.apache.hadoop.fs.Path(s"$path/tombs")
    val tombFiles0: Seq[org.apache.hadoop.fs.Path] =
      if (!fs.exists(tombsDir)) Seq.empty
      else Seg.listFiles(fs, tombsDir)
        .filter(_.getName.endsWith(".parquet")).map(f =>
          new org.apache.hadoop.fs.Path(tombsDir, f.getName))
    val srcRoots = (s"$curRoot/lists" +: segs0.map(_.toString))
      .filter(r => hasDataFiles(fs, new org.apache.hadoop.fs.Path(r)))
    require(srcRoots.nonEmpty, s"rebuildIndex: no vectors under $path")
    // dropDuplicates(vec_id): after a crash-rerun of a fold/compaction a
    // row can appear in both the base lists and a still-live segment
    val raw = srcRoots.map(spark.read.parquet(_)).reduce(_ unionByName _)
      .select(col("n_id").as("vec_id"), col("n_vec").as("embedding"))
    val corpus = (
      if (tombFiles0.isEmpty) raw
      else raw.join(
        broadcast(spark.read.parquet(tombFiles0.map(_.toString): _*)
          .select(col("n_id").as("vec_id")).distinct()),
        Seq("vec_id"), "left_anti"))
      .dropDuplicates("vec_id")
    val model =
      if (branch > 0) trainHier(corpus, lists, branch, iters, maxTrainRows = maxTrainRows)
      else train(corpus, lists, iters, maxTrainRows = maxTrainRows)
    // ---- publish invisibly, then one atomic commit ----
    val nextGen = 1 + Seg.listDirs(fs, root).map(_.getName)
      .filter(_.startsWith("gen_v"))
      .flatMap(n => scala.util.Try(n.stripPrefix("gen_v").toInt).toOption)
      .foldLeft(0)(math.max)
    val gen = s"gen_v$nextGen"
    val genDir = new org.apache.hadoop.fs.Path(root, gen)
    if (fs.exists(genDir)) fs.delete(genDir, true) // a crashed prior attempt
    writeIndex(corpus, model, genDir.toString)
    // carry forward the previous absorbed names whose dirs still exist, so
    // a late crash-replay rewrite of a long-retired segment stays excluded
    val absorbed = segs0.map(_.getName) ++
      readAbsorbed(fs, curRoot).filter(n =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/segs/$n")))
    if (absorbed.nonEmpty)
      Seg.writeAtomic(fs, conf,
        new org.apache.hadoop.fs.Path(genDir, "_ABSORBED"),
        absorbed.distinct.mkString("\n"))
    Seg.writeAtomic(fs, conf,
      new org.apache.hadoop.fs.Path(root, ListsPointer), gen) // COMMIT
    // ---- cleanup (all safe to crash out of: a rerun or gc finishes) ----
    // the snapshot tombstones were excluded from the retrain corpus;
    // tombstones that arrived DURING the retrain are not in tombFiles0 and
    // stay live (their rows are in the new lists until the next fold)
    tombFiles0.foreach(f => fs.delete(f, false))
    ()
  }

  /** Load the quantizer of a persisted index — the full level tree for a
    * hierarchical model (leaf matrix = highest level), so every reader
    * (probe, append, streaming ingest) descends with EXACTLY the quantizer
    * the index was assigned by. A pre-hierarchical layout (no `level`
    * column) loads as the flat model it was. */
  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    readModelAt(spark, genRoot(Seg.fs(spark, path), path))

  /** [[readModel]] against an EXPLICIT generation root (no pointer
    * indirection) — the mixed-generation probe paths load each segment's
    * assigning quantizer by its own generation dir. */
  private def readModelAt(
      spark: org.apache.spark.sql.SparkSession, genDir: String): Model = {
    val df = spark.read.parquet(s"$genDir/centroids")
    if (!df.columns.contains("level")) {
      val rows = df.orderBy("bucket").collect()
      Model(rows.map(_.getAs[scala.collection.Seq[Float]]("centroid").toArray))
    } else {
      val byLevel = df.collect()
        .groupBy(_.getAs[Int]("level")).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.getAs[Int]("bucket"))
          .map(_.getAs[scala.collection.Seq[Float]]("centroid").toArray))
      Model(byLevel.last, byLevel.init)
    }
  }

  /** Top-k cosine search over a PERSISTED index: probed bucket ids are known
    * up front (C x dim centroid math on the tiny query batch), so the list
    * scan is filtered with a literal bucket set — static partition pruning;
    * only the probed list directories are read (PlanSpec asserts the
    * PartitionFilters). The query batch is collected to build the filter —
    * model-metadata-sized (|Q| x nProbe ints), never corpus data. */
  def topKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // base lists + streamed segments, bucket-pruned in every branch AND
    // in every GENERATION'S OWN bucket space — a segment assigned by a
    // superseded quantizer (the drain window after a beside-live rebuild
    // flip) is probed with bucket ids computed against ITS model, so
    // search stays exactly as recall-complete across the flip as before
    // it. Normally one group; the per-group probe job is query-batch
    // sized either way.
    val groups = liveGenGroups(spark, path)
    require(groups.nonEmpty, s"topKIndexed: no vector data under $path")
    val scored = groups.map { case (_, model, rows) =>
      // NOT checkpointed: the returned plan broadcast-joins this frame,
      // so a localCheckpoint here could never be freed — one leaked block
      // per call in a long-lived serving loop (the bm25Indexed leak shape
      // the r14 text soak caught). Query-batch-sized; the bucket-set
      // collect below recomputes the probe explode instead.
      val q = queries.select(
        col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        VectorOps.normSq(col(vecCol)).as("q_nsq"),
        explode(probeCentroids(col(vecCol), model, nProbe)).as("bucket"))
      val probed = q.select("bucket").distinct().collect().map(_.getInt(0)).toSeq
      scorePairs(rows.filter(col("bucket").isin(probed: _*)), q)
    }.reduce(_ unionByName _)
    rankTopK(scored, k)
  }

  /** Shared scoring tail of [[topK]] and [[topKIndexed]]: bucket equi-join
    * (query side broadcast), cosine from precomputed norms, per-query top-k
    * with the (score desc, n_id asc) tie-break. One definition so the
    * in-memory and indexed paths can never diverge. */
  private def scoreTopK(lists: DataFrame, q: DataFrame, k: Int): DataFrame =
    rankTopK(scorePairs(lists, q), k)

  /** The per-pair scoring half of [[scoreTopK]]: bucket equi-join (query
    * side broadcast), cosine from precomputed norms, projected to
    * (q_id, n_id, score) BEFORE any exchange — the rank window must never
    * carry the embedding vectors (a corpus vector lives in exactly one
    * bucket and queries probe distinct buckets, so a pair scores at most
    * once: no dedup needed either). Split out so the mixed-generation
    * probe can score each generation in its own bucket space and rank
    * over the union. */
  private def scorePairs(lists: DataFrame, q: DataFrame): DataFrame =
    lists
      .join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), VectorOps.cosineWithNorms(
        col("q_vec"), col("n_vec"), col("q_nsq"), col("n_nsq")).as("score"))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("score"), 6).as("score"))
  }

  /** Top-k cosine neighbors per query, scanning only `nProbe` inverted
    * lists per query. Bucketed equi-join: corpus rows carry one bucket,
    * queries explode to nProbe probes. */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      model: Model,
      k: Int,
      nProbe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(
      col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorOps.normSq(col(vecCol)).as("n_nsq"),
      nearestCentroid(col(vecCol), model).as("bucket"))
    val q = queries.select(
      col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorOps.normSq(col(vecCol)).as("q_nsq"),
      explode(probeCentroids(col(vecCol), model, nProbe)).as("bucket"))
    scoreTopK(c, q, k)
  }
}
