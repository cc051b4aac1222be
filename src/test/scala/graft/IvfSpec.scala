package graft

import graft.operators.{Ivf, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-flat ANN: recall floor vs brute force, determinism across runs, and
  * probe-scaling sanity.
  */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb = graft.core.Tables.embeddings(spark, TestSpark.Sf0001)
  private lazy val queries = emb.filter(col("vec_id") < 20)

  test("recall@5 improves with nProbe and reaches full scan at nProbe = C") {
    val model = Ivf.train(emb, c = 16, iters = 2)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nProbe: Int): Double = {
      val approx = Ivf.topK(emb, queries, model, k = 5, nProbe = nProbe)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      approx.intersect(exact).size.toDouble / exact.size
    }
    val r2 = recall(2)
    val r8 = recall(8)
    val rAll = recall(16)
    assert(rAll == 1.0, s"probing every list must equal brute force, got $rAll")
    assert(r8 >= r2, s"recall must not decrease with more probes: $r2 -> $r8")
    assert(r8 >= 0.4, s"recall@5 with half the lists probed: $r8")
  }

  test("sampled training (maxTrainRows) yields a full-width model; nProbe=C still exact") {
    // ~12 rows/centroid sample: model must still have C centroids of the
    // right dim, search must stay deterministic, and probing every list is
    // still a full scan (sampling moves CENTROIDS, never corpus coverage)
    val model = Ivf.train(emb, c = 16, iters = 2, maxTrainRows = 200L)
    assert(model.c == 16)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = Ivf.topK(emb, queries, model, k = 5, nProbe = 16)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == exact, "nProbe = C must equal brute force regardless of training sample")
    // a sample cap >= corpus is a no-op: identical centroids to full training
    val capped = Ivf.train(emb, c = 16, iters = 2, maxTrainRows = 1000000L)
    val full = Ivf.train(emb, c = 16, iters = 2)
    assert(capped.centroids.map(_.toSeq).toSeq == full.centroids.map(_.toSeq).toSeq)
  }

  test("cluster count clamps to corpus size (no crash on tiny corpora)") {
    val tiny = emb.filter(col("vec_id") < 5)
    val model = Ivf.train(tiny, c = 32, iters = 2)
    assert(model.c == 5)
    val out = Ivf.topK(tiny, tiny.filter(col("vec_id") === 0), model, k = 3, nProbe = 5)
    assert(out.count() == 3)
    // nProbe beyond the clamped list count means probe-everything, not crash
    val over = Ivf.topK(tiny, tiny.filter(col("vec_id") === 0), model, k = 3, nProbe = 8)
    assert(over.collect().map(_.toSeq).toSeq == out.collect().map(_.toSeq).toSeq)
  }

  test("NaN embeddings degrade deterministically (no job-killing exception)") {
    import spark.implicits._
    val model = Ivf.train(emb.filter(col("vec_id") < 50), c = 4, iters = 1)
    val dirty = Seq((999L, Array.fill(64)(Float.NaN))).toDF("vec_id", "embedding")
    // assignment must produce a bucket (lowest-index fallback), twice the same
    val a = dirty.select(Ivf.nearestCentroid(col("embedding"), model)).head().getInt(0)
    val b = dirty.select(Ivf.nearestCentroid(col("embedding"), model)).head().getInt(0)
    assert(a == b && a >= 0 && a < model.c)
  }

  test("persisted index: topKIndexed == in-memory topK, and the scan is partition-pruned") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    val model = Ivf.train(emb, c = 16, iters = 2)
    Ivf.writeIndex(emb, model, tmp)
    // round-trip of the model through the index
    val loaded = Ivf.readModel(spark, tmp)
    assert(loaded.centroids.flatten.toSeq == model.centroids.flatten.toSeq)

    val mem = Ivf.topK(emb, queries, model, k = 5, nProbe = 4).collect().map(_.toSeq).toSet
    val idx = Ivf.topKIndexed(spark, tmp, queries, k = 5, nProbe = 4)
    assert(idx.collect().map(_.toSeq).toSet == mem,
      "indexed search must equal the in-memory bucketed search")

    // the probed-bucket filter must reach the scan as PARTITION pruning:
    // only probed list directories are read, the nProbe/C scan property
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket"),
      s"bucket filter must be a partition filter, plan:\n${plan.take(2000)}")
  }

  test("append with stored model: search-after-append == full rewrite under the same model") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfapp_").toString
    val firstHalf = emb.filter(col("vec_id") % 2 === 0)
    val secondHalf = emb.filter(col("vec_id") % 2 =!= 0)
    // model trained on the first half only — appends must NOT retrain
    val model = Ivf.train(firstHalf, c = 8, iters = 2)
    Ivf.writeIndex(firstHalf, model, tmp)
    val appended = Ivf.appendToIndex(secondHalf, tmp)
    assert(appended == secondHalf.count(), s"append must add exactly the new vectors, got $appended")
    // reference: one-shot index over the full corpus with the SAME model
    val full = java.nio.file.Files.createTempDirectory("graft_ivffull_").toString
    Ivf.writeIndex(emb, model, full)
    val a = Ivf.topKIndexed(spark, tmp, queries, k = 5, nProbe = 4).collect().map(_.toSeq).toSet
    val b = Ivf.topKIndexed(spark, full, queries, k = 5, nProbe = 4).collect().map(_.toSeq).toSet
    assert(a == b, "append-then-search must equal rewrite-then-search under the same model")
    // growth doubled but stays model-stable; imbalance metrics are surfaced
    val stats = Ivf.indexStats(spark, tmp)
    assert(stats("graft.ivf.rows").toLong == emb.count())
    assert(stats("graft.ivf.growth").toDouble > 1.8 && stats("graft.ivf.growth").toDouble < 2.2)
  }

  test("needsRebuild trips on growth and on list imbalance, not on modest appends") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfreb_").toString
    val model = Ivf.train(emb, c = 8, iters = 2)
    Ivf.writeIndex(emb, model, tmp)
    assert(!Ivf.needsRebuild(spark, tmp), "fresh index must not need a rebuild")
    // a skew flood: many copies of ONE vector -> a single list balloons,
    // tripping both the growth and imbalance triggers
    val hot = emb.orderBy("vec_id").limit(1)
      .select(col("embedding")).head().getAs[scala.collection.Seq[Float]](0)
    val flood = spark.range(1000000, 1000000 + 3L * emb.count())
      .select(col("id").as("vec_id"), typedLit(hot).as("embedding"))
    Ivf.appendToIndex(flood, tmp)
    val stats = Ivf.indexStats(spark, tmp)
    assert(stats("graft.ivf.growth").toDouble > 2.0, s"flood must register as growth: $stats")
    assert(stats("graft.ivf.imbalance").toDouble > 4.0, s"hot list must register as imbalance: $stats")
    assert(Ivf.needsRebuild(spark, tmp), "staleness gate must fire after the flood")
    // the rebuild retrains over current contents and resets both triggers
    Ivf.rebuildIndex(spark, tmp, lists = 8, iters = 2)
    val after = Ivf.indexStats(spark, tmp)
    assert(after("graft.ivf.growth").toDouble == 1.0, s"rebuild resets growth: $after")
    assert(after("graft.ivf.rows").toLong == 4L * emb.count())
  }

  test("deletion: tombstoned ids vanish from search and stats; compaction reclaims and GCs") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfdel_").toString
    val model = Ivf.train(emb, c = 8, iters = 2)
    Ivf.writeIndex(emb, model, tmp)
    val n = emb.count()
    val victims = emb.filter(col("vec_id") % 7 === 0).select("vec_id")
    val nVictims = victims.count()

    val deleted = Ivf.deleteFromIndex(victims, tmp)
    assert(deleted == nVictims, s"distinct ids tombstoned: $deleted vs $nVictims")
    assert(Ivf.deleteFromIndex(victims, tmp) == nVictims, "re-deleting is idempotent")

    // search never returns a tombstoned id, and equals a fresh index built
    // over the surviving corpus under the same model (k small enough that
    // survivors fill every result set)
    val survivors = emb.filter(col("vec_id") % 7 =!= 0)
    val ref = java.nio.file.Files.createTempDirectory("graft_ivfdelref_").toString
    Ivf.writeIndex(survivors, model, ref)
    val liveQueries = queries.filter(col("vec_id") % 7 =!= 0)
    val a = Ivf.topKIndexed(spark, tmp, liveQueries, k = 3, nProbe = 8)
    assert(a.filter(col("n_id") % 7 === 0).count() == 0, "no tombstoned id may surface")
    val b = Ivf.topKIndexed(spark, ref, liveQueries, k = 3, nProbe = 8)
    assert(a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet,
      "search-after-delete must equal an index built over the surviving corpus")

    val stats = Ivf.indexStats(spark, tmp)
    assert(stats("graft.ivf.rows").toLong == n - nVictims, s"live rows exclude tombstoned: $stats")
    assert(stats("graft.ivf.tombstones").toLong == nVictims, s"pending tombstones surfaced: $stats")

    // compaction physically reclaims the rows and GCs the tombstones;
    // nothing observable changes
    Ivf.compactIndexSegments(spark, tmp)
    assert(!new java.io.File(s"$tmp/tombs").exists(), "tombstones folded away")
    val after = Ivf.indexStats(spark, tmp)
    assert(after("graft.ivf.rows").toLong == n - nVictims && after("graft.ivf.tombstones") == "0")
    assert(Ivf.topKIndexed(spark, tmp, liveQueries, k = 3, nProbe = 8)
      .collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet,
      "post-compaction search unchanged")
    // physical: the deleted ids are gone from the lists themselves
    assert(spark.read.parquet(s"$tmp/lists").filter(col("n_id") % 7 === 0).count() == 0)
  }

  test("training and search are deterministic run to run") {
    val m1 = Ivf.train(emb, c = 8, iters = 2)
    val m2 = Ivf.train(emb, c = 8, iters = 2)
    assert(m1.centroids.flatten.toSeq == m2.centroids.flatten.toSeq)
    val a = Ivf.topK(emb, queries, m1, k = 3, nProbe = 4).collect().map(_.toSeq).toSeq
    val b = Ivf.topK(emb, queries, m2, k = 3, nProbe = 4).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
