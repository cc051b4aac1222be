package graft

import graft.core.Tables
import graft.operators.{Dedup, Similarity, Skew}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join equivalence and the user-facing facade surface. */
class SkewAndFacadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedJoin == plain join on a skewed key distribution") {
    import spark.implicits._
    // heavy skew: 80% of left rows share one key
    val left = (1 to 2000).map(i => (if (i % 5 != 0) 1L else i.toLong, i)).toDF("k", "v")
    val right = (1L to 400L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltFactor = 8)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("twoPhaseAgg == direct aggregation on skewed keys") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (if (i % 10 != 0) "hot" else s"k$i", i.toLong)).toDF("k", "x")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("x").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val twoPhase = Skew.twoPhaseAgg(
      df, Seq("k"), saltFactor = 16,
      partial = Seq(count(lit(1)).as("pn"), sum("x").as("ps")),
      merge = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(twoPhase == direct)
  }

  test("facade: KV semantics + pipeline entry points compose") {
    val g = Graft(spark, TestSpark.Sf0001)
    assert(g.events.count() == 1000)
    val got = g.pointGet(col("user_id") === 7 && col("event_type") === "click", 500L).collect()
    assert(got.length <= 1)
    assert(g.exactDuplicates().count() == 500)
    val neighbors = g.topKNeighbors(g.embeddings.filter(col("vec_id") < 2), k = 3)
    assert(neighbors.count() == 6)
    assert(g.properties("graft.ansi.enabled") == "false")
    val sizes = g.approximateSizes(floor(col("user_id") / 5), length(col("props")))
    assert(sizes.count() >= 2)
  }

  test("facade: snapshot registry feeds compactAtFloor; held reads unchanged") {
    import graft.core.{Changelog, Tables => T}
    val g = Graft(spark, TestSpark.Sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_facade_").toString
    g.events.write.parquet(s"$tmp/log")
    val snap = g.getSnapshot(400L)
    val maxSeq = g.events.agg(max("event_id")).head().getLong(0)
    // floor = oldest live snapshot (400), NOT maxSeq
    val written = g.compactAtFloor(s"$tmp/log", s"$tmp/out", T.eventsSpec, currentSeq = maxSeq)
    assert(written > 0)
    def state(df: org.apache.spark.sql.DataFrame) =
      Changelog.collapseAt(df, T.eventsSpec, snap.seq)
        .select("user_id", "event_type", "event_id", "value")
        .collect().map(_.toSeq).toSet
    assert(state(spark.read.parquet(s"$tmp/out")) == state(g.events),
      "read at the held snapshot must survive compaction at the floor")
    g.releaseSnapshot(snap)
    assert(g.snapshots.openCount == 0)
  }

  test("facade: ingest write path round-trips — committed collapse == batch collapse") {
    val g = Graft(spark, TestSpark.Sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_fingest_").toString
    spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .repartition(2).write.parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    val q = g.ingest(s"$tmp/src", schema, s"$tmp/sink", s"$tmp/ckpt",
      orderCols = Seq("event_id"), spec = Tables.eventsSpec)
    q.awaitTermination()
    // the sink is raw columns + seq; re-derive the tombstone flag the same
    // way Tables.events does before collapsing
    val committed = g.readCommitted(s"$tmp/sink", s"$tmp/ckpt")
      .withColumn("is_delete", col("event_id") % 10 === 0)
    def state(df: DataFrame) =
      g.collapse(df, Tables.eventsSpec)
        .select("user_id", "event_type", "event_id", "value")
        .collect().map(_.toSeq).toSet
    assert(state(committed) == state(g.events),
      "facade-ingest then facade-collapse must equal batch collapse")
    val props = g.ingestProperties(s"$tmp/ckpt")
    assert(props("graft.ingest.committed.rows") == "1000")
    assert(props("graft.ingest.highwater.seq") == "1000")
    assert(props("graft.ingest.committed.batches").toInt >= 1)
  }

  test("facade: persisted vector index search (probe-all) == exact brute force") {
    val g = Graft(spark, TestSpark.Sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_fidx_").toString
    g.buildVectorIndex(s"$tmp/idx", lists = 8, iters = 2)
    val queries = g.embeddings.filter(col("vec_id") < 2)
    val exact = Similarity.bruteForceTopK(g.embeddings, queries, k = 3)
      .collect().map(_.toSeq).toSet
    val indexed = g.searchIndex(s"$tmp/idx", queries, k = 3, nProbe = 8)
      .collect().map(_.toSeq).toSet
    assert(indexed == exact, "probing all lists must reproduce the exact top-k")
    assert(g.simHashDuplicates().count() == Dedup.simHashPairs(g.documents).count())
    assert(g.jaccardDuplicates().count() ==
      Dedup.exactJaccardPairs(g.documents, threshold = 0.5).count())
    // horizon pass-through: bounded as-of keeps every left row (left join)
    val errors = g.events.filter(col("event_type") === "error")
    val clicks = g.events.filter(col("event_type") === "click")
    val bounded = g.asOfJoin(errors, clicks, Seq("user_id" -> "user_id"),
      "ts_us", "ts_us", Seq("event_id"), horizon = Some(3600L * 1000000L))
    assert(bounded.count() == errors.count())
    // the helper names are reserved ONLY on the horizon path: unbounded
    // passes a caller's same-named column through; bounded rejects it
    val withBucket = clicks.withColumn("_asof_bucket", lit(1))
    val unbounded = g.asOfJoin(errors, withBucket, Seq("user_id" -> "user_id"),
      "ts_us", "ts_us", Seq("event_id"))
    assert(unbounded.columns.contains("_asof_bucket"))
    intercept[IllegalArgumentException] {
      g.asOfJoin(errors, withBucket, Seq("user_id" -> "user_id"),
        "ts_us", "ts_us", Seq("event_id"), horizon = Some(3600L * 1000000L))
    }
  }

  test("facade: PQ lifecycle, auto-sized rebuild, classifier rule, searchable ingest") {
    import spark.implicits._
    val g = Graft(spark, TestSpark.Sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_fnew_").toString

    // IVF-PQ wrappers: build, ADC search shape, exact re-rank, append
    g.buildVectorIndexPq(s"$tmp/pq", lists = 4, m = 8, k = 16)
    val queries = g.embeddings.filter(col("vec_id") < 2)
    val adc = g.searchIndexPq(s"$tmp/pq", queries, k = 3, nProbe = 4).collect()
    assert(adc.groupBy(_.getLong(0)).forall(_._2.map(_.getLong(2)).sorted.sameElements(Seq(1L, 2L, 3L))),
      "ADC search must return ranks 1..3 per query")
    // re-rank scores are EXACT cosines: every pick matches brute force's
    // score for that (q, n) pair bit-for-bit (both round to 6 decimals)
    val exact = Similarity.bruteForceTopK(g.embeddings, queries, k = 499)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val rr = g.searchIndexPqReranked(s"$tmp/pq", queries, k = 3, nProbe = 4).collect()
    assert(rr.length == 6)
    rr.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact.contains(key) && exact(key) == r.getDouble(3),
        s"re-ranked score for $key must be the exact cosine")
    }
    // appended vectors (fresh ids) become searchable with the stored models
    val twins = g.embeddings.filter(col("vec_id") < 2)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    assert(g.appendToVectorIndexPq(s"$tmp/pq", twins) == 2L)
    val hits = g.searchIndexPq(s"$tmp/pq", queries, k = 499, nProbe = 4)
      .filter(col("n_id") >= 900000L).count()
    assert(hits >= 2, "each query's identical-vector twin shares its probed bucket")

    // auto-sized build and explicit rebuild: probe-all == exact brute force
    val bf = Similarity.bruteForceTopK(g.embeddings, queries, k = 3)
      .collect().map(_.toSeq).toSet
    g.buildVectorIndexAuto(s"$tmp/auto", targetListSize = 64, iters = 2)
    assert(g.searchIndex(s"$tmp/auto", queries, k = 3, nProbe = 64)
      .collect().map(_.toSeq).toSet == bf, "auto-sized probe-all == brute force")
    g.rebuildVectorIndex(s"$tmp/auto", lists = 4, iters = 2)
    assert(g.searchIndex(s"$tmp/auto", queries, k = 3, nProbe = 4)
      .collect().map(_.toSeq).toSet == bf, "rebuilt probe-all == brute force")
    val props = g.vectorIndexProperties(s"$tmp/auto")
    assert(props("graft.ivf.rows").toLong == g.embeddings.count())
    assert(props("graft.ivf.lists").toInt == 4)

    // classifier rule wrapper: verdicts == the scoring operator's
    val pos = g.documents.filter(col("doc_id") % 3 === 0)
    val neg = g.documents.filter(col("doc_id") % 3 === 1)
    val (ruleName, rule) = g.qualityClassifierRule(pos, neg, maxVocab = 500)
    assert(ruleName == "nb_junk")
    val viaRule = g.documents.select(col("doc_id"), rule.as("junk"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaScores = g.qualityClassifierScores(pos, neg, maxVocab = 500)
      .select(col("doc_id"), col("is_quality"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) == 0L)).toMap
    assert(viaRule == viaScores, "rule junk-verdicts must equal the scorer's")

    // searchable-on-write wrapper: base index + one drained stream == one
    // batch build over the union (the startTextIndexIngest contract: the
    // stream appends segments to an EXISTING index)
    val baseDocs = g.documents.filter(col("doc_id") < 20)
    val streamed = g.documents.filter(col("doc_id") >= 20 && col("doc_id") < 60)
    streamed.write.parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    graft.operators.Search.buildTextIndex(
      baseDocs.unionByName(streamed), s"$tmp/tidx", buckets = 16)
    graft.operators.Search.buildTextIndex(baseDocs, s"$tmp/sidx", buckets = 16)
    g.ingestSearchable(s"$tmp/src", schema, s"$tmp/sidx", s"$tmp/ckpt")
      .awaitTermination()
    val qs = Seq((1L, "spark merge scan")).toDF("query_id", "query_text")
    val a = g.searchDocumentsIndexed(s"$tmp/tidx", qs, topK = 5)
      .collect().map(_.toSeq).toSeq
    val b = g.searchDocumentsIndexed(s"$tmp/sidx", qs, topK = 5)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty, "streamed facade index must equal a batch build")
  }

  test("bounded as-of buckets exactly: negative epochs and backtick-hostile names") {
    import spark.implicits._
    // pre-1970 epochs: truncating division would put t in the wrong bucket
    // (e.g. -1 div 10 == 0, floor(-1/10) == -1) and silently drop matches
    val left = Seq((1L, -5L, 100L), (1L, 15L, 101L), (2L, -25L, 102L))
      .toDF("k", "time of day", "id") // space: needs backticks if interpolated
    val right = Seq((1L, -7L, 1.0), (1L, -16L, 2.0), (1L, 12L, 3.0), (2L, -30L, 4.0))
      .toDF("k", "time of day", "v")
    def run(h: Option[Long]) = graft.operators.AsOf.join(
      left, right, Seq("k" -> "k"), "time of day", "time of day", Seq("id"),
      horizon = h)
      .select(col("id"), col("v")).collect().map(r => (r.getLong(0), r.get(1))).toSet
    val unbounded = run(None)
    assert(unbounded == Set((100L, 1.0), (101L, 3.0), (102L, 4.0)))
    // horizon 10 covers every match above (gaps 2, 3, 5) -> identical result
    assert(run(Some(10L)) == unbounded,
      "bounded form must find the same matches for in-horizon history, negatives included")
    // horizon 4 excludes the (102, gap 5) match -> left-join miss (null v)
    assert(run(Some(4L)) == Set((100L, 1.0), (101L, 3.0), (102L, null)))
  }

  test("joinSorted == rank-join form on real data, including ties and misses") {
    import graft.operators.AsOf
    val ev = graft.core.Tables.events(spark, TestSpark.Sf0001)
    val errors = ev.filter(col("event_type") === "error")
    val clicks = ev.filter(col("event_type") === "click")
    def norm(df: org.apache.spark.sql.DataFrame,
             errId: org.apache.spark.sql.Column, clickId: org.apache.spark.sql.Column) =
      df.select(errId.as("e"), clickId.as("c")).collect()
        .map(r => (r.getLong(0), r.get(1))).toSet
    val viaJoin = norm(
      AsOf.join(errors, clicks, Seq("user_id" -> "user_id"), "ts_us", "ts_us",
        leftId = Seq("event_id"), tieBreak = Seq("event_id")),
      col("l.event_id"), col("r.event_id"))
    val viaSorted = norm(
      AsOf.joinSorted(errors, clicks, Seq("user_id" -> "user_id"), "ts_us", "ts_us",
        tieBreak = Seq("event_id")),
      col("event_id"), col("r_event_id"))
    assert(viaSorted == viaJoin, "carry-forward must pick identical winners (ties included)")
    // inner mode drops exactly the miss rows
    val inner = AsOf.joinSorted(errors, clicks, Seq("user_id" -> "user_id"),
      "ts_us", "ts_us", tieBreak = Seq("event_id"), joinType = "inner")
    assert(inner.count() == viaJoin.count(_._2 != null))
    assert(inner.filter(col("r_event_id").isNull).count() == 0)
    // prefixed-name clash is rejected, not silently shadowed
    intercept[IllegalArgumentException] {
      AsOf.joinSorted(errors.withColumn("r_event_id", lit(1)), clicks,
        Seq("user_id" -> "user_id"), "ts_us", "ts_us")
    }
  }

  test("joinSorted is null-rejecting on TIME, like the equi-join form") {
    import graft.operators.AsOf
    import spark.implicits._
    // REGRESSION: the asc sort puts nulls FIRST, so a null-time right row
    // was carried forward as the "match" for every left before the first
    // real right — a match the join form (r.time <= l.time, null = miss)
    // never produces
    val left = Seq((1L, 5L, 10L), (1L, 50L, 11L)).toDF("k", "t", "id")
    val right = Seq((1L, Option.empty[Long], 900L), (1L, Option(20L), 901L))
      .toDF("k", "t", "rid")
    val viaSorted = AsOf.joinSorted(left, right, Seq("k" -> "k"), "t", "t",
      tieBreak = Seq("rid"))
      .select(col("id"), col("r_rid")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(viaSorted(10L).isEmpty,
      "a left row before every real right must MISS, not match the null-time right")
    assert(viaSorted(11L).contains(901L))
    // a null-time LEFT is a miss too (sorts to the head, sees no right)
    val nullLeft = Seq((1L, Option.empty[Long], 12L)).toDF("k", "t", "id")
    val m = AsOf.joinSorted(nullLeft, right, Seq("k" -> "k"), "t", "t",
      tieBreak = Seq("rid")).select("r_rid").head()
    assert(m.isNullAt(0), "null-time left must be a miss")
  }

  test("joinSorted is null-rejecting on keys, like the equi-join form") {
    import graft.operators.AsOf
    import spark.implicits._
    val left = Seq((1L, Option(10L), 5L), (2L, Option.empty[Long], 6L))
      .toDF("id", "k", "t")
    val right = Seq((100L, Option(10L), 1L), (200L, Option.empty[Long], 2L))
      .toDF("rid", "k", "t")
    val m = AsOf.joinSorted(left, right, Seq("k" -> "k"), "t", "t", tieBreak = Seq("rid"))
      .select("id", "r_rid").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(m(1L) == 100L)
    assert(m(2L) == null,
      "a null-key left row must be a miss, not paired with a null-key right")
    assert(AsOf.joinSorted(left, right, Seq("k" -> "k"), "t", "t",
      tieBreak = Seq("rid"), joinType = "inner").count() == 1)
  }

  test("facade: properties surface the last compaction's job metrics") {
    val g = Graft(spark, TestSpark.Sf0001)
    assert(!g.properties.contains("graft.compaction.rows.written"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_fprops_").toString
    g.events.write.parquet(s"$tmp/log")
    val written = g.compact(s"$tmp/log", s"$tmp/out", Tables.eventsSpec, retention = 1000L)
    assert(written > 0)
    val p = g.properties
    assert(p("graft.compaction.rows.written") == written.toString)
    assert(p("graft.compaction.files.produced").toLong >= 1)
    assert(p("graft.compaction.files.copied") == "0")
    assert(p("graft.compaction.bytes.written").toLong > 0)
    assert(p("graft.compaction.runs") == "1")
    // a trivial-move SKIP must not bump the run counter (recompacting the
    // already-compacted output is a no-op), so pollers can tell skip apart
    val skipped = g.compact(s"$tmp/out", s"$tmp/out2", Tables.eventsSpec, retention = 1000L)
    assert(skipped == -1L)
    assert(g.properties("graft.compaction.runs") == "1")
  }
}
