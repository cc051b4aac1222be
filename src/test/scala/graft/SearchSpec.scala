package graft

import graft.operators.Search
import graft.queries.Registry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 retrieval semantics: hand-computed scores, tie-breaks, disjunctive
  * hit semantics, and the broadcast-probe plan shape.
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pin(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's decimal accumulation mirrored: each per-term
    * contribution rounds to DECIMAL(30,10), the exact sum casts back to
    * double, the result rounds to 4 decimals. */
  private def score(contribs: Double*): Double =
    pin(contribs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble)

  // the operator's formula re-derived in plain scalar math (identical op
  // structure: same idf variant, same k1/b literal arithmetic)
  private val (k1, b) = (1.2, 0.75)
  private def idf(n: Double, df: Double): Double =
    math.log((n - df + 0.5) / (df + 0.5) + 1.0)
  private def contrib(idf: Double, tf: Double, dl: Double, avgdl: Double): Double =
    idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))

  test("bm25 scores match the hand-derived formula; ranking and hit semantics hold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian durian durian durian"))
      .toDF("doc_id", "text")
    val qs = Seq(
      (1L, "apple"),
      (2L, "apple durian banana"),
      (3L, "missing"))
      .toDF("query_id", "query_text")
    val out = Search.bm25(docs, qs, topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

    val (n, avgdl) = (3.0, 3.0) // dl 3 + 2 + 4 over 3 docs
    // q1 "apple": df = 2; d1 tf=2 dl=3, d2 tf=1 dl=2; d3 no hit
    val iA = idf(n, 2.0)
    assert(out((1L, 1L)) == ((1L, score(contrib(iA, 2.0, 3.0, avgdl)))), s"${out((1L, 1L))}")
    assert(out((1L, 2L)) == ((2L, score(contrib(iA, 1.0, 2.0, avgdl)))), s"${out((1L, 2L))}")
    assert(!out.contains((1L, 3L)), "doc without the term must not be a hit")
    // q2 "apple durian banana": d1 scores apple(2) + banana(1), d3 scores
    // durian(4) with the rare-term idf
    val iB = idf(n, 1.0)
    val d1 = score(contrib(iA, 2.0, 3.0, avgdl), contrib(iB, 1.0, 3.0, avgdl))
    val d3 = score(contrib(iB, 4.0, 4.0, avgdl))
    assert(out((2L, 1L))._2 == d1, s"q2 d1: ${out((2L, 1L))} vs $d1")
    assert(out((2L, 3L))._2 == d3, s"q2 d3: ${out((2L, 3L))}")
    // q3: term absent from the corpus -> zero hits
    assert(!out.keys.exists(_._1 == 3L), "no-hit query must return no rows")

    // tie-break: two identical docs share a score; lower id ranks first
    val tied = Seq((7L, "kiwi kiwi"), (5L, "kiwi kiwi"), (9L, "mango")).toDF("doc_id", "text")
    val tq = Seq((1L, "kiwi")).toDF("query_id", "query_text")
    val ranks = Search.bm25(tied, tq, topK = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(ranks == Map(5L -> 1L, 7L -> 2L), s"tie-break by id: $ranks")
  }

  test("bm25Indexed == bm25 exactly; the postings read is partition-pruned to term buckets") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
    val qs = Seq((1L, "dup scan"), (2L, "spark query merge"), (3L, "zebra"))
      .toDF("query_id", "query_text")
    val idx = java.nio.file.Files.createTempDirectory("graft_bm25_idx_").toString
    Search.buildTextIndex(docs, idx, buckets = 64)
    val scan = Search.bm25(docs, qs, topK = 7).collect().map(_.toSeq)
      .sortBy(_.mkString(","))
    val indexed = Search.bm25Indexed(spark, idx, qs, topK = 7)
    val got = indexed.collect().map(_.toSeq).sortBy(_.mkString(","))
    assert(got.toSeq == scan.toSeq, "the indexed path must equal the scan path row for row")
    // the term-bucket pruning must reach the READ as path construction:
    // only the query terms' posting directories are handed to the reader
    // (never a filter over a full-root listing)
    val hitPbs = qs.select(explode(split(col("query_text"), " ")).as("tok"))
      .select(pmod(xxhash64(col("tok")), lit(64L))).distinct()
      .collect().map(_.getLong(0)).toSet
    val readDirs = indexed.inputFiles
      .flatMap(_.split("/").find(_.startsWith("pb=")))
      .map(_.stripPrefix("pb=").toLong).toSet
    assert(readDirs.nonEmpty && readDirs.subsetOf(hitPbs),
      s"only hit pb= directories may be read: read $readDirs vs hit $hitPbs")
    assert(readDirs.size < 64, "the read must not touch every bucket")

    // stats come from meta, not a corpus rescan: the index answers alone
    // (score against a rebuilt index over HALF the corpus differs — avgdl
    // and df really derive from the indexed corpus, not the query batch)
    val half = docs.filter(col("doc_id") % 2 === 0)
    val idx2 = java.nio.file.Files.createTempDirectory("graft_bm25_idx2_").toString
    Search.buildTextIndex(half, idx2, buckets = 64)
    val h = Search.bm25Indexed(spark, idx2, qs.filter(col("query_id") === 1L), topK = 7)
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    val hScan = Search.bm25(half, qs.filter(col("query_id") === 1L), topK = 7)
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    assert(h.toSeq == hScan.toSeq, "half-corpus index must equal half-corpus scan")
  }

  test("text-index lifecycle: append == rebuild, delete == rebuild-without, compaction invariant") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
    val first = docs.filter(col("doc_id") % 3 =!= 0)
    val rest = docs.filter(col("doc_id") % 3 === 0)
    val qs = Seq((1L, "dup scan"), (2L, "spark query")).toDF("query_id", "query_text")
    def run(path: String) = Search.bm25Indexed(spark, path, qs, topK = 9)
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq

    // append: index(first) + append(rest) == index(all)
    val grown = java.nio.file.Files.createTempDirectory("graft_ti_grow_").toString
    Search.buildTextIndex(first, grown, buckets = 32)
    val appended = Search.appendToTextIndex(rest, grown)
    assert(appended == rest.count(), "every batch doc appended")
    val full = java.nio.file.Files.createTempDirectory("graft_ti_full_").toString
    Search.buildTextIndex(docs, full, buckets = 32)
    assert(run(grown) == run(full), "append must equal a full rebuild")

    // delete: index(all) - delete(rest) == index(first); idempotent re-delete
    assert(Search.deleteFromTextIndex(rest.select("doc_id"), full) == rest.count())
    val firstOnly = java.nio.file.Files.createTempDirectory("graft_ti_first_").toString
    Search.buildTextIndex(first, firstOnly, buckets = 32)
    assert(run(full) == run(firstOnly), "delete must equal a rebuild without the docs")
    Search.deleteFromTextIndex(rest.select("doc_id"), full)
    assert(run(full) == run(firstOnly), "double delete must change nothing")

    // compaction reclaims without changing any result
    Search.compactTextIndex(spark, full)
    assert(run(full) == run(firstOnly), "compaction must be invisible to search")
    assert(!new java.io.File(s"$full/tombs").exists(), "tombstones reclaimed")
  }

  test("streaming text-index ingest: searchable immediately == batch rebuild; replay-idempotent") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ti_stream_").toString
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
    val base = docs.filter(col("doc_id") < 300)
    val s1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val s2 = docs.filter(col("doc_id") >= 400)
    graft.operators.Search.buildTextIndex(base, s"$tmp/idx", buckets = 32)

    def writeSrc(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/stage/$name")
      val dst = new java.io.File(s"$tmp/src"); dst.mkdirs()
      new java.io.File(s"$tmp/stage/$name").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(
          f.toPath, new java.io.File(dst, s"$name.parquet").toPath))
    }
    writeSrc("f1", s1)
    writeSrc("f2", s2)
    val schema = spark.read.parquet(s"$tmp/src").schema
    def run(): Unit = graft.streaming.Ingest.startTextIndexIngest(
      spark, s"$tmp/src", schema, s"$tmp/idx", s"$tmp/ckpt",
      maxFilesPerTrigger = Some(1)).awaitTermination()
    run()

    val qs = Seq((1L, "dup scan"), (2L, "spark query")).toDF("query_id", "query_text")
    def search() = graft.operators.Search.bm25Indexed(spark, s"$tmp/idx", qs, topK = 9)
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    val full = java.nio.file.Files.createTempDirectory("graft_ti_stream_full_").toString
    graft.operators.Search.buildTextIndex(docs, full, buckets = 32)
    val expected = graft.operators.Search.bm25Indexed(spark, full, qs, topK = 9)
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    assert(search() == expected, "streamed segments must equal a batch rebuild exactly")

    // crash replay: drop the last commit, rerun — the segment rewrites in
    // place (postings AND stats), results byte-identical
    val commits = new java.io.File(s"$tmp/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val last = commits.last
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    last.delete(); if (crc.exists()) crc.delete()
    run()
    assert(search() == expected, "a replayed batch must not change any score")

    // stats see base + streamed segments with exactly the scoring view
    val pre = graft.operators.Search.textIndexStats(spark, s"$tmp/idx")
    assert(pre("graft.text.docs").toLong == docs.count(), s"stats docs: $pre")
    assert(pre("graft.text.segments").toInt == 2, s"two live segments: $pre")

    // folding the segments flat changes nothing either
    graft.operators.Search.compactTextIndex(spark, s"$tmp/idx")
    assert(!new java.io.File(s"$tmp/idx/segs").exists(), "segments folded away")
    assert(search() == expected, "compaction must be invisible to search")
    val post = graft.operators.Search.textIndexStats(spark, s"$tmp/idx")
    assert(post("graft.text.docs") == pre("graft.text.docs") &&
      post("graft.text.avgdl") == pre("graft.text.avgdl") &&
      post("graft.text.postings") == pre("graft.text.postings"),
      s"fold must not change the corpus view: $pre vs $post")
    assert(post("graft.text.segments").toInt == 0)
  }

  test("text-index growth: generation flip beside live segments keeps search == scan; gc sweeps; compaction persists") {
    import spark.implicits._
    sys.props("graft.text.bucket.target.rows") = "50" // fixture-sized growth
    try {
      val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      val base = docs.filter(col("doc_id") % 3 === 0)
      val s1 = docs.filter(col("doc_id") % 3 === 1)
      val s2 = docs.filter(col("doc_id") % 3 === 2)
      val tmp = java.nio.file.Files.createTempDirectory("graft_ti_gen_").toString
      val idx = s"$tmp/idx"
      val qs = Seq((1L, "dup scan"), (2L, "spark query merge"))
        .toDF("query_id", "query_text")
      def search() = Search.bm25Indexed(spark, idx, qs, topK = 9)
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
      def scan(d: org.apache.spark.sql.DataFrame) = Search.bm25(d, qs, topK = 9)
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq

      // seed deliberately undersized (P=4), one PRE-FLIP segment at P=4
      Search.buildTextIndex(base, idx, buckets = 4)
      Search.writePostingsSegment(s1, idx, "seg_batch_000000")
      assert(search() == scan(base.unionByName(s1)), "pre-growth equality")

      // the fold slot GROWS the base root (auto >= 2x4 with the pinned
      // target): a new generation behind the `_POSTINGS` pointer, while
      // the live P=4 segment keeps pruning at its OWN marker — mixed-P
      Search.foldTextSegments(spark, idx, gc = false)
      val ptr = new java.io.File(s"$idx/_POSTINGS")
      assert(ptr.exists(), "growth publishes behind the pointer")
      val gen = new String(
        java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim
      assert(gen == "postings_v1", s"first generation (saw $gen)")
      val newP = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(s"$idx/$gen/_BUCKETS").toPath), "UTF-8").trim.toInt
      assert(newP >= 8, s"grown P (saw $newP)")
      assert(new java.io.File(s"$idx/postings").exists(),
        "the superseded root outlives the flip until readers drain")
      assert(spark.read.parquet(s"$idx/meta").head().getInt(2) == 4,
        "the beside-live grow never rewrites meta (pre-marker fallback P)")
      assert(search() == scan(base.unionByName(s1)),
        "mixed-P store (grown base + P=4 segment) must stay exact")

      // a post-flip segment lands at the grown P; the next fold retires
      // both into ONE compact segment at the operative P
      Search.writePostingsSegment(s2, idx, "seg_batch_000001")
      val segP = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(s"$idx/segs/seg_batch_000001/postings/_BUCKETS").toPath),
        "UTF-8").trim.toInt
      assert(segP == newP, "post-flip segments sign at the grown P")
      assert(search() == scan(docs), "full view before the fold")
      Search.foldTextSegments(spark, idx, gc = false)
      val live = new java.io.File(s"$idx/segs").listFiles().filter(_.isDirectory)
        .map(_.getName)
      assert(live.count(_.startsWith("compact_")) == 1,
        s"one compact segment: ${live.toSeq}")
      assert(search() == scan(docs), "fold must not change any score")

      // drain-safe sweep: superseded generation + folded segments go
      assert(Search.gcTextIndex(spark, idx) >= 3L)
      assert(!new java.io.File(s"$idx/postings").exists(), "legacy root swept")
      val after = new java.io.File(s"$idx/segs").listFiles().filter(_.isDirectory)
      assert(after.forall(_.getName.startsWith("compact_")), "folded segments swept")
      assert(search() == scan(docs), "gc must not change any score")

      // append == rebuild across the flip (the direct-append path lands
      // at the grown P inside the current generation)
      val extra = Seq((900001L, "zeta quark lattice dup scan"))
        .toDF("doc_id", "text")
      val union = docs.select("doc_id", "text").unionByName(extra)
      Search.appendToTextIndex(extra, idx)
      assert(search() == scan(union),
        "append into the grown generation == rebuild over the union")

      // stop-the-world compaction persists the operative P into meta and
      // changes nothing visible
      Search.compactTextIndex(spark, idx)
      assert(spark.read.parquet(s"$idx/meta").head().getInt(2) >= newP,
        "compaction persists the grown P into meta")
      assert(!new java.io.File(s"$idx/segs").exists(), "segments folded away")
      assert(search() == scan(union), "compaction must be invisible to search")
    } finally sys.props.remove("graft.text.bucket.target.rows")
  }

  test("empty-seeded streaming store: growth/fold/search/delete/compaction survive a data-less base root") {
    import spark.implicits._
    sys.props("graft.text.bucket.target.rows") = "50" // fixture-sized growth
    try {
      val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      val s1 = docs.filter(col("doc_id") % 2 === 0)
      val s2 = docs.filter(col("doc_id") % 2 === 1)
      val tmp = java.nio.file.Files.createTempDirectory("graft_ti_empty_").toString
      val idx = s"$tmp/idx"
      val qs = Seq((1L, "dup scan"), (2L, "spark query merge"))
        .toDF("query_id", "query_text")
      def search() = Search.bm25Indexed(spark, idx, qs, topK = 9)
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
      def scan(d: org.apache.spark.sql.DataFrame) = Search.bm25(d, qs, topK = 9)
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq

      // pure-streaming seed: a build over ZERO rows writes only _SUCCESS —
      // the base root has no data files to schema-infer from
      Search.buildTextIndex(docs.limit(0), idx, buckets = 4)
      Search.writePostingsSegment(s1, idx, "seg_batch_000000")
      Search.writePostingsSegment(s2, idx, "seg_batch_000001")
      assert(search() == scan(docs), "segments-only store must score == scan")

      // growth trips off segment mass alone (auto >= 2x4 at the pinned
      // target); the fold slot used to CRASH here trying to re-bucket the
      // data-less base — it must publish an EMPTY generation instead and
      // fold both segments into one compact segment at the grown P
      Search.foldTextSegments(spark, idx, gc = false)
      val ptr = new java.io.File(s"$idx/_POSTINGS")
      assert(ptr.exists(), "growth must still publish behind the pointer")
      val gen = new String(
        java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim
      val newP = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(s"$idx/$gen/_BUCKETS").toPath), "UTF-8").trim.toInt
      assert(newP >= 8, s"grown P (saw $newP)")
      assert(!new java.io.File(s"$idx/$gen").listFiles()
        .exists(_.getName.endsWith(".parquet")),
        "the published generation is empty (marker only)")
      val live = new java.io.File(s"$idx/segs").listFiles().filter(_.isDirectory)
      assert(live.count(_.getName.startsWith("compact_")) == 1,
        s"fold still runs after the empty publish: ${live.map(_.getName).toSeq}")
      assert(search() == scan(docs), "post-flip equality")
      Search.gcTextIndex(spark, idx)
      assert(search() == scan(docs), "gc must not change any score")

      // takedown + stop-the-world compaction both read past the data-less
      // base root
      assert(Search.deleteFromTextIndex(s2.select("doc_id"), idx) > 0L)
      assert(search() == scan(s1), "delete == rebuild-without")
      Search.compactTextIndex(spark, idx)
      assert(search() == scan(s1), "compaction must be invisible to search")

      // full takedown then compact: an all-empty store — stats read zeros
      // (the compacted generation is data-less again)
      Search.deleteFromTextIndex(s1.select("doc_id"), idx)
      Search.compactTextIndex(spark, idx)
      val st = Search.textIndexStats(spark, idx)
      assert(st("graft.text.docs") == "0" && st("graft.text.postings") == "0", st)
      val e = intercept[IllegalArgumentException] {
        Search.bm25Indexed(spark, idx, qs)
      }
      assert(e.getMessage.contains("empty index"))
    } finally sys.props.remove("graft.text.bucket.target.rows")
  }

  test("q32 plan: query terms broadcast; no corpus sort-merge; topK bounded by rank filter") {
    val df = Registry.byName("q32_bm25_search").fn(spark, TestSpark.Sf0001)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val cut = full.indexOf("== Initial Plan ==")
    val p = if (cut < 0) full else full.substring(0, cut)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "term set and idf table must broadcast: " + p.take(1000))
    assert(!p.contains("SortMergeJoin"), "the corpus must never sort-merge")
    val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toList
    exchanges.foreach(keys =>
      assert(!keys.contains("text"), s"no text on a shuffle: $keys"))
    // topK respected per query
    val byQ = df.collect().groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) => assert(rows.length <= 10, s"query $q overflow") }
  }

  test("fuseRankings: hand-computed RRF scores, missing docs, weight degeneration") {
    import spark.implicits._
    val r1 = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val r2 = Seq((1L, 11L, 1L), (1L, 13L, 2L)).toDF("query_id", "doc_id", "rank")
    val fused = Search.fuseRankings(Seq(r1, r2), topK = 10, k0 = 60)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    // hand-computed (DECIMAL(30,10) per contribution, exact sum, round 6):
    // 11: 1/62 + 1/61 = 0.0161290323 + 0.0163934426 = 0.0325224749 -> 0.032522
    // 10: 1/61 -> 0.016393;  13: 1/62 -> 0.016129;  12: 1/63 -> 0.015873
    assert(fused == Map(
      11L -> (1L, 0.032522), 10L -> (2L, 0.016393),
      13L -> (3L, 0.016129), 12L -> (4L, 0.015873)), s"fused: $fused")
    // a zero weight degenerates to the other ranking's order (zero-weight
    // docs trail with score 0, tie-broken by id)
    val kwOnly = Search.fuseRankings(Seq(r1, r2), topK = 10, weights = Seq(1.0, 0.0))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(kwOnly == Map(10L -> 1L, 11L -> 2L, 12L -> 3L, 13L -> 4L), s"kw-only: $kwOnly")
    // per-query independence: a second query's ranks never leak into the first
    val r3 = Seq((1L, 10L, 1L), (2L, 10L, 1L), (2L, 99L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val byQ = Search.fuseRankings(Seq(r3), topK = 10)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byQ == Map(1L -> 1, 2L -> 2))
  }

  test("hybridTopK: degenerate weights reproduce each component ranking's order") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
    val emb = graft.core.Tables.embeddings(spark, TestSpark.Sf0001)
    val qs = Seq((1L, "spark merge"), (2L, "filter window")).toDF("query_id", "query_text")
    val queries = qs.join(
      emb.select(col("vec_id").as("query_id"), col("embedding").as("query_vec")),
      Seq("query_id"))
    def order(df: org.apache.spark.sql.DataFrame) = df
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq).toMap
    // keyword-only fusion: the docs BM25 ranked must lead in BM25 order
    val kw = order(Search.bm25(docs, qs, topK = 5)
      .select(col("query_id"), col("doc_id"), col("rank")))
    val kwOnly = order(Search.hybridTopK(docs, emb, queries, topK = 5,
      fetchK = 5, denseWeight = 0.0))
    kw.foreach { case (q, ids) =>
      assert(kwOnly(q).take(ids.length) == ids,
        s"query $q: keyword-only fusion must lead with the BM25 order") }
    // dense-only fusion: leads with the brute-force cosine order.
    // excludeSelf = false mirrors hybridTopK's dense side: query ids are a
    // separate namespace, so the doc sharing a query's id must NOT drop —
    // here each query's vector IS that doc's embedding, so the id-equal doc
    // is the rank-1 dense hit (cosine 1.0) and proves the non-exclusion
    val dn = order(graft.operators.Similarity.bruteForceTopK(emb,
      queries.select(col("query_id").as("vec_id"), col("query_vec").as("embedding")),
      k = 5, excludeSelf = false)
      .select(col("q_id"), col("n_id"), col("rank")))
    dn.foreach { case (q, ids) =>
      assert(ids.head == q, s"query $q: its own doc (cosine 1.0) must lead the dense ranking") }
    val dnOnly = order(Search.hybridTopK(docs, emb, queries, topK = 5,
      fetchK = 5, keywordWeight = 0.0))
    dn.foreach { case (q, ids) =>
      assert(dnOnly(q).take(ids.length) == ids,
        s"query $q: dense-only fusion must lead with the cosine order") }
    // the balanced fusion returns exactly topK rows per query, ranks 1..k,
    // and the facade wrapper is the same computation
    val hy = Search.hybridTopK(docs, emb, queries, topK = 5).collect()
    hy.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).sorted.sameElements(1L to 5L), s"query $q ranks") }
    val viaFacade = Graft(spark, TestSpark.Sf0001).hybridSearch(queries, topK = 5)
      .collect().map(_.toSeq).toSet
    assert(viaFacade == hy.map(_.toSeq).toSet, "facade must equal the operator")
  }

  test("hybrid fusion with an INDEX-BACKED dense side: IVF-PQ ranking swaps in via fuseRankings") {
    // the scale path the hybridSearch scaladoc documents: rankings are the
    // interchange format, so the brute-force dense side swaps for a PQ
    // index ranking without touching fusion
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
    val emb = graft.core.Tables.embeddings(spark, TestSpark.Sf0001)
    val coarse = graft.operators.Ivf.train(emb, c = 8, iters = 2)
    val pqm = graft.operators.Pq.train(emb, m = 8, k = 32, iters = 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_hypq_").toString
    graft.operators.Pq.writeIndex(emb, coarse, pqm, tmp)

    val qs = Seq((1L, "spark merge"), (2L, "filter window")).toDF("query_id", "query_text")
    val queries = qs.join(
      emb.select(col("vec_id").as("query_id"), col("embedding").as("query_vec")),
      Seq("query_id"))
    // exactly the scaladoc's swap, shapes included
    val dense = graft.operators.Pq.topKIndexed(spark, tmp,
      queries.select(col("query_id").as("vec_id"), col("query_vec").as("embedding")),
      k = 5, nProbe = 8)
      .select(col("q_id").as("query_id"), col("n_id").as("doc_id"), col("rank"))
    val kw = Search.bm25(docs, qs, topK = 5)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val fused = Search.fuseRankings(Seq(kw, dense), topK = 5)
    val byQ = fused.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == Set(1L, 2L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).sorted.sameElements(1L to 5L), s"query $q fused ranks") }
    // each query's vector IS a stored embedding, so the PQ ranking leads
    // with that doc (ADC maximum for identical codes) — dense-only fusion
    // must surface it at rank 1, proving the index ranking actually drives
    // the fused order
    val denseLead = dense.filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dnOnly = Search.fuseRankings(Seq(kw, dense), topK = 5, weights = Seq(0.0, 1.0))
      .filter(col("rank") === 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dnOnly == denseLead, s"dense-only fusion leads with the PQ order: $dnOnly vs $denseLead")
  }
}
