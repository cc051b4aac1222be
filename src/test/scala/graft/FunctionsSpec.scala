package graft

import graft.functions.{Aggregators, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit specs for the function library: text primitives (edge cases the
  * oracle can't stress), the bloom UDAF (no false negatives + sane FPR),
  * and the weighted-average UDAF's order independence.
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("shingles: short documents yield empty sets, no crash") {
    import spark.implicits._
    val df = Seq("one", "one two", "one two three", "one two three four", "")
      .toDF("text")
    val out = df.select(size(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    // "" tokenizes to [""] (1 token) -> 0 shingles
    assert(out == Seq(0, 0, 1, 2, 0))
  }

  test("bpeTokens: greedy longest-match, char fallback, space markers, round-trip") {
    import spark.implicits._
    val vocab = Seq("ab", "abc", "c", "d", "the", "th")
    def toks(s: String): Seq[String] =
      Seq(s).toDF("text").select(TextOps.bpeTokens(col("text"), vocab).as("t"))
        .head().getSeq[String](0)
    // longest match wins: "abc" (len 3) beats "ab" at position 0
    assert(toks("abcd") == Seq(" abc", "d"))
    // unmatched positions fall back to single chars
    assert(toks("xyz") == Seq(" x", "y", "z"))
    // word-initial pieces carry the space marker; later pieces don't
    assert(toks("the theabc") == Seq(" the", " the", "abc"))
    // whitespace runs collapse exactly like the whitespace tokenizer; each
    // word's first piece carries the marker
    assert(toks("  ab\t\nc  ") == Seq(" ab", " c"))
    // empty and all-whitespace yield NO tokens (unlike split("") == [""])
    assert(toks("") == Seq.empty)
    assert(toks("   ") == Seq.empty)
    // ltrim(concat(pieces)) reconstructs the whitespace-normalized text
    val texts = Seq("the quick  brown\tfox", "abc d the", "lone")
    val rt = texts.toDF("text")
      .select(
        ltrim(concat_ws("", TextOps.bpeTokens(col("text"), vocab))).as("r"),
        TextOps.normalized(col("text")).as("n_lower"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("n"))
      .collect()
    rt.foreach(r => assert(r.getString(0) == r.getString(2), s"round-trip failed: $r"))
  }

  test("minhash is permutation-invariant; fingerprint is order-sensitive") {
    import spark.implicits._
    val df = Seq(
      ("a b c d e f g", "g f e d c b a"),
      ("x y z", "z y x")).toDF("t1", "t2")
    val r = df.select(
      (TextOps.minHash(array_distinct(TextOps.tokens(col("t1"))), 16) ===
        TextOps.minHash(array_distinct(TextOps.tokens(col("t2")))
          .alias("x"), 16)).as("mh_eq"),
      (TextOps.fingerprint(TextOps.tokens(col("t1"))) =!=
        TextOps.fingerprint(TextOps.tokens(col("t2")))).as("fp_ne")).collect()
    assert(r.forall(_.getBoolean(0)), "minhash must ignore order")
    assert(r.forall(_.getBoolean(1)), "fingerprint must distinguish order")
  }

  test("hamming64 and simhash basics") {
    import spark.implicits._
    val df = Seq((0L, -1L)).toDF("a", "b")
    assert(df.select(TextOps.hamming64(col("a"), col("b"))).head().getInt(0) == 64)
    val same = Seq(("alpha beta gamma", "alpha beta gamma")).toDF("x", "y")
    val h = same.select(TextOps.hamming64(
      TextOps.simHash(TextOps.tokens(col("x"))),
      TextOps.simHash(TextOps.tokens(col("y"))))).head().getInt(0)
    assert(h == 0)
  }

  test("ngramHashes == hashed string shingles (same set sizes and Jaccard), all documents") {
    val toks = TextOps.tokens(col("text"))
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select(
        col("doc_id"),
        TextOps.ngramHashes(transform(toks, t => xxhash64(t)), 3).as("ng"),
        sort_array(transform(TextOps.shingles(toks, 3), e => xxhash64(e))).as("sg"))
    // sizes match per doc (distinct string shingles <-> distinct combined hashes)
    val sizeDiff = docs.filter(size(col("ng")) =!= size(col("sg"))).count()
    assert(sizeDiff == 0)
    // pairwise Jaccard identical on a sample of doc pairs
    val a = docs.select(col("doc_id").as("ida"), col("ng").as("nga"), col("sg").as("sga")).filter(col("ida") < 30)
    val b = docs.select(col("doc_id").as("idb"), col("ng").as("ngb"), col("sg").as("sgb")).filter(col("idb") < 30)
    val mismatches = a.crossJoin(b).filter(col("ida") < col("idb"))
      .select(
        (TextOps.jaccardSortedHashes(col("nga"), col("ngb")) ===
          TextOps.jaccardSortedHashes(col("sga"), col("sgb"))).as("eq"))
      .filter(!col("eq")).count()
    assert(mismatches == 0)
  }

  test("ngramHashes edge cases: short/empty docs give empty sets") {
    import spark.implicits._
    val df = Seq("one", "one two", "one two three", "").toDF("text")
    val out = df.select(size(TextOps.ngramHashes(
      transform(TextOps.tokens(col("text")), t => xxhash64(t)), 3)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 0, 1, 0))
  }

  test("native TokenHashes == regex tokenize + xxhash64, all documents + edge cases") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001).select("text")
    val edges = Seq(
      "", " ", "  \t\n ", "a", " a ", "a b", "a  b", "\ta\nb\r c\f",
      "多字节 tokens mixed まで", "trailing space ", " leading", "a b" // NBSP is NOT \s
    ).toDF("text")
    val mismatches = docs.unionByName(edges)
      .select(
        TextOps.tokenHashes(col("text")).as("native"),
        transform(TextOps.tokens(col("text")), t => xxhash64(t)).as("ref"))
      .filter(not(col("native") === col("ref"))).count()
    assert(mismatches == 0, "fused tokenizer must be bit-identical to the regex pipeline")
    // null text -> null (UnaryExpression null propagation)
    val n = Seq[String](null).toDF("text")
      .select(TextOps.tokenHashes(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("native MinHashSlots == higher-order-function reference, all documents + empty") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select(TextOps.ngramHashes(TextOps.tokenHashes(col("text")), 3).as("sh"))
      .localCheckpoint() // HOF form requires a materialized input column
    val mismatches = docs.select(
      (TextOps.minHashFromHashes(col("sh"), 32) ===
        TextOps.minHashFromHashesHof(col("sh"), 32)).as("eq"))
      .filter(!col("eq")).count()
    assert(mismatches == 0, "native minhash must be bit-identical to the HOF fold")
    val empty = Seq(Seq.empty[Long]).toDF("sh")
      .select(TextOps.minHashFromHashes(col("sh"), 4))
      .head().getAs[scala.collection.Seq[Long]](0)
    assert(empty == Seq.fill(4)(Long.MaxValue), s"empty set => MaxValue slots: $empty")
  }

  test("native SimHash64 expression == higher-order-function reference, all documents") {
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"),
        transform(TextOps.tokens(col("text")), t => xxhash64(t)).as("hs"))
    val both = docs.select(
      TextOps.simHashFromHashes(col("hs")).as("native"),
      TextOps.simHashFromHashesHof(col("hs")).as("hof")).collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
    assert(both.nonEmpty)
  }

  test("langId picks the dictionary language with most stopword hits") {
    import spark.implicits._
    val df = Seq(
      "the cat sat on the mat and it was happy",
      "der Hund ist nicht ein Tier mit der Katze und",
      "el perro y la casa es que no con una").toDF("text")
    val out = df.select(TextOps.langId(col("text"))).collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "de", "es"), s"got $out")
  }

  test("bloom UDAF: zero false negatives, FPR under 5% at 10 bits/key") {
    import spark.implicits._
    val keys = (0 until 1000).map(i => s"key_$i")
    val bloomUdaf = udaf(new Aggregators.BloomBuild(10240, 7))
    val bits = keys.toDF("k").repartition(8)
      .agg(bloomUdaf(col("k"))).head().getAs[scala.collection.Seq[Long]](0).toArray
    val fn = keys.count(k => !Aggregators.BloomOps.mightContain(bits, 10240, 7, k))
    assert(fn == 0, "bloom filters must never false-negative")
    val fp = (0 until 10000).count(i => Aggregators.BloomOps.mightContain(bits, 10240, 7, s"absent_$i"))
    assert(fp < 500, s"FPR ${fp / 10000.0} too high")
  }

  test("WeightedAvg is independent of partitioning") {
    import spark.implicits._
    val wavg = udaf(new Aggregators.WeightedAvg)
    val data = (1 to 500).map(i => (i * 1.5, (i % 7 + 1).toLong))
    val expected = {
      val num = data.map { case (v, w) => math.round(v * 1000000L) * w }.sum
      val den = data.map(_._2).sum
      num.toDouble / (1000000.0 * den)
    }
    for (parts <- Seq(1, 4, 13)) {
      val got = data.toDF("v", "w").repartition(parts)
        .agg(wavg(col("v"), col("w"))).head().getDouble(0)
      assert(got == expected, s"parts=$parts: $got != $expected")
    }
  }

  test("WeightedAvg does not overflow on large heavy groups (BigDecimal accumulator)") {
    import spark.implicits._
    val wavg = udaf(new Aggregators.WeightedAvg)
    // scaled-long accumulation would overflow: 200k rows x (1e5 * 1e6 scale * 1e5 weight)
    val got = (1 to 200000).map(_ => (100000.0, 100000L)).toDF("v", "w")
      .agg(wavg(col("v"), col("w"))).head().getDouble(0)
    assert(math.abs(got - 100000.0) < 1e-6, s"got $got")
  }

  test("langId detects unspaced Chinese text via CJK characters") {
    import spark.implicits._
    val df = Seq(
      "今天天气很好我们去公园散步吧这是一个测试",
      "the cat sat on the mat and it was happy").toDF("text")
    val out = df.select(TextOps.langId(col("text"))).collect().map(_.getString(0)).toSeq
    assert(out == Seq("zh", "en"), s"got $out")
  }

  test("quality score stays in [0,1] and is deterministic") {
    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
    val qs = docs.select(TextOps.qualityScore(col("text")).as("q")).collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
    val qs2 = docs.select(TextOps.qualityScore(col("text")).as("q")).collect().map(_.getDouble(0))
    assert(qs.sameElements(qs2))
  }

  // ---- positionalNgramHashes (the ExactSubstr offset kernel) ----

  test("positionalNgramHashes: out(i) == ngramHashes of the slice [i, i+n), all documents") {
    import spark.implicits._
    val th0 = TextOps.tokenHashes(coalesce(col("text"), lit("")))
    val rows = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select(th0.as("th"),
        TextOps.positionalNgramHashes(th0, 3).as("pos"),
        TextOps.ngramHashes(th0, 3).as("ng"))
      .collect()
    assert(rows.nonEmpty)
    // driver-side reference of the shared fold (h = h*P + x, null -> 0)
    val P = 0x100000001b3L
    def fold(slice: Seq[Long]): Long = slice.foldLeft(0L)((h, x) => h * P + x)
    rows.foreach { r =>
      val th = r.getSeq[Long](0)
      val pos = r.getSeq[Long](1)
      val distinctForm = r.getSeq[Long](2)
      assert(pos.length == math.max(th.length - 2, 0), "one hash per start offset")
      // each positional value is the fold of its slice — offset preserved,
      // duplicates kept in order
      assert(pos == th.sliding(3).filter(_.length == 3).map(fold).toSeq)
      // catalog-interop: the positional stream's distinct set IS the
      // distinct kernel's output for the same document
      assert(pos.distinct.sorted == distinctForm.sorted)
    }
  }

  test("positionalNgramHashes: fewer than n tokens -> empty; null elements fold as 0") {
    import spark.implicits._
    val short = Seq(Tuple1(Seq(1L, 2L))).toDF("a")
      .select(TextOps.positionalNgramHashes(col("a"), 3)).head().getSeq[Long](0)
    assert(short.isEmpty, "2 tokens, n=3 -> empty")
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("a")
      .select(TextOps.positionalNgramHashes(col("a"), 1)).head().getSeq[Long](0)
    assert(empty.isEmpty)
    // a null element folds as 0 — same value as a literal 0 in that slot
    val withNull = Seq(Tuple1(Seq[java.lang.Long](1L, null, 3L))).toDF("a")
      .select(TextOps.positionalNgramHashes(col("a"), 3)).head().getSeq[Long](0)
    val withZero = Seq(Tuple1(Seq(1L, 0L, 3L))).toDF("a")
      .select(TextOps.positionalNgramHashes(col("a"), 3)).head().getSeq[Long](0)
    assert(withNull == withZero && withNull.length == 1)
  }

  test("positionalNgramHashes: interpreted eval == codegen eval") {
    import spark.implicits._
    def run(): Seq[Seq[Long]] =
      Seq(Seq(1L, 2L, 3L, 4L), Seq(7L, 7L, 7L), Seq(5L), Seq.empty[Long])
        .toDF("a").select(TextOps.positionalNgramHashes(col("a"), 2))
        .collect().map(_.getSeq[Long](0)).toSeq
    val gen = run()
    assert(gen.head.length == 3 && gen(1) == Seq(gen(1).head, gen(1).head), "dups kept in order")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == gen, "interpreted must equal codegen")
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  // ---- hierProbes (the hierarchical IVF quantizer kernel) ----

  /** call graft_hier_probes over one float vector with the given tree. */
  private def hier(v: Seq[Float], tree: Seq[Array[Array[Float]]], k: Int): Seq[Int] = {
    import spark.implicits._
    Seq(Tuple1(v)).toDF("v")
      .select(call_function("graft_hier_probes", col("v"),
        typedLit(tree.flatten.toArray), typedLit(tree.map(_.length).toArray), lit(k)))
      .head().getSeq[Int](0)
  }

  private def flatProbes(v: Seq[Float], cents: Array[Array[Float]], k: Int): Seq[Int] = {
    import spark.implicits._
    Seq(Tuple1(v)).toDF("v")
      .select(call_function("graft_centroid_probes", col("v"), typedLit(cents), lit(k)))
      .head().getSeq[Int](0)
  }

  test("hierProbes: single-level tree == flat centroidProbes for every k, all documents") {
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, TestSpark.Sf0001).limit(64)
    val cents = emb.orderBy("vec_id").limit(8).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    for (k <- Seq(1, 3, 8)) {
      val got = emb.select(call_function("graft_hier_probes", col("embedding"),
        typedLit(cents), typedLit(Array(8)), lit(k)).as("p")).collect().map(_.getSeq[Int](0))
      val want = emb.select(call_function("graft_centroid_probes", col("embedding"),
        typedLit(cents), lit(k)).as("p")).collect().map(_.getSeq[Int](0))
      assert(got.toSeq == want.toSeq, s"k=$k: one-level tree must equal the flat kernel")
    }
  }

  test("hierProbes: two-level descend, greedy containment, k >= leaves exact") {
    // dim-1 tree crafted so the greedy path diverges from the beam:
    // level 0: A=0, B=10; leaves (A's children first): -8, 3, 4.8, 5.2.
    // query 4.9 -> greedy descends A (|4.9| < |5.1|) then leaf 1 (=3), but
    // the top-2 leaves by distance are 2 (=4.8) and 3 (=5.2) under B.
    val tree = Seq(
      Array(Array(0f), Array(10f)),
      Array(Array(-8f), Array(3f), Array(4.8f), Array(5.2f)))
    val v = Seq(4.9f)
    assert(hier(v, tree, 1) == Seq(1), "k=1 is the greedy descend")
    // pure beam would return [2, 3]; containment splices the greedy leaf
    assert(hier(v, tree, 2) == Seq(2, 1), "greedy leaf spliced into the last slot")
    assert(hier(v, tree, 3) == Seq(2, 3, 1), "greedy leaf inside top-k stays in place")
    // k = leaves degenerates to the exact flat scan over the leaf level
    assert(hier(v, tree, 4) == flatProbes(v, tree(1), 4))
    // containment property over a spread of queries: probes(v, k) always
    // contains probes(v, 1) — the invariant IVF self-match recall rests on
    for (q <- Seq(-9f, -1f, 0f, 2.9f, 4.9f, 5.0f, 7f, 11f); k <- 1 to 4) {
      val g = hier(Seq(q), tree, 1).head
      assert(hier(Seq(q), tree, k).contains(g), s"q=$q k=$k must contain greedy leaf $g")
    }
  }

  test("hierProbes: interpreted eval == codegen eval") {
    val tree = Seq(
      Array(Array(0f, 1f), Array(10f, -2f)),
      Array(Array(-8f, 0f), Array(3f, 1f), Array(4.8f, -1f), Array(5.2f, 2f)))
    val vs = Seq(Seq(4.9f, 0.5f), Seq(-3f, 2f), Seq(0f, 0f), Seq(Float.NaN, 1f))
    def run(): Seq[Seq[Int]] = vs.map(v => hier(v, tree, 2))
    val gen = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = run()
      assert(interp == gen, s"interpreted $interp != codegen $gen")
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("hierProbes: null vector / wrong dim -> null; bad level sizes rejected") {
    import spark.implicits._
    val tree = Seq(Array(Array(0f, 0f), Array(1f, 1f)),
      Array(Array(0f, 0f), Array(1f, 1f), Array(2f, 2f), Array(3f, 3f)))
    val flat = typedLit(tree.flatten.toArray)
    val sizes = typedLit(tree.map(_.length).toArray)
    val df = Seq((1L, Seq(0.5f, 0.5f)), (2L, Seq(0.5f, 0.5f, 9f)))
      .toDF("id", "v")
      .withColumn("v", when(col("id") === 2, col("v"))) // id=1 -> null vector
    val out = df.select(call_function("graft_hier_probes", col("v"), flat, sizes, lit(2)).as("p"))
      .collect()
    assert(out(0).isNullAt(0), "null vector -> null")
    assert(out(1).isNullAt(0), "dimension mismatch -> null")
    // a level whose size is not a multiple of its parent's must be rejected
    // at registration (silent mis-partitioned descends otherwise)
    val bad = intercept[Exception] {
      Seq(Tuple1(Seq(0f, 0f))).toDF("v")
        .select(call_function("graft_hier_probes", col("v"),
          typedLit(tree.flatten.toArray.take(5)),
          typedLit(Array(2, 3)), lit(1))).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(bad).contains("multiple"), messages(bad))
  }

  test("lshBands: a too-short signature fails loudly instead of emitting constant keys") {
    import spark.implicits._
    // REGRESSION: slices past the signature's end folded to the bare seed
    // — the SAME band key for every document, silently degenerating the
    // candidate join to an all-pairs cross product
    val df = Seq((1L, Seq(1L, 2L))).toDF("id", "sig")
    val e = intercept[Exception] {
      df.select(TextOps.lshBands(col("sig"), bands = 2, rowsPerBand = 2)).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(e).contains("needs bands*rowsPerBand"), messages(e).take(300))
    // a correctly-sized signature still bands fine
    val ok = Seq((1L, Seq(1L, 2L, 3L, 4L))).toDF("id", "sig")
      .select(TextOps.lshBands(col("sig"), bands = 2, rowsPerBand = 2).as("b"))
      .head().getSeq[Long](0)
    assert(ok.length == 2)
  }

  test("langId: null text yields null, not a confident label") {
    import spark.implicits._
    val out = Seq((1L, Option("the cat and the dog is on it")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .select(col("id"), TextOps.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("en"))
    assert(out(2L).isEmpty, "null text must not be labeled (was confidently 'de')")
  }

  test("simHash HOF reference skips null elements like the native kernel") {
    import spark.implicits._
    val df = Seq((1L, Seq(Option(123456789L), Option.empty[Long], Option(987654321L))))
      .toDF("id", "hs")
    val r = df.select(
      TextOps.simHashFromHashes(col("hs")).as("native"),
      TextOps.simHashFromHashesHof(col("hs")).as("hof")).head()
    assert(r.getLong(0) == r.getLong(1),
      "the equivalence contract must hold on nullable-element input " +
        s"(native=${r.getLong(0)}, hof=${r.getLong(1)})")
  }

  test("Tokenizer.learn on a no-repeating-pairs corpus still drives Bpe") {
    import spark.implicits._
    // every word distinct and single-occurrence: no adjacent pair reaches
    // frequency 2, so the merge loop yields nothing — the fallback returns
    // the most frequent whole words instead of an empty vocab Bpe rejects
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val vocab = graft.functions.Tokenizer.learn(docs, numMerges = 10)
    assert(vocab.nonEmpty, "fallback vocab must be non-empty")
    val bpe = graft.functions.Tokenizer.Bpe(vocab) // must not throw
    val n = docs.select(bpe.count(col("text")).as("n")).collect().map(_.getLong(0)).sum
    assert(n > 0)
  }

  test("CentroidProbes rejects a ragged centroid matrix at construction") {
    val ragged = Array(Array(1f, 2f), Array(1f, 2f, 3f))
    val e = intercept[IllegalArgumentException] {
      graft.plans.CentroidProbes(
        org.apache.spark.sql.catalyst.expressions.Literal(null,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        ragged, 1)
    }
    assert(e.getMessage.contains("ragged"))
  }
}
