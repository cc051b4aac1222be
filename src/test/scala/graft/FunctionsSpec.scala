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
}
