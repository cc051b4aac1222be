package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives over string columns — tokenization, shingling,
  * MinHash/SimHash signatures, language/quality heuristics, fingerprints.
  *
  * All built from codegen'd built-ins (split/transform/aggregate/xxhash64);
  * the hash family is `xxhash64(token, seed)` which is deterministic across
  * runs and partitionings.
  */
object TextOps {

  /** Whitespace tokenization (collapses runs of whitespace, trims ends). */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(text, "\\s+", " ")), " ")

  /** Normalized text for exact dedup: lowercase, whitespace-collapsed. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Per-token xxhash64 values in one fused pass (no regex, no token-string
    * allocation) — bit-identical to `transform(tokens(text), xxhash64)`.
    * Lowers to the native [[graft.plans.TokenHashes]] expression; the entry
    * point for every hashed-token pipeline (minhash, simhash, n-gram
    * Jaccard), where regex tokenization is the measured hotspot. */
  def tokenHashes(text: Column): Column =
    call_function("graft_token_hashes", text)

  /** Word n-gram shingles (distinct), e.g. n=3 for near-dup detection.
    * Implemented with `transform` over token offsets — codegen, no UDF. */
  def shingles(toks: Column, n: Int): Column = {
    // positions 0 .. size-n; slice is 1-based. Guard count < 1: sequence(1, 0)
    // would produce a DESCENDING [1, 0] (default step -1 when start > stop)
    // and slice(toks, 0, n) throws — short docs get an empty shingle set.
    val count = size(toks) - (n - 1)
    when(count < 1, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(
          sequence(lit(1), count),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Sorted distinct n-gram hashes straight from token hashes — the hashed
    * equivalent of [[shingles]] (distinct shingle strings <-> distinct
    * combined hashes w.h.p.) without building shingle strings. Lowers to the
    * native [[graft.plans.NgramHashes]] expression; output feeds
    * [[jaccardSortedHashes]] and [[minHashFromHashes]] directly. */
  def ngramHashes(tokenHashes: Column, n: Int): Column =
    call_function("graft_ngram_hashes", tokenHashes, lit(n))

  /** Positional n-gram hashes — one combined hash per start offset, order
    * preserved, duplicates kept (`out(i)` covers tokens `[i, i+n)`). Same
    * fold as [[ngramHashes]], so values interop with catalogs built from the
    * distinct form. Lowers to the native
    * [[graft.plans.PositionalNgramHashes]] expression. */
  def positionalNgramHashes(tokenHashes: Column, n: Int): Column =
    call_function("graft_pos_ngram_hashes", tokenHashes, lit(n))

  /** Jaccard over SORTED distinct hash arrays (`sort_array` once per doc):
    * the per-pair intersection is a native merge walk
    * ([[graft.plans.SortedLongIntersectCount]]) — no hash set per pair. The
    * kernel of all-pairs exact verification at corpus scale. */
  def jaccardSortedHashes(a: Column, b: Column): Column = {
    val inter = call_function("graft_sorted_intersect_count", a, b).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** MinHash signature from PRE-HASHED set elements (`array<long>`): slot i
    * is `min over h of (h * A_i + B_i)` — k independent universal hashes
    * derived by affine transforms of ONE base hash per element (the standard
    * one-hash scheme), so a k=64 signature costs one string hash plus 64
    * long multiply-adds per element instead of 64 string hashes. Constants
    * are splitmix64-derived from the slot index: deterministic across runs.
    * Empty input => array of Long.MaxValue. Lowers to the native one-pass
    * [[graft.plans.MinHashSlots]] expression (the composed form traversed
    * the array k times and allocated k transformed copies per document). */
  def minHashFromHashes(hashes: Column, k: Int): Column =
    call_function("graft_minhash_slots", hashes, lit(k))

  /** Reference implementation of [[minHashFromHashes]] built from
    * higher-order built-ins (k array_min folds); kept for equivalence
    * testing of the native expression. */
  def minHashFromHashesHof(hashes: Column, k: Int): Column = {
    val sigs = (0 until k).map { i =>
      val (a, b) = minHashCoeffs(i)
      coalesce(
        array_min(transform(hashes, h => h * lit(a) + lit(b))),
        lit(Long.MaxValue))
    }
    array(sigs: _*)
  }

  /** Deterministic odd multiplier + offset per signature slot (shared with
    * the native expression — single source in [[graft.plans.TextKernels]]). */
  private[graft] def minHashCoeffs(i: Int): (Long, Long) =
    graft.plans.TextKernels.minHashCoeffs(i)

  /** MinHash over raw string sets (convenience form; for corpus-scale use,
    * materialize `transform(set, xxhash64)` once and call
    * [[minHashFromHashes]]). */
  def minHash(set: Column, k: Int): Column =
    minHashFromHashes(transform(set, e => xxhash64(e)), k)

  /** LSH band keys from a MinHash signature: `bands` slices of `rowsPerBand`
    * signature entries, each folded to one long key. Docs sharing any band
    * key are near-dup candidates — the join key that replaces the O(n^2)
    * pair scan at scale. The fold is a seeded FNV-style polynomial over the
    * slice (band index in the seed, so bands occupy disjoint keyspaces
    * w.h.p.) — no string building, one long per band instead of the former
    * concat_ws + xxhash64 struct key. */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column = {
    // guard the slot count: a signature SHORTER than bands * rowsPerBand
    // would make the tail bands' slices empty, so their folds return the
    // bare seed — the SAME constant key for every document. Every doc
    // would then share those band keys and the candidate join silently
    // degenerates to the full O(n^2) cross product the banding exists to
    // avoid. Mis-wired (numHashes, bands) is a setup error: fail loudly.
    val needed = bands * rowsPerBand
    when(size(signature) < lit(needed),
      raise_error(concat(
        lit(s"lshBands: signature has "), size(signature).cast("string"),
        lit(s" slots, needs bands*rowsPerBand = $needed"))))
      .otherwise(array((0 until bands).map { b =>
        aggregate(
          slice(signature, b * rowsPerBand + 1, rowsPerBand),
          lit(minHashCoeffs(b)._2),
          (acc, x) => acc * lit(0x100000001b3L) + x)
      }: _*))
  }

  /** 64-bit SimHash from PRE-HASHED tokens (`array<long>`): per bit, sum
    * +/-1 over the hash bits, take sign. Callers hash each token exactly
    * once (`transform(toks, xxhash64)`) — hashing dominates the fold, so
    * re-hashing per bit (64x) is the difference between seconds and minutes
    * on a large corpus. Lowers to the native single-pass codegen'd
    * [[graft.plans.SimHash64]] expression (registered by GraftExtensions). */
  def simHashFromHashes(hashes: Column): Column =
    call_function("graft_simhash64", hashes)

  /** Reference implementation of [[simHashFromHashes]] built purely from
    * higher-order built-ins (64 folds); kept for equivalence testing of the
    * native expression. NULL elements are SKIPPED first to match the
    * native kernel exactly (a bare when/otherwise would count each null as
    * -1 on every bit — `shiftright(null, i) === 1` is null, so the
    * otherwise branch fires — silently diverging from the production
    * hash; token-hash arrays never carry nulls in practice, but the
    * equivalence contract must hold on any input). */
  def simHashFromHashesHof(hashes: Column): Column = {
    val nn = filter(hashes, h => h.isNotNull)
    val bitCols = (0 until 64).map { i =>
      val bitSum = aggregate(
        nn,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** 64-bit SimHash over a token multiset (convenience form; for corpus-scale
    * use, materialize `transform(toks, xxhash64)` once and call
    * [[simHashFromHashes]]). */
  def simHash(toks: Column): Column =
    simHashFromHashes(transform(toks, t => xxhash64(t)))

  /** Hamming distance between two long columns (bit population of XOR). */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Rolling polynomial fingerprint over tokens: fold
    * `acc = acc * 1000003 + xxhash64(token)` (wrapping long arithmetic).
    * Order-sensitive — distinguishes permutations, unlike MinHash. */
  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc * lit(1000003L) + xxhash64(t))

  /** Language identification by stopword-hit counting: per language, count
    * tokens present in a small function-word dictionary; predict the language
    * with the most hits (ties broken alphabetically). A classic cheap n-gram/
    * dictionary heuristic — deterministic, no model artifacts. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val dicts: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "auf", "fur", "von", "im", "den"),
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "was", "for", "on", "with", "as", "at"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "no", "con", "por", "los", "las", "para"),
      "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "les", "des", "du", "en", "que", "pour", "dans", "sur"),
      "zh" -> Seq.empty) // zh scored by CJK characters, not tokens (see below)
    // greatest over (hits, priority, lang) structs: max hits wins, ties fall
    // to the higher priority = alphabetically-first language.
    val scored = dicts.zipWithIndex.map { case ((lang, words), idx) =>
      // Chinese text has no whitespace tokens, so a stopword-token dictionary
      // can never fire on real zh input; count CJK characters instead (an
      // extremely strong signal — Latin-script languages have none).
      val hits =
        if (lang == "zh") length(regexp_replace(text, "[^\\p{IsHan}]", ""))
        else {
          val sw = array(words.map(lit): _*)
          size(filter(toks, t => array_contains(sw, t)))
        }
      struct(hits.as("hits"), lit(dicts.size - idx).as("pri"), lit(lang).as("lang"))
    }
    // NULL text must yield NULL, not a confident label: with a null text
    // every hits field is null, the structs tie on the null field, and
    // greatest() would fall through to the priority tie-break — labeling
    // every null-text document "de" and skewing corpus language stats
    when(text.isNull, lit(null).cast("string"))
      .otherwise(greatest(scored: _*).getField("lang"))
  }

  /** Count of tokens matching a BPE-ish word/number/punct regex — a cheap,
    * deterministic proxy for subword token counts. */
  def approxBpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Vocab-driven subword tokenization: whitespace pre-tokenize, then
    * greedy longest-match against `vocab` within each word, single-char
    * fallback for unmatched positions; word-initial pieces carry a leading
    * space marker so `ltrim(concat(pieces))` reconstructs the normalized
    * text. Lowers to the native [[graft.plans.BpeTokens]] expression — the
    * vocab travels once per plan as a codegen reference object, never per
    * row. The model-accurate token counter behind [[Tokenizer.Bpe]]. */
  def bpeTokens(text: Column, vocab: Seq[String]): Column =
    call_function("graft_bpe_tokens", text, lit(vocab.toArray))

  /** Stopword ratio against a fixed dictionary (multiset semantics). */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    val hits = size(filter(toks, t => array_contains(sw, t))).cast("double")
    when(size(toks) === 0, lit(0.0)).otherwise(hits / size(toks).cast("double"))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^.!?,;:]", "")).cast("double")
    when(length(text) === 0, lit(0.0)).otherwise(punct / length(text).cast("double"))
  }

  /** Heuristic document quality score in [0,1]: blend of length band, mean
    * token length band, and punctuation sanity. Deterministic arithmetic over
    * ints — reproducible in any SQL engine. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val meanLen = when(nTok === 0, 0.0).otherwise(length(text).cast("double") / nTok)
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val tokScore = when(meanLen >= 3 && meanLen <= 10, 1.0).otherwise(0.5)
    val punctScore = when(punctRatio(text) <= 0.1, 1.0).otherwise(0.5)
    round((lenScore * 0.4 + tokScore * 0.4 + punctScore * 0.2), 6)
  }
}
