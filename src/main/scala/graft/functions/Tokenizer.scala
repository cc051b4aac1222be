package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable tokenizer for the token-counting curation operators
  * ([[graft.operators.Curation.tokenBudget]], `chunk`, `packDocuments`,
  * `vocabulary`). Training budgets in real pipelines are MODEL-tokenizer
  * tokens, and whitespace counts diverge from subword counts by 1.3–2x on
  * web text — [[Tokenizer.Bpe]] closes that gap with a vocab-driven greedy
  * longest-match (public knowledge: the WordPiece/maximal-munch scheme),
  * while [[Tokenizer.Whitespace]] keeps the historical behavior and stays
  * the default everywhere.
  */
sealed trait Tokenizer extends Serializable {

  /** The token array for a (non-null) text column. */
  def tokens(text: Column): Column

  /** Token count as a long (`size` of [[tokens]]). */
  def count(text: Column): Column = size(tokens(text)).cast("long")

  /** Reconstruct text from a contiguous slice of [[tokens]] output —
    * the inverse used by `chunk` to materialize window text. */
  def detokenize(pieces: Column): Column
}

object Tokenizer {

  /** Whitespace tokenization — [[TextOps.tokens]] exactly, including its
    * historical `split("") == [""]` single-empty-token edge; detokenize
    * joins with single spaces. The default tokenizer of every operator. */
  case object Whitespace extends Tokenizer {
    override def tokens(text: Column): Column = TextOps.tokens(text)
    override def detokenize(pieces: Column): Column = concat_ws(" ", pieces)
  }

  /** Greedy longest-match subword tokenization over `vocab` (native
    * [[graft.plans.BpeTokens]] expression; the vocab ships once per plan).
    * Word-initial pieces carry a leading space marker, so detokenize is
    * marker-aware concatenation: pieces within a word join directly, words
    * join on the markers, and a chunk slice starting mid-word degrades to
    * the subword suffix — no token is ever lost or invented. */
  final case class Bpe(vocab: Seq[String]) extends Tokenizer {
    require(vocab.nonEmpty, "empty BPE vocab — use Tokenizer.Whitespace instead")
    override def tokens(text: Column): Column = TextOps.bpeTokens(text, vocab)
    override def detokenize(pieces: Column): Column = ltrim(concat_ws("", pieces))
  }

  /** Small deterministic fixture vocab for specs and the registered
    * `*_bpe` query variants (a real deployment loads its trained merge
    * table instead). Mirrored verbatim by the DuckDB oracle VALUES lists —
    * keep the two in sync. */
  val FixtureVocab: Seq[String] = Seq(
    "the", "th", "ing", "ion", "tion", "ent", "ed", "er", "re", "an",
    "or", "at", "en", "es", "st", "ar", "te", "nd", "on", "data")

  /** LEARN a BPE merge vocabulary from a corpus (the byte-pair-encoding
    * scheme of Sennrich et al. 2016 — public knowledge), sized to drive
    * [[Bpe]]:
    *
    *  1. DISTRIBUTED: the whitespace word-frequency histogram — the only
    *     corpus-sized step (one partial-agg shuffle over exploded tokens),
    *     capped at the top `maxWords` words by (frequency desc, word) so
    *     the driver-side model fit is bounded. The cap mirrors how IVF
    *     centroid training samples its rows ([[graft.operators.Ivf.train]]):
    *     the model is fit on a bounded summary, the corpus never leaves
    *     the executors, and at any scale the histogram head it keeps
    *     carries almost all the corpus token mass.
    *  2. DRIVER: the classic greedy merge loop over the histogram —
    *     repeatedly merge the most frequent adjacent symbol pair (ties
    *     broken lexicographically) until `numMerges` merges land or no
    *     pair occurs at least twice. O(numMerges x total symbols), on a
    *     histogram-sized input. Fully deterministic for a given corpus.
    *
    * Returns the merge results as vocab pieces for [[Bpe]]'s greedy
    * longest-match consumption (the standard WordPiece-style pairing of a
    * BPE-learned piece set; unmatched positions fall back to single
    * characters automatically, so the learned vocab needs no alphabet). */
  def learn(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String = "text",
      numMerges: Int = 200,
      maxWords: Int = 50000): Seq[String] = {
    val hist = docs
      .select(explode(TextOps.tokens(coalesce(col(textCol), lit("")))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = learnFromHistogram(hist, numMerges)
    // a corpus where no adjacent symbol pair repeats yields NO merges
    // (every candidate is filtered at frequency < 2) — fall back to the
    // most frequent whole words so the result still drives Bpe, whose
    // constructor rejects an empty vocab. Only a genuinely empty corpus
    // returns empty (and then Whitespace is the right tokenizer anyway).
    if (merges.nonEmpty) merges else hist.take(numMerges).map(_._1)
  }

  /** The driver-side merge loop of [[learn]], exposed for spec-level
    * verification against hand-computed merges. */
  private[graft] def learnFromHistogram(
      hist: Seq[(String, Long)], numMerges: Int): Seq[String] = {
    // words as codepoint-granular symbol arrays — the same fallback
    // granularity as the matching kernel, so surrogate pairs never split
    var words: Array[(Array[String], Long)] = hist.map { case (w, c) =>
      val syms = Seq.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + n)
        i += n
      }
      (syms.result().toArray, c)
    }.toArray
    val merges = Seq.newBuilder[String]
    var nMerges = 0
    var done = false
    while (!done && nMerges < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      // merging a pair that occurs once compresses nothing — stop there
      val candidates = counts.filter(_._2 >= 2L)
      if (candidates.isEmpty) done = true
      else {
        val ((a, b), _) = candidates.minBy { case ((x, y), n) => (-n, x, y) }
        merges += a + b
        nMerges += 1
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = Seq.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result().toArray, c)
          }
        }
      }
    }
    // two merge paths can land on the same string (("ab","c") and ("a","bc")
    // both yield "abc"); the piece SET is what Bpe consumes
    merges.result().distinct
  }
}
