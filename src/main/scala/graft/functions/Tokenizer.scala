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
}
