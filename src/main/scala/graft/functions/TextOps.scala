package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization, shingling and portable hashing for the text/dedup operators.
  *
  * The hashing trick: every "hash function" is the first 16 hex chars of
  * md5 over a seed-prefixed string. Both Spark and DuckDB produce identical
  * lowercase hex md5, and fixed-width hex compares lexicographically exactly
  * like the underlying 64-bit value — so MIN(hashHex(...)) is a portable
  * minhash with zero cross-engine numeric conversion risk.
  */
object TextOps {

  /** Non-empty whitespace tokens. */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= lit(""))

  /** Space-joined n-gram shingles over a token array; empty array when the
    * document has fewer than n tokens (guards Spark's descending
    * `sequence(1, 0)` edge).
    */
  def shingles(ws: Column, n: Int): Column = {
    val sh = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*))
    when(size(ws) >= n, sh).otherwise(array().cast("array<string>"))
  }

  /** Native tokenize+shingle+distinct in one pass (graft.plans.WordNGrams)
    * — same values as `array_distinct(shingles(words(text), n))`, ~4x
    * faster (the HOF chain evaluates interpreted).
    */
  def distinctWordNGrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.plans.WordNGrams(Bridge.expression(text), n, distinct = true))
  }

  /** Native tokenizer (graft.plans.WordNGrams n=1): same values as
    * `words(text)` but a compiled single pass instead of the interpreted
    * split+filter HOF chain.
    */
  def wordsNative(text: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.plans.WordNGrams(Bridge.expression(text), 1, distinct = false))
  }

  /** Native tokenize+shingle keeping duplicates (n-gram occurrences, not
    * the distinct set) — for frequency-weighted pipelines (bigram LM).
    */
  def wordNGramsAll(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.plans.WordNGrams(Bridge.expression(text), n, distinct = false))
  }

  /** Native adjacent-character-pair scan (graft.plans.CharPairs): same
    * values as `transform(sequence(1, length(text)-1), i ->
    * substring(text, i, 2))` filtered of pairs containing ' ', in one
    * compiled pass — the BPE census primitive.
    */
  def charPairs(text: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.plans.CharPairs(Bridge.expression(text)))
  }

  /** One-pass native token statistics: struct(n_tokens, stop_hits,
    * char_sum) — see graft.plans.TokenStats. Bit-parity with
    * `size(words(text))` / stopword filter counts / summed `length(w)`.
    */
  def tokenStats(text: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.plans.TokenStats(Bridge.expression(text)))
  }

  /** Quality-score building blocks shared by q_quality_score,
    * q_clean_pipeline and q_corpus_pipeline (single source for the
    * 0.4/0.3/0.3 blend — the three queries and their DuckDB oracles must
    * never diverge). Returns (nTokens, avgTokenLen, stopwordRatio, score)
    * computed from one native TokenStats pass.
    */
  def qualityScore(text: Column): (Column, Column, Column, Column) = {
    import org.apache.spark.sql.functions.{least, lit, when}
    val st = tokenStats(text)
    val nTok = st.getField("n_tokens").cast("double")
    val avgLen = when(st.getField("n_tokens") === 0, lit(0.0))
      .otherwise(st.getField("char_sum").cast("double") / nTok)
    val ratio = when(st.getField("n_tokens") === 0, lit(0.0))
      .otherwise(st.getField("stop_hits").cast("double") / nTok)
    val score = least(nTok / 100.0, lit(1.0)) * 0.4 +
      ratio * 0.3 + least(avgLen / 8.0, lit(1.0)) * 0.3
    (st.getField("n_tokens"), avgLen, ratio, score)
  }

  /** Seeded portable hash: first 16 lowercase hex chars of md5(seed ':' s). */
  def hashHex(seed: Column, s: Column): Column =
    substring(md5(concat(seed.cast("string"), lit(":"), s)), 1, 16)

  /** Unseeded variant. */
  def hashHex(s: Column): Column = substring(md5(s), 1, 16)

  /** Shared English stopword list (used by lang-id and quality scoring).
    * Must stay in sync with the IN-lists inside the DuckDB oracles.
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Fraction of tokens that are stopwords (0.0 for empty docs). */
  def stopwordRatio(ws: Column): Column = {
    val hits = size(filter(ws, w => w.isInCollection(stopwords)))
    when(size(ws) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(ws).cast("double"))
  }
}
