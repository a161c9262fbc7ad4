package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data-pipeline surface:
  * tokenization, n-grams/shingles, quality scoring, language ID,
  * fingerprinting, MinHash and SimHash signatures.
  *
  * Everything is a pure Catalyst expression (higher-order array functions
  * + xxhash64/md5) — no UDFs, so whole-stage codegen and column pruning
  * survive, and the operators scale linearly with input at 100 TB.
  */
object Text {

  /** Whitespace tokenization of trimmed text. Empty text → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** GPT-2-style pre-tokenizer ("BPE-ish"): contraction suffixes, then
    * letter / digit / other runs, each with an optional leading space —
    * the published GPT-2 pattern minus its `\s+(?!\S)` branch (RE2, and
    * therefore the DuckDB oracle, has no lookahead; inter-token
    * whitespace is consumed by the leading ` ?` and whitespace-only runs
    * are simply not tokens, which is what token COUNTING wants).
    * Unicode-aware on both engines: Java and RE2 agree on \p{L}/\p{N}.
    */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit(bpePattern), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c)).cast("long")

  /** Overlapping token windows (context-window chunking): starts at
    * 1, 1+stride, 1+2·stride, …, chosen so every token is covered and
    * the final window may run short. Pure array expressions — the
    * explode happens at the caller, so chunking composes with
    * posexplode for (doc, chunk_id) keys without any UDF.
    */
  def tokenChunks(c: Column, window: Int, stride: Int): Column = {
    val toks = tokens(c)
    transform(
      sequence(lit(1),
        greatest(size(toks) - window + stride, lit(1)), lit(stride)),
      s => array_join(slice(toks, s, lit(window)), " "))
  }

  /** Character n-grams (positions 1..len-n+1). */
  def charNgrams(c: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(c) - lit(n - 1), lit(0))),
      i => c.substr(i, lit(n)))

  /** Word shingles: k consecutive tokens joined by a single space.
    * Native single-pass expression (graft.expressions.WordShingles,
    * registered by Graft.tune) — the transform/slice/array_join builtin
    * pipeline is interpreted and measured ~ms/row.
    */
  def wordShingles(c: Column, k: Int): Column =
    call_function("word_shingles", c, lit(k))

  /** Default English-ish stopword list used by the quality/lang heuristics. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from")

  def stopwordCount(c: Column, words: Seq[String] = stopwords): Column =
    size(filter(tokens(c), t => t.isInCollection(words))).cast("long")

  /** Quality signals: length, token count, mean token length, stopword
    * ratio, punctuation ratio, uppercase ratio. Ratios are single double
    * divisions of exact longs — deterministic across engines.
    */
  def punctCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("long")

  def upperCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[A-Z]", ""))).cast("long")

  /** Composite [0,1] quality score: penalize very short docs, high
    * punctuation density and missing stopwords. Deterministic arithmetic.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c)
    val lenScore = least(nTok.cast("double") / lit(20.0), lit(1.0))
    val stopScore = least(stopwordCount(c).cast("double") * lit(4.0) /
      greatest(nTok, lit(1L)).cast("double"), lit(1.0))
    val punctPenalty = least(punctCount(c).cast("double") /
      greatest(length(c), lit(1)).cast("double") * lit(4.0), lit(1.0))
    (lenScore * lit(0.5) + stopScore * lit(0.5)) * (lit(1.0) - punctPenalty)
  }

  /** n-gram-heuristic language ID: score each language by occurrences of
    * its marker words, pick the argmax (ties → lexicographically first
    * language, deterministic). Markers are surface-level heuristics — the
    * real discriminative power comes from corpus-specific marker tables.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "que"),
    "fr" -> Seq("le", "les", "des", "est"),
    "zh" -> Seq("de", "shi", "bu", "le"))

  def langScore(c: Column, markers: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(markers))).cast("long")

  /** Predicted language = argmax over marker scores; 'und' when all zero.
    * Ties → first language in sorted key order (strictly-greater fold).
    *
    * `toks` should be a plain column reference (precompute with
    * `.withColumn`) so tokenization happens once per row. The fold runs
    * through aggregate() — a linear single pass, NOT nested when-chains
    * (those duplicate the accumulator subtree exponentially).
    */
  def langIdFromTokens(toks: Column,
      markers: Map[String, Seq[String]] = langMarkers): Column = {
    val sorted = markers.toSeq.sortBy(_._1)
    val scores = array(sorted.map { case (lang, ws) =>
      struct(size(filter(toks, t => t.isInCollection(ws))).cast("long").as("score"),
        lit(lang).as("lang"))
    }: _*)
    val init = struct(lit(-1L).as("score"), lit("und").as("lang"))
    val best = aggregate(scores, init,
      (acc, s) => when(s.getField("score") > acc.getField("score"), s).otherwise(acc))
    when(best.getField("score") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  def langId(c: Column, markers: Map[String, Seq[String]] = langMarkers): Column =
    langIdFromTokens(tokens(c), markers)

  /** Document fingerprint: md5 of case-folded, whitespace-collapsed text.
    * Stable across engines (DuckDB md5 matches) — the exact-dedup key.
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** 64-bit content hash (xxhash64) — cheap Spark-side fingerprint. */
  def fingerprint64(c: Column): Column =
    xxhash64(regexp_replace(lower(trim(c)), "\\s+", " "))

  // ---------------------------------------------------------------------
  // MinHash — k independent permutations approximated by seeded xxhash64;
  // signature = elementwise min over the shingle set. Banding for LSH is
  // done by slicing the signature (operators.Dedup).
  // ---------------------------------------------------------------------

  /** MinHash signature (array<long>, length k) over `shingles`.
    *
    * Each shingle is XXH64-hashed ONCE; the k "permutations" are k cheap
    * hashLong mixes of that value — one compiled loop per row via the
    * native `minhash_signature` expression (graft.expressions.MinHash;
    * registered by Graft.tune). The equivalent transform×transform
    * builtin pipeline measured ~9 ms/row interpreted; this is ~µs.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    call_function("minhash_signature", shingles, lit(k))

  /** Fraction of matching components between two signatures — the
    * unbiased MinHash estimate of Jaccard similarity.
    */
  def minhashEstimate(sigA: Column, sigB: Column, k: Int): Column =
    call_function("minhash_match_count", sigA, sigB).cast("double") / lit(k.toDouble)

  // ---------------------------------------------------------------------
  // SimHash — 62-bit sign-sum signature over shingle hashes. Native
  // expression (graft.expressions.SimHash64, registered by Graft.tune):
  // one compiled loop per row, and the feature hash is engine-replicable
  // integer arithmetic so the DuckDB oracle mirrors it exactly.
  // shingleSize=1 hashes plain tokens; 3 matches the MinHash feature
  // space and discriminates short same-vocabulary docs far better.
  // ---------------------------------------------------------------------

  def simhash64(c: Column, shingleSize: Int = 1): Column =
    call_function("simhash64", c, lit(shingleSize))

  /** Lane-B signature (independent hash family) — pairs with simhash64
    * to form the 124-bit near-dup signature.
    */
  def simhash64b(c: Column, shingleSize: Int = 1): Column =
    call_function("simhash64b", c, lit(shingleSize))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  // ---------------------------------------------------------------------
  // PII scrubbing — regex patterns chosen from the Java∩RE2 common
  // dialect (no backreferences, no lookaround) so the DuckDB oracle runs
  // the literally identical pattern.
  // ---------------------------------------------------------------------

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\(\\d{3}\\) \\d{3}-\\d{4}"

  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(emailPattern), lit(0))).cast("long")

  def phoneCount(c: Column): Column =
    size(regexp_extract_all(c, lit(phonePattern), lit(0))).cast("long")

  /** Replace every email and phone occurrence with typed placeholder
    * tokens — the irreversible pre-training scrub (counts above let a
    * pipeline audit what was removed).
    */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")
}
