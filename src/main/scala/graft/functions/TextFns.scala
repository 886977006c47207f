package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-function library for text analysis / dedup over document corpora
  * (the training-data-pipeline ops: SURVEY §7.1 step 7 "ext").
  *
  * Everything is pure `Column` composition (codegen'd, no UDFs), and every
  * hash is an *arithmetic* definition (polynomial rolling hash) rather than
  * an engine-builtin (xxhash64/murmur), so the DuckDB oracle can compute
  * bit-identical values. At 100 TB the same expressions run unchanged —
  * they are per-row, shuffle-free, and whole-stage-codegen friendly.
  */
object TextFns {

  /** Prime modulus for all polynomial hashes (fits comfortably in a long:
    * 31*P + 127 < 2^35, and bandHash's 19*P + B < 2^35). */
  val HashMod = 1000000007L

  /** Whitespace tokenization with empty-token removal. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** BPE-style pre-tokenizer regex (the published GPT-2 pattern minus
    * its trailing-whitespace lookahead, which RE2 — the oracle's regex
    * engine — does not support): contraction suffixes, space-prefixed
    * letter runs, digit runs, punctuation runs. The unit a byte-pair
    * vocabulary merges within; counting these matches is the standard
    * cheap pre-BPE token estimate. */
  val BpePattern: String = "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** BPE-ish pre-tokenization: array of pattern matches. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Polynomial rolling hash of a string: fold chars, acc*31 + ascii, mod P.
    * Deterministic & engine-independent (cf. Spark's xxhash64, which the
    * oracle could not reproduce). */
  def polyHash(s: Column): Column =
    aggregate(split(s, ""), lit(0L), (acc, c) => (acc * 31L + ascii(c)) % HashMod)

  /** Distinct token hashes for a document — the set MinHash/Jaccard ops
    * work over. */
  def tokenHashSet(text: Column): Column =
    array_distinct(transform(tokens(text), polyHash _))

  /** Word n-gram shingles (space-joined), distinct. Documents with fewer
    * than `n` tokens yield an empty array. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - lit(n)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k + 1))): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** Character k-gram minimum rolling hash — a winnowing-style document
    * fingerprint: min over all k-char windows of their polynomial hash.
    * Null for texts shorter than k. */
  def minGramHash(text: Column, k: Int): Column =
    when(length(text) >= k,
      array_min(transform(
        sequence(lit(1), length(text) - lit(k - 1)),
        i => polyHash(text.substr(i, lit(k))))))
      .otherwise(lit(null).cast("long"))

  /** MinHash signature of `nHashes` permutations over the distinct token
    * hashes: sig_i = min over x of (A_i * x + B_i) mod P.
    * A/B are small fixed primes — the arithmetic stays < 2^35. */
  val MinHashA: Seq[Long] = Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L)
  val MinHashB: Seq[Long] = Seq(1L, 12L, 123L, 1234L, 12345L, 123456L, 1234567L, 12345678L)

  /** Unrolled at the Scala level (an array of `nHashes` independent
    * `array_min(transform(...))` expressions) rather than a nested
    * lambda over the permutation index — flat single-level HOFs are
    * measurably faster interpreted. `tokHashSet` must be a column
    * reference (see [[tokenHashes]]). */
  def minHashSignature(tokHashSet: Column, nHashes: Int): Column =
    array((0 until nHashes).map(i =>
      array_min(transform(tokHashSet, x => (x * MinHashA(i) + MinHashB(i)) % HashMod))): _*)

  /** 32-bit SimHash over token hashes (with multiplicity): bit j of the
    * result is set iff the count of tokens with bit j set exceeds the
    * count without. Expressed as a nested higher-order function — no
    * explode, no shuffle; one pass per row.
    * SQL-string form because integer `div`/shift with a column-valued
    * shift amount has no Scala `functions` binding. */
  def simHash32(tokHashesCol: String): Column =
    expr(s"""aggregate(
      transform(sequence(0, 31), j ->
        CASE WHEN aggregate($tokHashesCol, 0L,
                    (acc, h) -> acc + CASE WHEN (h div shiftleft(1L, j)) % 2 = 1 THEN 1 ELSE -1 END) > 0
             THEN shiftleft(1L, j) ELSE 0L END),
      0L, (a, b) -> a + b)""")

  /** Hamming distance between two simhash values (popcount of xor). */
  def hamming32(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Stopword-marker count: how many tokens are in `markers`. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  // ---------------------------------------------------------------------
  // DuckDB oracle twins of the same arithmetic, as SQL-fragment builders.
  // Kept beside the Spark definitions so the two can never drift apart
  // silently — specs assert equality through the verify gate.

  /** DuckDB: polynomial rolling hash of an expression. */
  def ddbPolyHash(inner: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($inner, ''), c -> ascii(c)::BIGINT)), (a, b) -> (a*31 + b) % 1000000007)"

  /** DuckDB: whitespace tokens, empties removed. */
  def ddbTokens(inner: String): String =
    s"list_filter(string_split_regex($inner, '\\s+'), t -> t <> '')"

  /** DuckDB: BPE-ish pre-tokenizer matches ([[BpePattern]]; RE2 syntax —
    * the pattern is written to the RE2-compatible subset). */
  def ddbBpeTokens(inner: String): String = {
    val p = BpePattern.replace("'", "''")
    s"regexp_extract_all($inner, '$p')"
  }

  /** DuckDB: distinct token hashes. */
  def ddbTokenHashSet(inner: String): String =
    s"list_distinct(list_transform(${ddbTokens(inner)}, t -> ${ddbPolyHash("t")}))"

  /** Distinct hashes of the word n-gram shingles — the set the
    * MinHash/LSH dedup works over (shingle space ≫ token space, so the
    * band join stays sparse at scale).
    *
    * Computed by combining per-token hashes arithmetically
    * (((h1·K + h2) mod P)·K + h3) mod P rather than re-hashing the
    * joined shingle string — hashes each character once instead of once
    * per covering shingle (~n× less work; HOFs are interpreted, not
    * codegen'd, so constant factors matter). */
  val ShingleK = 1000003L

  /** Per-token polynomial hashes. ALWAYS materialize this as its own
    * column (`withColumn`) before feeding it to [[shingleCombine]] /
    * [[minHashSignature]]: those reference their input inside per-element
    * lambdas, and if the input is an inline expression subtree rather
    * than a column reference, interpreted HOF evaluation recomputes the
    * whole tokenize+hash pipeline once per element access (measured 45×
    * slowdown at sf0.1). A multi-use column reference also stops
    * CollapseProject from inlining it back. */
  def tokenHashes(text: Column): Column = transform(tokens(text), polyHash _)

  /** Distinct combined-hash n-gram shingles over a *column* of token
    * hashes (see [[tokenHashes]] for why it must be a column). */
  def shingleCombine(th: Column, n: Int): Column =
    array_distinct(
      when(size(th) >= n,
        transform(sequence(lit(0), size(th) - lit(n)),
          i => (0 until n).foldLeft(lit(0L)) {
            (acc, k) => (acc * ShingleK + element_at(th, i + lit(k + 1))) % HashMod
          }))
        .otherwise(array().cast("array<long>")))

  /** DuckDB: distinct combined-hash word-n-gram shingles of a token-hash
    * list expr (same arithmetic as [[shingleCombine]] / the native
    * `shingle_hashes` kernel). */
  def ddbShingleHashSetN(tokHashesInner: String, n: Int): String = {
    val h = (1 to n).foldLeft("0::BIGINT") {
      (acc, k) => s"(($acc) * $ShingleK + $tokHashesInner[i+$k]) % $HashMod"
    }
    s"list_distinct(list_transform(range(greatest(len($tokHashesInner) - ${n - 1}, 0)), i -> $h))"
  }

  /** DuckDB: distinct combined-hash word-3-gram shingles of a token-hash
    * list expr (same arithmetic as [[shingleHashSet]]). */
  def ddbShingleHashSet3(tokHashesInner: String): String = ddbShingleHashSetN(tokHashesInner, 3)
}
