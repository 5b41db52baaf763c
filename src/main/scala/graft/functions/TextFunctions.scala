package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines.
  *
  * Everything here composes codegen'd built-ins (`functions._`) — no Scala
  * UDFs in the hot path — so whole-stage codegen spans survive and the
  * expressions run identically on a 1000-executor cluster. SimHash, which
  * built-ins cannot express, is a native Catalyst expression in
  * [[SimHash]].
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (no empty tokens). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Canonical form for fingerprinting: lowercase, collapse whitespace. */
  def normalized(text: Column): Column =
    concat_ws(" ", split(trim(lower(text)), "\\s+"))

  /** Word n-gram shingles (distinct), the unit of Jaccard similarity.
    * size(tokens) < n gives an empty array (guarded: Spark's sequence()
    * would otherwise count downward for a negative span). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))

  /** MinHash signature: k independent min-hashes over the shingle set.
    * Seeded by mixing the permutation index into xxhash64 (codegen'd);
    * deterministic across runs and executors. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map(i => array_min(transform(shingleCol, s => xxhash64(lit(i), s)))): _*)

  /** LSH band keys for a minhash signature: b bands of r rows; a band key
    * collides iff the r signature slots agree. Join on a band key is the
    * scale path: candidates shuffle on the key instead of a cross join. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b => xxhash64(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))): _*)

  /** Exact 64-bit document fingerprint of normalized text. */
  def fingerprint(text: Column): Column = xxhash64(normalized(text))

  /** SimHash over tokens (custom Catalyst expression, see [[SimHash]]). */
  def simhash(toks: Column): Column = SimHash.simhash(toks)

  /** Hamming distance between two 64-bit simhashes (codegen'd built-ins). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 16-bit chunk of a 64-bit hash (for hamming-banded candidate joins:
    * hamming <= 3 implies at least one of 4 chunks is equal). */
  def hashChunk(h: Column, chunk: Int): Column =
    shiftrightunsigned(h, chunk * 16).bitwiseAND(lit(0xFFFFL))

  /** English-ish stopword list used by the quality metrics (fixed, tiny:
    * the point is the ratio computation pattern, not linguistics). */
  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for")

  def stopwordRatio(toks: Column): Column = {
    val stops = array(StopWords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))).cast("double") / size(toks)
  }

  /** Mean token length as an exact int ratio (deterministic double). */
  def meanTokenLength(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
      .cast("double") / size(toks)

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))
      .cast("double") / length(text)
}
