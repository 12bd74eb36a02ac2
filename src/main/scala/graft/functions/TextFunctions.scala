package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar text-preparation primitives shared by the dedup / text-analysis
  * operators. Everything here is built-in Catalyst expressions (split /
  * higher-order functions / hash functions) — no UDFs — so the whole prep
  * chain stays inside whole-stage codegen and scales linearly with no
  * shuffle. Formulas are deliberately mirror-able in DuckDB SQL so every
  * consumer query can be oracle-checked.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  /** Distinct word trigrams ("a b c") of a token array — the shingle set for
    * Jaccard similarity. Empty when the doc has fewer than 3 tokens.
    */
  def trigrams(toks: Column): Column =
    when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
            element_at(toks, i + 3)))))

  /** Exact Jaccard similarity of two (already-distinct) shingle arrays, as
    * an integer-ratio double: identical across engines bit-for-bit because
    * both sides divide the same two ints.
    */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))

  /** MinHash signature of a shingle set: k independent hash slots, slot i =
    * min over shingles of xxhash64(shingle # i). One column expression —
    * k×|shingles| hashes, all codegen'd, no shuffle.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(concat(s, lit("#"), i.cast("string"))))))

  /** LSH band hashes of a minhash signature: `bands` buckets of `rowsPerBand`
    * consecutive slots, each band summarized by one 64-bit hash. Two docs
    * are near-dup candidates iff they collide on ANY (band_idx, band_hash).
    */
  def bandHashes(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",",
        slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** 60-bit SimHash of a token multiset (15 hex chars of headroom under a
    * signed long). Per token, xxhash64 supplies the bit pattern; each bit
    * position accumulates +1/−1 and the sign becomes the output bit.
    */
  def simhash60(toks: Column): Column = {
    // shiftright/shiftleft by a *column* amount only exist as SQL functions.
    def shr(v: Column, n: Column) = call_function("shiftright", v, n)
    def shl(v: Column, n: Column) = call_function("shiftleft", v, n)
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 60),
      (acc, w) => zip_with(acc, sequence(lit(0), lit(59)),
        (c, i) => c + when(shr(xxhash64(w), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(59)),
        (c, i) => when(c >= 0, shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)
  }

  /** Hamming distance between two simhash longs. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

  /** Blocked simhash keys: split the 60-bit hash into `blocks` equal chunks.
    * By pigeonhole, two hashes within hamming distance `blocks - 1` share at
    * least one identical block — so block-equality bucketing finds all pairs
    * up to that radius without any pairwise scan.
    */
  def simhashBlocks(sim: Column, blocks: Int): Column = {
    val width = 60 / blocks
    val mask = (1L << width) - 1
    transform(sequence(lit(0), lit(blocks - 1)),
      b => call_function("shiftright", sim, b * width).bitwiseAND(mask))
  }
}
