package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing for the dedup/similarity operators.
  *
  * Everything here is plain integer arithmetic over code points, so the exact
  * same values are computable in any SQL engine (the DuckDB oracle included)
  * — unlike xxhash64/murmur, whose implementations differ across engines.
  * All expressions are `functions._` compositions (codegen'd, no UDFs), and
  * every intermediate stays below 2^62 so ANSI Long arithmetic never
  * overflows. Mirrored SQL generators live in graft.OracleGen.
  */
object PortableHash {

  /** 2^31 - 1 (Mersenne prime) — hash values fit in 31 bits, so products
    * with 31-bit coefficients stay under 2^62.
    */
  val P: Long = 2147483647L

  /** Base for combining token hashes into shingle hashes. */
  val B: Long = 1000003L
  val B2: Long = (B * B) % P

  /** Polynomial rolling hash over the characters of a string:
    * h = fold(h * 31 + codepoint(c)) mod `mod`. Native codegen kernel
    * (graft.functions.expressions.PolyHash); same values as the declarative
    * aggregate(split(...)) fold.
    */
  def charPolyHash(s: Column, mod: Long = P): Column =
    graft.functions.expressions.NativeExpressions.polyHash(s, mod)

  /** Per-token hash array for a text column (tokens per TextAnalysis:
    * split on \s+, empties removed) — single-pass native kernel.
    */
  def tokenHashes(text: Column, mod: Long = P): Column =
    graft.functions.expressions.NativeExpressions.tokenPolyHashes(text, mod)

  /** Word n-gram shingle hashes from a token-hash array: combine n
    * consecutive token hashes by a Horner fold h = (h*B + th_j) mod P (no
    * string concatenation — the shingle never materializes; intermediates
    * stay < 2^52). Native codegen kernel — Spark's transform/sequence
    * higher-order form is CodegenFallback and re-reads each token n times;
    * the kernel emits the identical values in one pass. Empty array when
    * size(th) < n.
    */
  def shingleHashes(th: Column, n: Int): Column =
    graft.functions.expressions.NativeExpressions.shingleHashesAll(th, n, B, P)

  /** Deterministic affine-permutation coefficients (a_i, b_i) for MinHash,
    * derived from a splitmix-style LCG over the permutation index — plain
    * Long constants, identical in the oracle SQL.
    */
  def minHashCoefs(k: Int): Seq[(Long, Long)] = (0 until k).map { i =>
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = java.lang.Math.floorMod(mix(2L * i), P - 1) + 1 // 1..P-1
    val b = java.lang.Math.floorMod(mix(2L * i + 1), P)     // 0..P-1
    (a, b)
  }

  /** Fold a fixed-width slice of columns into one bucket value:
    * h = fold(h * B + v) mod P.
    */
  def foldBucket(vs: Seq[Column]): Column =
    vs.foldLeft(lit(0L): Column)((h, v) => (h * lit(B) + v) % lit(P))

  /** Pseudo-random sign (+1/-1 as boolean "is positive") for LSH hyperplane
    * component (plane p, dimension d): two LCG rounds, middle bit decides.
    * y = ((p*2654435761 + d) % P) * 1103515245 + 12345) % 2^31; bit 15.
    */
  def planeSignPositive(p: Int, d: Column): Column = {
    val x = pmod(lit(p.toLong * 2654435761L) + d, lit(P))
    val y = pmod(x * lit(1103515245L) + lit(12345L), lit(2147483648L))
    (call_function("shiftright", y, lit(15)).bitwiseAND(lit(1L)) === 0L)
  }
}
