package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared deterministic hashing primitives for the LLM-pipeline operators
  * (dedup, MinHash/LSH, SimHash, ANN bucketing).
  *
  * Design constraint: every hash must be computable IDENTICALLY by the
  * engine (Spark Column expressions) and by the DuckDB correctness
  * oracle (ANSI-ish SQL). Engine-native hash functions (Spark's
  * murmur3 `hash`, DuckDB's `hash`) differ across engines, so all
  * content hashing is derived from md5 — available and bit-identical in
  * both — mapped to a 60-bit integer via a 15-hex-digit prefix
  * (fits a signed 64-bit integer; Spark `conv(_,16,10)`, DuckDB
  * `CAST('0x'||… AS BIGINT)`).
  *
  * The MinHash permutation and hyperplane constants are derived once on
  * the driver from md5 of fixed seeds and inlined as literals into both
  * the Spark expressions and the generated oracle SQL — no per-row
  * cross-engine hashing of the constants themselves, and no RNG (runs
  * are reproducible by construction).
  */
object TextHash {

  /** Large prime modulus for MinHash permutations: 2^31 - 1. Keeps
    * `a * x + b` under 2^62 — no 64-bit overflow on either engine.
    */
  val P: Long = 2147483647L

  /** Driver-side md5-prefix → 60-bit long (same mapping the Column
    * version applies per row); used to derive deterministic constants.
    */
  def seedLong(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** MinHash permutation constants h_i(x) = (a_i * x + b_i) mod P,
    * a_i ∈ [1, P-1], b_i ∈ [0, P-1].
    */
  def minhashPerms(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map(i =>
      (seedLong(s"mh_a_$i") % (P - 1) + 1, seedLong(s"mh_b_$i") % P))

  /** Deterministic ±1 random-hyperplane matrix for sign-LSH over
    * embeddings: bits × dims entries from md5 parity.
    */
  def hyperplanes(bits: Int, dims: Int): Seq[Seq[Double]] =
    (0 until bits).map(j => (0 until dims).map(d =>
      if (seedLong(s"hp_${j}_$d") % 2 == 0) 1.0 else -1.0))

  // ---- Column-side primitives (one expression each, codegen-friendly) --

  /** md5 hex of a string column (Spark md5 takes binary; a string→binary
    * cast is the UTF-8 bytes, matching DuckDB's md5(text)).
    */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /** String → 60-bit content hash: first 15 hex digits of md5 as a long.
    * DuckDB twin: CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT).
    */
  def hash60(c: Column): Column =
    conv(substring(md5Hex(c), 1, 15), 16, 10).cast("long")

  /** Whitespace-tokenize trimmed text. DuckDB twin:
    * regexp_split_to_array(trim(text), '\s+').
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-gram shingles of a token array (space-joined).
    * Empty when the document has fewer than n tokens. DuckDB twin:
    * list_distinct(list_transform(range(1, len(t)-n+2),
    *   i -> t[i] || ' ' || … )).
    *
    * Native expression (graft.plans.ShinglesExpr): one pass with
    * first-occurrence dedup. The previous zip_with-chain composition —
    * itself a round-5 fix for the O(n·shingles)-regex-splits
    * index-lambda shape — still ran n−1 interpreted lambda passes and
    * materialized n−1 intermediate arrays per document; parity-tested
    * bit-for-bit against it in ShinglesExprSpec.
    */
  def shingles(toks: Column, n: Int): Column =
    graft.plans.ShinglesExpr.shingles(toks, n)

  /** Rolling polynomial fingerprint of a string: left fold over the
    * CODE POINTS, acc = (acc * 31 + cp) mod 1e9+7 — a native Catalyst
    * expression (graft.plans.RollingHashExpr) that inlines the fold
    * into whole-stage codegen with zero per-character allocation. The
    * DuckDB twin is list_reduce over per-position ord(); code points
    * match ord() for ALL of Unicode (the earlier split-per-character
    * composition folded UTF-16 surrogate halves and was BMP-only).
    */
  val FpMod: Long = 1000000007L
  def rollingFingerprint(c: Column): Column =
    graft.plans.RollingHashExpr.rollingHash(c, 31L, FpMod)
}
