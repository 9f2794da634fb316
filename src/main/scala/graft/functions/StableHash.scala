package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * The correctness oracle (DuckDB) must reproduce every hash we compute, so
  * we avoid engine-specific hash functions (Spark's murmur3 `hash()` and
  * DuckDB's `hash()` disagree). Instead all content hashing is derived from
  * MD5 hex, which both engines implement identically:
  *
  *   stable60(s) = first 15 hex chars of md5(s) parsed base-16 → 60-bit Long
  *
  * DuckDB equivalent: `('0x' || substr(md5(s), 1, 15))::BIGINT`.
  *
  * MinHash permutations use the classic universal-hash family
  * `h_i(x) = (a_i * x + b_i) mod p` with p = 2^31 - 1 (Mersenne prime).
  * Inputs are reduced mod p first so `a * x + b` stays within Int64
  * (a, x < 2^31 ⇒ a*x < 2^62). Same arithmetic is expressible in DuckDB
  * SQL, keeping the LSH pipeline oracle-checkable end to end.
  *
  * Reference behavior covered: the reference salts HBase row keys with
  * `String.hashCode % buckets` (`util/HBaseUtil.java:140-147`); `bucket60`
  * is our engine-portable analogue.
  */
object StableHash {
  /** 2^31 - 1; modulus of the MinHash permutation family. */
  val MersennePrime: Long = 2147483647L

  /** 60-bit stable content hash of a string column (non-negative). */
  def stable60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** stable60 reduced mod p, ready for universal-hash permutation. */
  def stableMod(c: Column): Column = stable60(c) % MersennePrime

  /** Universal hash h(x) = (a*x + b) mod p over an already-mod-p column. */
  def perm(x: Column, a: Long, b: Long): Column =
    (lit(a) * x + lit(b)) % MersennePrime

  /** Engine-portable bucket id in [0, n) — used for salting / routing. */
  def bucket60(c: Column, n: Int): Column = stable60(c) % n

  /** Fixed (a, b) parameters for `k` MinHash permutations.
    * Generated from a fixed LCG seed so both engines can hardcode them. */
  def minhashParams(k: Int): Seq[(Long, Long)] = {
    var s = 2027382749L // fixed seed
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s % (MersennePrime - 1) + 1 }
    Seq.fill(k)((next(), next() - 1))
  }

  /** Fixed integer-valued random hyperplanes for sign-bit LSH. Integer
    * components (as doubles) keep the plane literals bit-identical when
    * inlined into both Spark code and DuckDB oracle SQL. */
  def lshPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    var s = 77003917L // fixed seed
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s }
    Seq.fill(nPlanes)(Seq.fill(dim)((next() % 19 - 9).toDouble))
  }

  /** Scala-side mirror of stable60 for unit tests / driver-side checks. */
  def stable60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }
}
