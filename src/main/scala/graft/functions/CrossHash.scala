package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.DeterministicRng.M

/** Cross-engine string hashing.
  *
  * Spark's native hashes (xxhash64, murmur3) have no DuckDB counterpart, so
  * oracle-checked dedup operators need a hash computable identically in both
  * engines: take 15 hex chars of md5 (60 bits, exact in BIGINT) and, where a
  * *family* of hashes is needed (MinHash), push it through the standard
  * universal family h_i(x) = (a_i·x + b_i) mod p over the Mersenne prime
  * p = 2^31−1 (Carter–Wegman; the family MinHash's theory assumes).
  *
  * Scale note: md5 is ~3× slower than xxhash64 per call. At 100 TB swap
  * [[mdint]] for `xxhash64` (same operator shape, no oracle) — the query
  * plans are unchanged.
  */
object CrossHash {

  /** 60-bit integer hash of a string; identical to [[sqlMdint]] in DuckDB.
    * Backed by the native [[Md5Int60]] expression (codegen'd; bit-identical
    * to `conv(substring(md5(c),1,15),16,10)` which it replaced for speed).
    */
  def mdint(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(Md5Int60(Bridge.expression(c)))
  }

  def sqlMdint(x: String): String =
    s"(('0x' || substr(md5($x), 1, 15))::BIGINT)"

  /** i-th universal-family permutation constants (a_i ≠ 0, b_i). */
  def perm(i: Int): (Long, Long) = {
    var a = 1L
    (0 to i).foreach(_ => a = a * 48271L % M)
    (a, (i.toLong * 2654435761L) % M)
  }

  /** MinHash permutation of a 60-bit hash: (a_i·(h mod p) + b_i) mod p.
    * All intermediates < 2^62 — BIGINT-safe in both engines.
    */
  def minhash(h: Column, i: Int): Column = {
    val (a, b) = perm(i)
    (lit(a) * pmod(h, lit(M)) + lit(b)) % M
  }

  def sqlMinhash(h: String, i: Int): String = {
    val (a, b) = perm(i)
    s"(($a * (($h) % $M) + $b) % $M)"
  }
}
