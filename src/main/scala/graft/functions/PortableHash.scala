package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-independent 60-bit hashing built on MD5.
  *
  * xxhash64 is Spark-specific; MD5 is identical everywhere. Taking the
  * first 15 hex digits of `md5(s)` as an unsigned integer yields a
  * uniform value in `[0, 2^60)` that any engine can reproduce:
  *
  *   - Spark:  `conv(substring(md5(s), 1, 15), 16, 10)` cast to long
  *   - DuckDB: `('0x' || substr(md5(s), 1, 15))::BIGINT`
  *   - JVM:    [[md5Long60]] (driver-side, e.g. for plane literals)
  *
  * The sketch operators (MinHash, SimHash, sign-random-projection LSH,
  * IVF pivot choice) come in two flavors: a fast engine-local one
  * (xxhash64) and a portable one built on these helpers whose output is
  * bit-for-bit reproducible outside Spark — the portable flavor is what
  * the DuckDB oracle queries verify.
  */
object PortableHash {

  /** Column-level 60-bit MD5 hash of a string column. */
  def mdHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: hash of `"<seed>|<value>"` — independent hash
    * functions per seed for MinHash permutations.
    */
  def mdHash60(seed: Int, c: Column): Column =
    mdHash60(concat(lit(seed.toString), lit("|"), c))

  /** Driver-side twin of [[mdHash60]] — same bytes, same value. */
  def md5Long60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString // 16 hex chars
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic pseudo-random value in [-1, 1) from a string key —
    * used for LSH hyperplane components. Matches
    * `(h % 2000001) / 1000000.0 - 1.0` computed in SQL on the 60-bit
    * hash (non-negative, so no pmod concerns).
    */
  def unitValue(key: String): Double =
    (md5Long60(key) % 2000001L) / 1000000.0 - 1.0
}
