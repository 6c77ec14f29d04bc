package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Spark's `xxhash64`/`hash` and DuckDB's `hash` are different algorithms,
  * so every hash the DuckDB oracle must reproduce is built from `md5`
  * (identical bytes in any engine) reduced to a 56-bit integer:
  * Spark `conv(substr(md5(x),1,14),16,10)`, DuckDB
  * `CAST('0x'||substr(md5(x),1,14) AS BIGINT)`.
  *
  * MinHash permutations are `(a*h + b) mod P` with P = 2^31-1; `h < P` and
  * `a < 2^21` keep every intermediate below 2^52 — no overflow in either
  * engine (both run integer-overflow-checked: Spark ANSI, DuckDB always).
  */
object CrossHash {
  /** Mersenne prime 2^31-1: the permutation modulus. */
  val P = 2147483647L

  /** 16 fixed (a, b) MinHash permutation constants (LCG-spread, odd a). */
  val Perms: Seq[(Long, Long)] = (0 until 16).map { j =>
    (1000003L + 2 * 9176L * j + 1, (22695477L * (j + 1) + 1329) % P)
  }

  /** 56-bit md5-derived hash of a string column. Codegen'd digest-byte
    * implementation ([[graft.functions.Md5Long56]]); numerically identical
    * to `conv(substr(md5(x),1,14),16,10)` (pinned by `CrossHashSpec`). */
  def md5Long(c: Column): Column =
    VectorExprs.md5long56(c.cast("string"))

  /** DuckDB rendering of [[md5Long]] applied to SQL fragment `e`. */
  def md5LongSql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 14)) AS BIGINT)"

  /** [[md5Long]] reduced below P — the MinHash input domain. */
  def shingleHash(c: Column): Column = md5Long(c) % P
  def shingleHashSql(e: String): String = s"(${md5LongSql(e)} % $P)"

  /** j-th MinHash permutation of an already-reduced hash column. */
  def perm(j: Int, h: Column): Column = {
    val (a, b) = Perms(j)
    (h * a + b) % P
  }
  def permSql(j: Int, e: String): String = {
    val (a, b) = Perms(j)
    s"(($e * $a + $b) % $P)"
  }

  /** Deterministic pseudo-random in [-1, 1): used for LSH hyperplanes.
    * Computed host-side (java.security MD5 == md5() in both engines) so the
    * plane components are embedded as plain literals in Spark and SQL. */
  def unitNoise(seed: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 14), 16)
    (v % 2001L - 1000L) / 1000.0
  }

  /** `nPlanes` random hyperplanes of dimension `dim` for sign-LSH. */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((p, d) => unitNoise(s"hp${p}_$d"))
}
