package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing for the dedup / similarity / text
  * operators (SURVEY.md §7 "ext").
  *
  * The driver verifies every query against DuckDB, so hash functions must
  * produce identical values in both engines. md5 is the common primitive:
  * `h32(s)` = first 8 hex digits of md5(s) parsed as an unsigned 32-bit
  * integer (fits a BIGINT in both engines).
  *
  *   Spark:  conv(substring(md5(s), 1, 8), 16, 10)::long
  *   DuckDB: CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)
  *
  * Seeded families `hSeed(i, s)` = h32(i || ':' || s) give the independent
  * hash functions MinHash / LSH need. All of this is plain Catalyst
  * expressions (codegen'd, usable inside array higher-order lambdas), no
  * UDFs — at 100 TB the hashing happens map-side inside whole-stage
  * codegen with zero serialization cost.
  */
object Hashing {

  /** Unsigned 32-bit md5-prefix hash, identical in Spark and DuckDB. */
  def h32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** DuckDB SQL fragment mirroring [[h32]]; `expr` is a SQL expression. */
  def h32Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 8)) AS BIGINT)"

  /** JVM-side twin of [[h32]] — used to precompute constants (MinHash
    * permutation coefficients, LSH hyperplanes) once on the driver; the
    * constants are embedded as literals in both the Spark plan and the
    * DuckDB oracle SQL, so no per-row md5 is paid for them. The media
    * fixture generators also call it per pixel/sample inside executor
    * threads, so the digest is thread-local (`getInstance` walks the
    * provider table per call — measured 1.1–1.3× on the 32-thread
    * media encode stages) and reset between uses.
    */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def jvmH32(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Prime just above 2^32 for the universal-hash family below. */
  val MinHashPrime = 4294967311L

  /** MinHash permutation family: h_i(x) = (a_i·x + b_i) mod p over the
    * base hash x = h32(shingle). ONE md5 per shingle; each extra
    * signature row is two integer ops — codegen-friendly and identical
    * in DuckDB. a_i < 2^20 keeps a_i·x < 2^52 (exact in BIGINT and
    * double alike).
    */
  def permA(i: Int): Long = 1L + jvmH32(s"a:$i") % 1048576L
  def permB(i: Int): Long = jvmH32(s"b:$i")

  def permuted(i: Int, h: Column): Column =
    (h * permA(i) + permB(i)) % MinHashPrime

  def permutedSql(i: Int, expr: String): String =
    s"(($expr * ${permA(i)} + ${permB(i)}) % $MinHashPrime)"
}
