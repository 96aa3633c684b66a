package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Hash-projected bag-of-words document embedding
  * ([[graft.ext.EmbedStats.hashEmbeddings]]) as ONE native expression:
  * per token, an md5 bucket and ±1 sign accumulate into a dim-long
  * counter array, which L2-normalizes into the rounded unit vector.
  *
  * Semantics are EXACTLY the higher-order-function form it replaces
  * (split → per-token (bucket, sign) structs → `aggregate` fold →
  * normalize): same single-space split with empties skipped, same two
  * md5s per token, same left-to-right double accumulation for the
  * norm, same BigDecimal HALF_UP rounding Catalyst's `round` performs
  * — pinned bit-identical in ExtSpec against the HOF reference.
  *
  * Why native: the HOF fold allocates a fresh dim-long array per token
  * (Catalyst `transform` inside `aggregate`) — measured 1.5 s of pure
  * fold overhead on the sf0.1 corpus where this loop costs
  * milliseconds. Same craft precedent as [[MinHashSignature]] /
  * [[SimHashSignature]].
  */
case class BowHashEmbed(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bow_hash_embed requires a string input, got $t")
    }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "bow_hash_embed"

  override def nullSafeEval(input: Any): Any =
    BowHashUtil.embed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BowHashUtil.embed($c, $dim)")

  override protected def withNewChildInternal(
      newChild: Expression): BowHashEmbed = copy(child = newChild)
}

object BowHashUtil {

  // One MessageDigest per thread: getInstance("MD5") per call is a
  // provider lookup + allocation, and this loop runs twice per token
  // of the whole corpus. digest() leaves the instance reset.
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val EmbPrefix = "hemb|".getBytes("UTF-8")
  private val SignPrefix = "hsign|".getBytes("UTF-8")

  /** First 4 md5 bytes of (prefix ++ buf[off, off+len)) as an unsigned
    * 32-bit value — ≡ [[graft.ext.Hashing.jvmH32]] of the concatenated
    * string, because UTF-8 concatenation is byte concatenation.
    */
  private def h32(md: java.security.MessageDigest, prefix: Array[Byte],
      buf: Array[Byte], off: Int, len: Int): Long = {
    md.update(prefix)
    md.update(buf, off, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Unit hashed-BoW vector of `text` over `dim` buckets. Tokenizes
    * the raw UTF-8 bytes on 0x20 (a space byte never occurs inside a
    * multi-byte UTF-8 sequence, so this ≡ the string split) — no
    * per-token String/substring/concat allocation in the hot loop.
    */
  def embed(text: UTF8String, dim: Int): GenericArrayData = {
    val bytes = text.getBytes
    val md = md5.get()
    val acc = new Array[Long](dim)
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        if (i > start) {
          val b = (h32(md, EmbPrefix, bytes, start, i - start) % dim).toInt
          if (h32(md, SignPrefix, bytes, start, i - start) % 2 == 0)
            acc(b) += 1L
          else acc(b) -= 1L
        }
        start = i + 1
      }
      i += 1
    }
    // left-to-right accumulation ≡ the HOF `aggregate` fold order (the
    // double sum is order-sensitive)
    var ss = 0.0
    var j = 0
    while (j < dim) {
      val x = acc(j).toDouble
      ss += x * x
      j += 1
    }
    val out = new Array[Double](dim)
    if (ss > 0.0) {
      val nrm = math.sqrt(ss)
      j = 0
      while (j < dim) {
        out(j) = java.math.BigDecimal.valueOf(acc(j).toDouble / nrm)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        j += 1
      }
    }
    new GenericArrayData(out)
  }
}
