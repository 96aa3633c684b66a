package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document MinHash signature (the first `k` rows of
  * [[graft.ext.Hashing]]'s permutation family over word-5-shingles) as
  * ONE native expression — the MinHash twin of [[SimHashSignature]].
  *
  * Semantics are EXACTLY the aggregate form it replaces (explode
  * distinct shingles → h32 → `min(permuted(i, h))` per row): the min of
  * an affine-mod permutation over the shingle set. Duplicate shingle
  * occurrences cannot change a min, so iterating ALL shingles here (a
  * seen-set only skips redundant md5 work) is bit-identical to the
  * distinct-then-aggregate form — pinned in ExtSpec.
  *
  * Why this matters at 100 TB: signatures previously required exploding
  * every shingle of every document into a row and shuffling the hashed
  * table through a 12-column min aggregate. As an expression the
  * signature is computed map-side inside whole-stage codegen with no
  * shuffle at all — the exploded shingle table is then needed only for
  * the docs that actually appear in candidate pairs (semi-join scoped in
  * [[graft.ext.Dedup.minhashNearDups]]), a vanishing fraction of the
  * corpus.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 64, s"signature length must be in [1, 64], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires a string input, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.signature(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashUtil.signature($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

object MinHashUtil {

  /** Word shingle width — [[graft.ext.TextAnalysis.ShingleK]]. */
  val ShingleK = 5

  private val MaxK = 64
  private val P = 4294967311L // Hashing.MinHashPrime
  private val As: Array[Long] =
    (0 until MaxK).map(graft.ext.Hashing.permA).toArray
  private val Bs: Array[Long] =
    (0 until MaxK).map(graft.ext.Hashing.permB).toArray

  /** First-`k` MinHash signature of `text` over word-5-shingles. */
  def signature(text: UTF8String, k: Int): GenericArrayData = {
    val grams = ShingleUtil.shingles(text, ShingleK)
    val mins = Array.fill(k)(Long.MaxValue)
    val seen = new java.util.HashSet[String]() // skip redundant md5 only
    var g = 0
    val n = grams.numElements()
    while (g < n) {
      val gram = grams.getUTF8String(g).toString
      if (seen.add(gram)) {
        val h = SimHashUtil.h32(gram)
        var i = 0
        while (i < k) {
          val v = (h * As(i) + Bs(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      g += 1
    }
    new GenericArrayData(mins)
  }
}
