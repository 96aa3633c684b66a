package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed fingerprint selections (Schleimer–Wilkerson–Aiken 2003) of a
  * document as ONE native expression: word-k-shingles → 32-bit gram
  * hashes → per-window rightmost-minimum over every window of `w`
  * consecutive hashes → distinct `pos * 2^32 + hash` encodings.
  *
  * Semantics are EXACTLY the array-expression form it replaces
  * (`graft.ext.Winnow.selectionsFromHashes` over a materialized
  * `transform(word_shingles(text), h32)` array — pinned equivalent in
  * ExtSpec), but the window pass runs as a single codegen'd static call
  * with an O(n) monotonic-deque sliding minimum instead of an
  * interpreted O(n·w) higher-order lambda re-slicing the array per
  * window. At 100 TB the fingerprint extraction is the dominant
  * map-side cost of containment detection; this keeps it inside
  * whole-stage codegen at scan speed, like [[MinHashSignature]] for
  * MinHash and [[SimHashSignature]] for SimHash.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle width must be >= 1, got $k")
  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"winnow_select requires a string input, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any =
    WinnowUtil.selections(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowUtil.selections($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowSelect = copy(child = newChild)
}

object WinnowUtil {

  /** `pos * 2^32 + hash` encoding base — [[graft.ext.Winnow.PosShift]]. */
  private val PosShift = 4294967296L

  /** Distinct encoded winnow selections of `text`, first-appearance
    * order. Window starts are 1-based and run `1 .. max(n-w+1, 1)`; the
    * final (or only) window clamps to the array end, so documents with
    * fewer than `w` gram hashes yield exactly one selection — matching
    * `slice`'s clamping in the expression twin. Rightmost minimum per
    * window via a monotonic deque: ties evict on push (`>=`), so the
    * deque front is always the newest minimal index.
    */
  def selections(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val grams = ShingleUtil.shingles(text, k)
    val n = grams.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = SimHashUtil.h32(grams.getUTF8String(i).toString)
      i += 1
    }
    val sel = new java.util.LinkedHashSet[java.lang.Long]()
    if (n <= w) {
      // one clamped window over the whole array: rightmost minimum
      var best = Long.MaxValue
      var pos = 0
      var j = 0
      while (j < n) {
        if (hs(j) <= best) { best = hs(j); pos = j + 1 }
        j += 1
      }
      if (n > 0) sel.add(pos.toLong * PosShift + best)
    } else {
      val dq = new Array[Int](n) // index deque, values increase front→back
      var head = 0
      var tail = 0 // live range [head, tail)
      var j = 0
      while (j < n) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j
        tail += 1
        val start = j - w + 1 // 0-based start of the window ending at j
        if (start >= 0) {
          while (dq(head) < start) head += 1
          val m = dq(head)
          sel.add((m + 1).toLong * PosShift + hs(m))
        }
        j += 1
      }
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
