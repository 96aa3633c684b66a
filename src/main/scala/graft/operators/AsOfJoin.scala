package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single right row with
  * the greatest `rightTs <= leftTs` within the same key group (SQL
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`).
  *
  * Spark has no native as-of join, and the naive formulations both fail
  * at scale: an inequality theta-join degenerates to a per-key cross
  * product before the `max` filter, and a windowed subquery per left row
  * re-sorts the right side once per probe. This operator is the
  * union-tag formulation instead:
  *
  *   1. tag both sides and union them (right rows carry a payload
  *      struct, left rows a null payload);
  *   2. one window pass partitioned by key, ordered by (ts, side), with
  *      `last(payload, ignoreNulls)` over rows-unbounded-preceding —
  *      each left row picks up the latest right payload at or before its
  *      timestamp (right sorts before left on ties, giving `>=`);
  *   3. keep the left rows and unpack the struct.
  *
  * Cost: ONE shuffle of both sides on the join key and a sort within
  * partitions — the same price as the sort-merge equi-join Spark would
  * run for `l.k = r.k` alone, with no candidate blow-up in between.
  * Skew follows key cardinality (a hot key serializes its own window),
  * the same boundary every keyed operator here has; salting does not
  * apply because the window is order-dependent, so a hot-key corpus
  * should pre-split by time range instead.
  *
  * An optional `tolerance` turns matches older than
  * `leftTs - tolerance` into nulls (match-found-but-too-old), applied
  * AFTER the window so the plan shape is unchanged.
  */
object AsOfJoin {

  /** @param left     probe side; all its columns pass through
    * @param right    reference side
    * @param keys     equi-join key columns (present on both sides)
    * @param leftTs   ordering column on `left`
    * @param rightTs  ordering column on `right`
    * @param payload  right columns to attach, each aliased
    *                 `asof_<name>` in the output (null when no match)
    * @param tolerance max lookback as a Column interval/duration
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key")
    val ts = "__asof_ts"
    val side = "__asof_side"
    val pay = "__asof_payload"
    // the payload struct always carries the right timestamp: the
    // tolerance check and gap computations need it even when the caller
    // doesn't ask for it
    val payCols = (rightTs +: payload.filterNot(_ == rightTs))
      .map(c => col(c).as(c))
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as(ts), lit(0).as(side),
        struct(payCols: _*).as(pay)): _*)
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as(ts), lit(1).as(side),
        lit(null).cast(r2.schema(pay).dataType).as(pay)) ++
        left.columns.filterNot(keys.contains).map(col): _*)
    val combined = l2.unionByName(r2, allowMissingColumns = true)
    // third sort key: when several RIGHT rows tie on (key, ts), pick by
    // payload-content hash — arbitrary but DETERMINISTIC across runs and
    // partition layouts (SQL ASOF leaves the tie pick unspecified; an
    // order-dependent pick here would flake on reruns). Left rows carry
    // a null payload, so the extra key never reorders them.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(side), xxhash64(col(pay)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col(pay), ignoreNulls = true).over(w)
    val matched = tolerance.fold(matchedRaw)(tol =>
      when(matchedRaw(rightTs) >= col(ts) - tol, matchedRaw))
    combined.withColumn(pay, matched)
      .filter(col(side) === 1)
      .select(
        left.columns.toIndexedSeq.map(col) ++
          payload.map(c => col(pay)(c).as(s"asof_$c")): _*)
  }

  /** Forward as-of join — the single right row with the SMALLEST
    * `rightTs >= leftTs` per key (SQL `ASOF ... ON l.ts <= r.ts`).
    * Implemented by running [[backward]] over negated timestamps: time
    * reversal turns "greatest at-or-before" into "smallest at-or-after",
    * so the two directions share one implementation and one cost model.
    * Timestamp columns must be numeric (negate-able); the attached
    * payload carries the ORIGINAL right values.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val neg = "__asof_neg_ts"
    val l2 = left.withColumn(neg, -col(leftTs))
    val r2 = right.withColumn(neg, -col(rightTs))
    backward(l2, r2, keys, neg, neg,
        (payload :+ rightTs).distinct, tolerance)
      .drop(neg, s"asof_$neg")
      .drop((if (payload.contains(rightTs)) Seq.empty[String]
        else Seq(s"asof_$rightTs")): _*)
  }
}
