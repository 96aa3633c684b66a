package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — pair every point `p` with every
  * interval `[start, end]` (inclusive) that contains it, optionally
  * within equi-key groups.
  *
  * Spark's built-in answer to `p BETWEEN s AND e` with no equi-key is a
  * BroadcastNestedLoopJoin (fine only when one side is tiny) or, worse,
  * a cartesian product. This operator uses the standard bucketization
  * trick instead: quantize the value domain into width-`bucketWidth`
  * buckets, explode each interval onto the buckets it covers, tag each
  * point with its single bucket, and equi-join on (keys…, bucket) before
  * applying the exact range predicate as a post-filter.
  *
  *   - Each (interval, point) pair meets in EXACTLY one bucket — the
  *     point's — so no dedup pass is needed.
  *   - The explode factor is `len/bucketWidth + 1` rows per interval:
  *     pick `bucketWidth` ≈ the typical interval length so intervals
  *     cost ~2 rows each and a bucket holds only same-window neighbors.
  *   - The join is then a plain shuffled equi-join: both sides hash on
  *     (keys…, bucket), partial aggregation downstream stays map-side.
  *     Skew follows time-locality (a hot bucket = a burst window); widen
  *     keys or shrink bucketWidth to re-spread.
  *
  * Reference cost model: a keyless BNLJ is O(|points|·|intervals|)
  * comparisons regardless of selectivity; bucketization is
  * O(|points| + |intervals| + |output candidates|) where candidates are
  * pairs sharing a bucket — within a constant factor of output size for
  * well-chosen widths.
  */
object RangeJoin {

  /** @param points      side providing `pointCol` (LONG domain, e.g.
    *                    epoch ms); all its columns pass through
    * @param intervals   side providing `[startCol, endCol]` (LONG, both
    *                    inclusive); all its columns pass through
    * @param keys        optional equi-keys present on both sides
    * @param bucketWidth bucket size in the value domain's units
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      keys: Seq[String] = Nil, bucketWidth: Long = 600000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // SQL `div` = exact integer division (no double round-trip); the
    // quantization must be identical on both sides, including negatives
    def bucketOf(c: String) = expr(s"`$c` div ${bucketWidth}L")
    val bucket = "__range_bucket"
    val p2 = points.withColumn(bucket, bucketOf(pointCol))
    val i2 = intervals.withColumn(bucket,
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    p2.join(i2, keys :+ bucket)
      .filter(col(pointCol) >= col(startCol)
        && col(pointCol) <= col(endCol))
      .drop(bucket)
  }
}
