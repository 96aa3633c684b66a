package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout control for scan pruning — the storage-side lever at
  * 100 TB: parquet (and every modern reader) skips row groups / files
  * whose column min/max stats exclude the predicate, but skipping only
  * bites when the writer CLUSTERED the data so each file covers a narrow
  * value range. Sorting clusters one column perfectly and leaves every
  * other column's per-file range at ~100 % of the domain; Z-ORDERING
  * interleaves the bits of several columns so each file covers a small
  * hyper-rectangle of the combined space — multi-column predicates prune
  * on all of them.
  *
  * The operator is pure plan composition: quantize each column to a
  * fixed-point rank against its (cheaply aggregated) min/max, interleave
  * bits with shift/or expressions (codegen'd — no UDF), then
  * `repartitionByRange` + `sortWithinPartitions` on the Z value so the
  * writer emits range-disjoint files. LayoutSpec measures the effect:
  * per-file normalized range widths shrink from ~1.0 (random layout) to
  * ~1/√files on BOTH dimensions.
  */
object Layout {

  /** Bits per dimension in the Z value (two dims × 16 = 32-bit Z). */
  val BitsPerDim = 16

  /** Fixed-point quantization of `c` onto [0, 2^bits) against literal
    * bounds (from a one-row min/max aggregate of the input).
    */
  private def quantize(c: Column, lo: Double, hi: Double,
      bits: Int): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(span) * lit(1L << bits))
        .cast("long")))
  }

  /** The interleaved Z value for `cols` (bit b of dim d lands at
    * position b·|dims| + d) — straight shift/mask arithmetic, fully
    * inside whole-stage codegen.
    */
  def zValue(cols: Seq[Column], bounds: Seq[(Double, Double)],
      bits: Int = BitsPerDim): Column = {
    val n = cols.size
    require(n * bits <= 63,
      s"Z value must fit a signed 64-bit long: $n dims x $bits bits; " +
        "lower bits (e.g. 4 dims need bits <= 15)")
    val quantized = cols.zip(bounds).map { case (c, (lo, hi)) =>
      quantize(c, lo, hi, bits)
    }
    (for {
      b <- 0 until bits
      (q, d) <- quantized.zipWithIndex
    } yield shiftleft(shiftright(q, b).bitwiseAND(1), b * n + d)
    ).reduce(_.bitwiseOR(_))
  }

  /** Z-order `df` by `colNames` into `numFiles` range-disjoint files at
    * `path`. One tiny min/max aggregate (a single collected row) sets
    * the quantization bounds; the repartitionByRange sampling pass and
    * the write are the only corpus-scale work — same cost shape as a
    * plain sorted write.
    */
  def writeZOrdered(df: DataFrame, path: String, colNames: Seq[String],
      numFiles: Int): Unit = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    if (row.anyNull) {
      // empty input (or an all-null Z column): no bounds to quantize
      // against — write the frame as-is rather than NPE on the stats row
      df.write.mode("overwrite").parquet(path)
      return
    }
    val bounds = colNames.indices.map(i =>
      (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
    df.withColumn("__z", zValue(colNames.map(col), bounds))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** The Z-order round-trip behind the verified `zorder_box_read` query:
    * write `df` Z-ordered on two integral columns, read the files back,
    * and return the rows inside a 2-D box derived from each key's max
    * (x ∈ [max/5, 3·max/10], y ∈ [max/10, max/4] — ~1.5 % of rows at any
    * scale; integer division matches the oracle's `//`). Correctness of
    * the round-trip is the oracle's claim; the PRUNING payoff — the box
    * touches few of the range-disjoint files — is pinned in LayoutSpec
    * over the same written path.
    */
  def zOrderedBoxRead(df: DataFrame, path: String,
      xCol: String, yCol: String, numFiles: Int): DataFrame = {
    writeZOrdered(df, path, Seq(xCol, yCol), numFiles)
    boxReadFromLayout(df, path, xCol, yCol)
  }

  /** The read leg of [[zOrderedBoxRead]] alone, for serving a layout
    * already written (`df` supplies only the box bounds — one 1-row
    * max aggregate; all row data comes from the Z-ordered files).
    */
  def boxReadFromLayout(df: DataFrame, path: String,
      xCol: String, yCol: String): DataFrame = {
    val mx = df.agg(max(col(xCol)), max(col(yCol))).head()
    if (mx.anyNull) return df.filter(lit(false))
    val (xm, ym) = (mx.getLong(0), mx.getLong(1))
    df.sparkSession.read.parquet(path)
      .filter(col(xCol).between(xm / 5, xm * 3 / 10)
        && col(yCol).between(ym / 10, ym / 4))
  }
}
