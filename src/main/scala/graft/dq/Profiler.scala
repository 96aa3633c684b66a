package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level table profiling — the `SUMMARIZE` / `ANALYZE`-style
  * utility next to the expectation suite ([[DqSuite]]): per column,
  * null count, distinct count, and min/max, computed in ONE pass so
  * profiling a 100 TB table costs one scan, not one scan per column.
  *
  * Two forms:
  *   - [[profile]]: EXACT distinct counts — cross-engine verifiable
  *     cell-by-cell (the `doc_profile` query). Spark plans the
  *     multi-column distinct as a single Expand + aggregate: one
  *     shuffle whose volume is rows × profiled-columns — fine for
  *     fixture-scale verification, deliberate overkill at 100 TB;
  *   - [[profileApprox]]: the scale path — HLL++ distinct estimates
  *     keep the whole profile map-side-combinable (no Expand, no
  *     per-column distinct shuffle). Same output shape; spec-pinned
  *     to the exact form within HLL error instead of oracle-compared.
  *
  * min/max are cast to string so heterogeneous columns share one
  * schema; both engines compare strings bytewise, so the values (and
  * the oracle hash) agree.
  */
object Profiler {

  private def stacked(one: DataFrame, cols: Seq[String]): DataFrame = {
    val stackExpr = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ") +
      ") AS (column_name, n_notnull, n_distinct, min_value, max_value)"
    one.selectExpr("n_rows", stackExpr)
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_notnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Exact one-pass profile of `cols` (default: every column). */
  def profile(df: DataFrame, colNames: Seq[String] = Nil): DataFrame = {
    val cols = if (colNames.nonEmpty) colNames else df.columns.toSeq
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c"))
    }
    val all = count(lit(1)).as("n_rows") +: aggs
    stacked(df.agg(all.head, all.tail: _*), cols)
  }

  /** Scale twin: HLL++ distinct estimates, fully map-side-combinable. */
  def profileApprox(df: DataFrame, colNames: Seq[String] = Nil,
      rsd: Double = 0.05): DataFrame = {
    val cols = if (colNames.nonEmpty) colNames else df.columns.toSeq
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"nn_$c"),
      approx_count_distinct(col(c), rsd).as(s"nd_$c"),
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c"))
    }
    val all = count(lit(1)).as("n_rows") +: aggs
    stacked(df.agg(all.head, all.tail: _*), cols)
  }

  /** DuckDB mirror of [[profile]] over table `table`. */
  def profileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
}
