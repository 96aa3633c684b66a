package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

/** Measures that Z-ordering actually clusters: after writing N
  * range-disjoint files, the average per-file normalized min/max width
  * must shrink on BOTH dimensions (a plain single-column sort clusters
  * one dimension and leaves the other at ~full width; a random layout
  * leaves both at ~full width).
  */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  private def avgWidths(path: String, cols: Seq[String],
      spans: Seq[Double]): Seq[Double] = {
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(
        (min(col(cols.head)).cast("double")).as("lo0"),
        (max(col(cols.head)).cast("double")).as("hi0"),
        (min(col(cols(1))).cast("double")).as("lo1"),
        (max(col(cols(1))).cast("double")).as("hi1"))
      .collect()
    Seq(
      perFile.map(r => (r.getDouble(2) - r.getDouble(1)) / spans.head)
        .sum / perFile.length,
      perFile.map(r => (r.getDouble(4) - r.getDouble(3)) / spans(1))
        .sum / perFile.length)
  }

  test("z-ordered files cover narrow ranges on both dimensions") {
    // two independent uniform dims — the worst case for single-sort
    val n = 100000L
    val df = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(10000)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(10000)).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val files = 16
    Layout.writeZOrdered(df, s"$dir/z", Seq("x", "y"), files)
    // baseline: same data, same file count, sorted on x only
    df.repartitionByRange(files, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/sorted_x")
    val zw = avgWidths(s"$dir/z", Seq("x", "y"), Seq(9999.0, 9999.0))
    val sw = avgWidths(s"$dir/sorted_x", Seq("x", "y"),
      Seq(9999.0, 9999.0))
    // single-column sort: x clustered, y at ~full width
    assert(sw.head < 0.2, s"sorted-x x-width ${sw.head}")
    assert(sw(1) > 0.8, s"sorted-x y-width ${sw(1)}")
    // z-order: BOTH dims well under half the domain per file — with 16
    // files a perfect 4×4 Z grid gives 0.25; allow build slack
    assert(zw.head < 0.45, s"z x-width ${zw.head}")
    assert(zw(1) < 0.45, s"z y-width ${zw(1)}")
    // a 2-d point predicate therefore prunes to ~1 file by stats alone:
    // count files whose [min,max]² box contains the probe point
    val probe = (1234.0, 5678.0)
    val touching = spark.read.parquet(s"$dir/z")
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("lox"), max("x").as("hix"),
        min("y").as("loy"), max("y").as("hiy"))
      .filter(col("lox") <= probe._1 && col("hix") >= probe._1
        && col("loy") <= probe._2 && col("hiy") >= probe._2)
      .count()
    assert(touching <= files / 4, s"$touching of $files files touch probe")
  }

  test("verified zorder_box_read query prunes most files by stats") {
    // drive the exact shipping query (it writes /tmp/graft_zorder_<sf>),
    // then audit the written files' min/max boxes against its box
    val sf = SparkTestSession.Sf0001
    val rows = SparkEntry.queries("zorder_box_read")(spark, sf).collect()
    assert(rows.nonEmpty, "box predicate must select rows at sf0.001")
    val li = Tables(spark, sf).lineitem
    val mx = li.agg(max("l_orderkey"), max("l_partkey")).head()
    val (xm, ym) = (mx.getLong(0), mx.getLong(1))
    val path = s"/tmp/graft_zorder_${SparkEntry.fixtureKey(sf)}"
    val boxes = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lox"), max("l_orderkey").as("hix"),
        min("l_partkey").as("loy"), max("l_partkey").as("hiy"))
      .collect()
    val touching = boxes.count(r =>
      r.getLong(1) <= xm * 3 / 10 && r.getLong(2) >= xm / 5
        && r.getLong(3) <= ym / 4 && r.getLong(4) >= ym / 10)
    info(s"zorder_box_read: ${rows.length} rows; " +
      s"$touching of ${boxes.length} files touch the box by stats")
    assert(boxes.length >= 8, "expected a multi-file Z layout")
    assert(touching <= boxes.length / 2,
      s"Z layout should let stats prune most files: $touching/${boxes.length}")
  }

  test("z-order guards: empty input writes cleanly; >63 Z bits rejected") {
    val dir = java.nio.file.Files.createTempDirectory("zguard").toString
    val empty = spark.range(0).select(col("id").as("x"), col("id").as("y"))
    Layout.writeZOrdered(empty, s"$dir/empty", Seq("x", "y"), 4)
    assert(spark.read.parquet(s"$dir/empty").count() == 0)
    val e = intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("a"), col("b"), col("c"), col("d")),
        Seq.fill(4)((0.0, 1.0))) // 4 dims × 16 bits = 64 > 63
    }
    assert(e.getMessage.contains("64-bit"))
  }
}
