package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Tables.spreadSmallScan]] — the guarded repartition applied ahead
  * of heavy map-side compute on under-partitioned inputs (the
  * single-row-group fixture case). The guard is the scale contract:
  * an input already at least as wide as the session's parallelism
  * passes through UNTOUCHED (production layouts never pay the
  * shuffle), a narrow input spreads to exactly the parallelism, rows
  * are preserved bit-for-bit, and conf 0 disables the op entirely.
  */
class SpreadSpec extends AnyFunSuite {
  import SparkTestSession._

  private val confKey = "spark.graft.scanSpreadMin"

  test("narrow input spreads to default parallelism, rows preserved") {
    import spark.implicits._
    val narrow = (1 to 1000).toDF("x").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val spread = Tables.spreadSmallScan(narrow)
    assert(spread.rdd.getNumPartitions
      == spark.sparkContext.defaultParallelism)
    assert(spread.collect().map(_.getInt(0)).sorted.toSeq
      == (1 to 1000).toSeq)
  }

  test("already-wide input passes through with its partitioning") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    val wide = (1 to 1000).toDF("x").repartition(target + 3)
    val out = Tables.spreadSmallScan(wide)
    // untouched: same frame, no extra exchange
    assert(out.rdd.getNumPartitions == target + 3)
    assert(out.queryExecution.analyzed
      == wide.queryExecution.analyzed)
  }

  test("conf 0 disables the spread; explicit conf overrides the target") {
    import spark.implicits._
    val narrow = (1 to 100).toDF("x").coalesce(1)
    val prior = spark.conf.getOption(confKey)
    try {
      spark.conf.set(confKey, "0")
      assert(Tables.spreadSmallScan(narrow).rdd.getNumPartitions == 1)
      spark.conf.set(confKey, "5")
      assert(Tables.spreadSmallScan(narrow).rdd.getNumPartitions == 5)
    } finally prior match {
      case Some(v) => spark.conf.set(confKey, v)
      case None    => spark.conf.unset(confKey)
    }
  }
}
