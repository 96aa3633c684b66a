package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quarantine

/** O5 quarantine split/replay semantics (SURVEY.md §2.5/§2.8). */
class QuarantineSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val df = {
    import spark.implicits._
    Seq((1L, "ok", true), (2L, "bad", false), (3L, "ok", true),
      (4L, null.asInstanceOf[String], false))
      .toDF("k", "tag", "good")
  }

  test("split partitions rows exactly; null predicate goes to main") {
    val (main, quar) = Quarantine.split(df, !col("good"))
    assert(main.count() + quar.count() == df.count())
    assert(main.select("k").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // null-valued predicate rows are NOT silently dropped
    val (m2, q2) = Quarantine.split(df, col("tag") === "bad")
    assert(m2.count() + q2.count() == df.count())
    assert(q2.select("k").collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("tagged carries every row exactly once") {
    val tagged = Quarantine.tagged(df, !col("good"))
    assert(tagged.count() == df.count())
    assert(tagged.filter(col("flow") === "quarantine").count() == 2)
  }

  test("replay re-admits quarantined rows not in the bad-key set") {
    import spark.implicits._
    val (main, quar) = Quarantine.split(df, !col("good"))
    val stillBad = Seq(4L).toDF("k")
    val replayed = Quarantine.replay(main, quar, stillBad, "k")
    // row 2 re-admitted, row 4 stays excluded
    assert(replayed.select("k").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
  }
}
