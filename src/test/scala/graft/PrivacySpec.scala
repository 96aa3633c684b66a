package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Privacy

/** Privacy-release audits: the per-threshold counts equal a
  * brute-force reference on hand-built and random tables, the ppm is
  * integer math, and the degenerate releases (all-unique, all-one-
  * group) land on the documented extremes.
  */
class PrivacySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("k-anonymity: hand-built groups land exactly") {
    // groups: A x1 (unique), B x3, C x6 — 10 rows
    val rows = Seq.fill(1)(("A", 1)) ++ Seq.fill(3)(("B", 1)) ++
      Seq.fill(6)(("C", 1))
    val df = rows.toDF("qi", "pad")
    val out = Privacy.kAnonymityReport(df, Seq(col("qi")), Seq(2L, 5L))
      .collect()
    val byK = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // k=2: only the unique row is below; table's k-anonymity is 1
    assert(byK(2L) == ((1L, 1L, 100000L, 1L)))
    // k=5: A and B below (1 + 3 rows = 400000 ppm)
    assert(byK(5L) == ((2L, 4L, 400000L, 1L)))
  }

  test("l-diversity: constant-sensitive groups disclose at any size") {
    // QI group X: 5 rows all sensitive "s1" (l=1, big but disclosing);
    // group Y: 2 rows, s1+s2 (l=2); group Z: 3 rows, s1+s2+s3 (l=3)
    val rows = Seq.fill(5)(("X", "s1")) ++
      Seq(("Y", "s1"), ("Y", "s2")) ++
      Seq(("Z", "s1"), ("Z", "s2"), ("Z", "s3"))
    val df = rows.toDF("qi", "seg")
    val out = Privacy.lDiversityReport(df, Seq(col("qi")), col("seg"),
      Seq(2L, 3L)).collect()
    val byL = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byL(2L) == ((1L, 5L, 500000L, 1L)),
      "the size-5 constant group is the disclosure, size doesn't save it")
    assert(byL(3L) == ((2L, 7L, 700000L, 1L)))
  }

  test("reports equal brute force on random tables; extremes hold") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 40 + rnd.nextInt(120)
      val rows = (0 until n).map(_ =>
        (rnd.nextInt(6).toLong, rnd.nextInt(4).toLong,
          s"s${rnd.nextInt(3)}"))
      val df = rows.toDF("a", "b", "seg")
      val ks = Seq(2L, 5L, 10L)
      // brute force
      val groups = rows.groupBy(r => (r._1, r._2)).values.toSeq
      val total = n.toLong
      val kOut = Privacy.kAnonymityReport(df,
        Seq(col("a"), col("b")), ks).collect()
      for (r <- kOut) {
        val k = r.getLong(0)
        val below = groups.filter(_.size < k)
        assert(r.getLong(1) == below.size.toLong, s"groups_below k=$k")
        assert(r.getLong(2) == below.map(_.size).sum.toLong,
          s"rows_below k=$k trial $trial")
        assert(r.getLong(3) ==
          below.map(_.size).sum.toLong * 1000000L / total)
        assert(r.getLong(4) == groups.map(_.size).min.toLong)
      }
      val ls = Seq(2L, 3L)
      val lOut = Privacy.lDiversityReport(df,
        Seq(col("a"), col("b")), col("seg"), ls).collect()
      for (r <- lOut) {
        val l = r.getLong(0)
        val below = groups.filter(_.map(_._3).distinct.size < l)
        assert(r.getLong(1) == below.size.toLong)
        assert(r.getLong(2) == below.map(_.size).sum.toLong)
        assert(r.getLong(4) ==
          groups.map(_.map(_._3).distinct.size).min.toLong)
      }
    }
    // all-unique release: every row below every k >= 2, k_anonymity 1
    val unique = (0L until 20L).map(i => (i, "x")).toDF("id", "pad")
    val u = Privacy.kAnonymityReport(unique, Seq(col("id")), Seq(2L))
      .head()
    assert(u.getLong(1) == 20L && u.getLong(2) == 20L
      && u.getLong(3) == 1000000L && u.getLong(4) == 1L)
    // one-group release: k-anonymous at the full table size
    val one = (0 until 20).map(_ => ("g", "x")).toDF("qi", "pad")
    val o = Privacy.kAnonymityReport(one, Seq(col("qi")), Seq(2L, 5L))
      .collect()
    assert(o.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L
      && r.getLong(3) == 0L && r.getLong(4) == 20L))
  }

  test("customer audit plans: one row-sized shuffle, broadcast thresholds") {
    val customer = Tables(spark, Sf0001).customer
    val kPlan = Privacy.customerKAnonymity(customer)
      .queryExecution.executedPlan.toString
    // the threshold expansion must broadcast, never shuffle, the ks
    assert(kPlan.contains("BroadcastNestedLoopJoin")
      || kPlan.contains("BroadcastExchange"), kPlan)
    // exactly one row-sized hash exchange (the QI groupBy); the
    // re-aggregation by threshold runs over group-sized data
    val hashEx = "Exchange hashpartitioning".r
      .findAllIn(kPlan).length
    assert(hashEx <= 2, s"expected QI + threshold exchanges only:\n$kPlan")
  }
}
