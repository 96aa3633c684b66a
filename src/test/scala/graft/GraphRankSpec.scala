package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.GraphRank

/** Fixed-point PageRank: hand-computed values on a planted graph, mass
  * conservation, and centrality ordering on the purchase fixture.
  */
class GraphRankSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pageRank matches hand-computed fixed-point values on a triangle") {
    import spark.implicits._
    // 3-cycle a->b->c->a, unit weights: symmetric, so every node must
    // hold exactly the initial mass at every iteration:
    // contrib = (1e9 * 1) div 1e9 ... outw=1 -> contrib = r; then
    // r' = 150000000 + (85 * 1e9) div 100 = 1e9.
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r = GraphRank.pageRank(edges, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> GraphRank.Scale, 2L -> GraphRank.Scale,
      3L -> GraphRank.Scale))
  }

  test("star graph: hub outranks leaves, exact fixed-point expected") {
    import spark.implicits._
    // hub 0 <-> leaves 1..4, unit weights. Hand-derived one iteration:
    // leaf: out=1 -> sends r; hub out=4 -> sends r div 4 to each leaf.
    val base = (1L to 4L).map(l => (0L, l, 1L))
    val edges = (base ++ base.map { case (s, d, w) => (d, s, w) })
      .toDF("src", "dst", "w")
    val s = GraphRank.Scale
    var hub = s; var leaf = s
    for (_ <- 1 to GraphRank.Iters) {
      val hubIn = 4L * leaf        // each leaf sends its whole rank
      val leafIn = hub / 4L        // hub splits across 4 leaves
      hub = GraphRank.Teleport + (GraphRank.DampNum * hubIn) / GraphRank.DampDen
      leaf = GraphRank.Teleport + (GraphRank.DampNum * leafIn) / GraphRank.DampDen
    }
    val r = GraphRank.pageRank(edges)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) == hub)
    (1L to 4L).foreach(l => assert(r(l) == leaf))
    assert(hub > leaf)
  }

  test("served rank index returns exactly the in-flight result") {
    val t = Tables(spark, Sf0001)
    val path = java.nio.file.Files.createTempDirectory("rankidx").toString
    GraphRank.writeRankIndex(t.orders, t.lineitem, path)
    val live = GraphRank.purchaseRank(t.orders, t.lineitem)
      .collect().toSeq
    val served = GraphRank.purchaseRankServed(spark, path)
      .collect().toSeq
    assert(served == live)
  }

  test("purchase rank: top nodes are suppliers (in-degree magnets)") {
    val t = Tables(spark, Sf0001)
    val top = GraphRank.purchaseRank(t.orders, t.lineitem).collect()
    assert(top.length == GraphRank.TopK)
    assert(top.map(_.getLong(0)).toSeq == (1L to GraphRank.TopK))
    // suppliers aggregate rank from many customers; with ~15x fewer
    // suppliers than customers the head of the ranking must be suppliers
    assert(top.take(5).forall(_.getString(1) == "supplier"))
    // ranks strictly ordered by the integer score with id tie-break
    val scores = top.map(_.getLong(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
