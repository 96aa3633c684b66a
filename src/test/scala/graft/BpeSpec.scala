package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Bpe

/** Hand-computed BPE training fixtures (the iterative trainer has no
  * single-statement SQL oracle; these pin the algorithm instead, while the
  * `bpe_top_pairs` query oracle-pins the weighted pair-statistics core).
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("merge application is left-to-right non-overlapping") {
    import spark.implicits._
    val d = Seq(Seq("a", "a", "a", "a", "a")).toDF("syms")
    val r = d.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(r == Seq("aa", "aa", "a"))
    val d2 = Seq(Seq("x", "a", "b", "a", "b", "y")).toDF("syms")
    val r2 = d2.select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .head().getSeq[String](0)
    assert(r2 == Seq("x", "ab", "ab", "y"))
  }

  test("trainer reproduces the hand-computed merge sequence") {
    // corpus: "low" ×3, "lower" ×2  (word-freq dict {low:3, lower:2})
    // pair stats it.1: (l,o)=5 (w,e)=2 (e,r)=2 (o,w)=5 → top (l,o)=5
    //   [tie (l,o) vs (o,w) at 5 → (l,o) wins on left asc]
    // after merge: {lo w:3, lo w e r:2}
    // it.2: (lo,w)=5 (w,e)=2 (e,r)=2 → (lo,w)=5 → {low:3, low e r:2}
    // it.3: (low,e)=2 (e,r)=2 → (e,r) vs (low,e) tie at 2 → (e,r) wins
    //   on left asc ('e' < 'low') → {low:3, low er:2}
    // it.4: (low,er)=2 → merged → {low:3, lower:2}
    // it.5: no pairs left → trainer stops early
    val d = docs(Seq(
      (1L, "low low low"),
      (2L, "lower lower")))
    val ms = Bpe.trainMerges(d, k = 10)
    assert(ms.map(m => (m.left, m.right, m.pair_freq)) == Seq(
      ("l", "o", 5L), ("lo", "w", 5L), ("e", "r", 2L),
      ("low", "er", 2L)))
    assert(ms.map(_.rank) == Seq(1, 2, 3, 4))
  }

  test("token report counts post-merge symbols per document") {
    val d = docs(Seq((1L, "low lower"), (2L, "low")))
    val merges = Bpe.trainMerges(d, k = 2) // learns (l,o) then (lo,w)
    assert(merges.map(m => m.merged) == Seq("lo", "low"))
    val r = Bpe.tokenReport(d, merges).orderBy("doc_id").collect()
    // doc1: "low"→[low]=1, "lower"→[low,e,r]=3 → 4 bpe tokens, 2 words
    assert(r(0).getAs[Long]("n_words") == 2L)
    assert(r(0).getAs[Long]("n_bpe_tokens") == 4L)
    // doc2: "low"→[low]=1
    assert(r(1).getAs[Long]("n_bpe_tokens") == 1L)
  }

  test("native bpe_apply emits the hand-computed token sequences") {
    graft.functions.GraftFunctions.register(spark)
    val d = docs(Seq((1L, "low lower"), (2L, "low")))
    val merges = Bpe.trainMerges(d, k = 2).map(m => (m.left, m.right))
    val r = d.select(col("doc_id"),
        graft.functions.GraftFunctions.bpeApply(col("text"), merges)
          .as("toks"))
      .orderBy("doc_id").collect()
    assert(r(0).getSeq[String](1) == Seq("low", "low", "e", "r"))
    assert(r(1).getSeq[String](1) == Seq("low"))
    // left-to-right non-overlapping within a word, and a merge that
    // fires in a symbol context created by an earlier rank
    val d2 = docs(Seq((1L, "aaaaa xababy")))
    val manual = Seq(("a", "a"), ("a", "b"), ("x", "ab"))
    val r2 = d2.select(graft.functions.GraftFunctions
      .bpeApply(col("text"), manual).as("toks")).head().getSeq[String](0)
    assert(r2 == Seq("aa", "aa", "a", "xab", "ab", "y"))
  }

  test("native bpe_apply ≡ fold-twin token counts on learned rules") {
    graft.functions.GraftFunctions.register(spark)
    val d = Tables(spark, Sf0001).documents
    val merges = Bpe.trainMerges(d, k = 8)
    val native = Bpe.tokenizeReport(d, merges)
      .select("doc_id", "n_bpe_tokens").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val twin = Bpe.tokenReport(d, merges)
      .select("doc_id", "n_bpe_tokens").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(native.sameElements(twin))
  }

  test("bpe_apply fires a pair re-learned at a later rank") {
    graft.functions.GraftFunctions.register(spark)
    // duplicate pair (xy,z): at rank 1 no "xy" symbol exists yet, rank 2
    // creates it, rank 3 re-fires the pair — a first-rank-only lookup
    // table would return rank 1 (< cursor) and drop the merge
    val d = docs(Seq((1L, "xyz")))
    val rules = Seq(("xy", "z"), ("x", "y"), ("xy", "z"))
    val toks = d.select(graft.functions.GraftFunctions
      .bpeApply(col("text"), rules).as("t")).head().getSeq[String](0)
    assert(toks == Seq("xyz"))
  }

  test("top pairs on the fixture corpus are deterministically ranked") {
    val t = Bpe.topPairs(Tables(spark, Sf0001).documents, 10).collect()
    assert(t.length == 10)
    val freqs = t.map(_.getAs[Long]("pair_freq")).toSeq
    assert(freqs == freqs.sorted.reverse) // ranked desc
    // ties (if any) resolve by (left_sym, right_sym) ascending
    t.sliding(2).foreach { case Array(a, b) =>
      if (a.getAs[Long]("pair_freq") == b.getAs[Long]("pair_freq")) {
        val ka = (a.getAs[String]("left_sym"), a.getAs[String]("right_sym"))
        val kb = (b.getAs[String]("left_sym"), b.getAs[String]("right_sym"))
        assert(Ordering[(String, String)].lt(ka, kb))
      }
    }
  }
}
