package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{CorpusGraph, Dedup}

/** The persisted corpus dedup graph's maintenance contract:
  * (a) append ≡ rebuild — appending a batch's pairs (with the bounded
  * touched-component relabel) equals a full rebuild over the unioned
  * pair set, including merges of two standing multi-doc components
  * through a batch bridge doc; (b) replay idempotence; (c) purge ≡
  * rebuild — including the bridge-removal cluster SPLIT, where
  * surviving members' labels change (the case a row-filter purge is
  * structurally blind to); (d) the stale-label audit catches exactly
  * that blindness; (e) purge stats prove partition-pruned IO.
  */
class CorpusGraphSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def pairsDf(ps: Seq[(Long, Long, String)]): DataFrame = {
    import spark.implicits._
    ps.toDF("doc_a", "doc_b", "modality")
  }

  private def labelMap(path: String): Map[Long, Long] =
    CorpusGraph.readLabels(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Ground truth: full relabel of the stored pair set. */
  private def rebuilt(path: String): Map[Long, Long] =
    Dedup.clusterLabels(
        CorpusGraph.readPairs(spark, path).select("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("append merges two standing components through a batch bridge (≡ rebuild)") {
    val path = tmpDir("cgappend")
    // two standing components {1,2,3} and {10,11}, one standing pair
    // island {20,21}
    CorpusGraph.write(pairsDf(Seq(
      (1L, 2L, "text"), (2L, 3L, "image"),
      (10L, 11L, "audio"), (20L, 21L, "video"))), path)
    assert(labelMap(path) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    // batch doc 100 bridges components 1 and 10; batch doc 101 pairs
    // into nothing else (new 2-doc component with 102)
    val batch = pairsDf(Seq(
      (3L, 100L, "text"), (100L, 10L, "image"), (101L, 102L, "text")))
    CorpusGraph.append(spark, path, batch, batchId = 1L)
    val got = labelMap(path)
    assert(got == rebuilt(path), "append must equal a full rebuild")
    // the merge happened: every member of both standing components and
    // the bridge carry the merged min label
    assert(Seq(1L, 2L, 3L, 10L, 11L, 100L).forall(got(_) == 1L))
    // untouched island kept its label, new component labeled by its min
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got(101L) == 101L && got(102L) == 101L)
    assert(CorpusGraph.staleLabelCount(spark, path) == 0L)
  }

  test("append replay is idempotent (at-least-once delivery)") {
    val path = tmpDir("cgreplay")
    CorpusGraph.write(pairsDf(Seq((1L, 2L, "text"))), path)
    val batch = pairsDf(Seq((2L, 50L, "image"), (60L, 61L, "text")))
    CorpusGraph.append(spark, path, batch, batchId = 1L)
    val pairs1 = CorpusGraph.readPairs(spark, path).collect().toSet
    val labels1 = labelMap(path)
    CorpusGraph.append(spark, path, batch, batchId = 1L) // replay
    assert(CorpusGraph.readPairs(spark, path).collect().toSet == pairs1,
      "replay must rewrite exactly its own batch partition")
    assert(labelMap(path) == labels1, "replay must not move labels")
    assert(CorpusGraph.staleLabelCount(spark, path) == 0L)
  }

  test("purging a bridge doc SPLITS its cluster and relabels survivors (≡ rebuild)") {
    import spark.implicits._
    val path = tmpDir("cgbridge")
    // chain 1—2—3—4—5 with 3 as the bridge; island {8,9}
    CorpusGraph.write(pairsDf(Seq(
      (1L, 2L, "text"), (2L, 3L, "text"), (3L, 4L, "image"),
      (4L, 5L, "image"), (8L, 9L, "audio"))), path)
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(labelMap(path)(_) == 1L))
    val out = CorpusGraph.purge(spark, path, Seq(3L).toDF("doc_id"))
    assert(out.pairRowsRemoved == 2L, s"$out") // (2,3) and (3,4)
    assert(out.labelRowsRemoved == 1L, s"$out") // doc 3 itself
    // docs 4 and 5 must RELABEL (1 → 4): the rows a row-filter-only
    // purge would serve stale forever
    assert(out.labelsChanged == 2L, s"$out")
    assert(out.leftover == 0L && out.staleLabels == 0L, s"$out")
    val got = labelMap(path)
    assert(got == rebuilt(path), "purge must equal a rebuild from survivors")
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      8L -> 8L, 9L -> 8L))
  }

  test("purging the component's min doc moves the label; pairless members drop out") {
    import spark.implicits._
    val path = tmpDir("cgmin")
    // {1,2,3} star around 2; purging 1 (the LABEL doc) relabels 2,3;
    // purging 5 from {5,6} leaves 6 pairless — it exits the table
    CorpusGraph.write(pairsDf(Seq(
      (1L, 2L, "text"), (2L, 3L, "text"), (5L, 6L, "image"))), path)
    val out = CorpusGraph.purge(spark, path,
      Seq(1L, 5L).toDF("doc_id"))
    assert(out.leftover == 0L && out.staleLabels == 0L, s"$out")
    val got = labelMap(path)
    assert(got == rebuilt(path))
    assert(got == Map(2L -> 2L, 3L -> 2L),
      s"6 must drop out (no surviving pair), 2/3 relabel: $got")
    // 6 dropped without being purged: labelRowsRemoved counts 1, 5, 6
    assert(out.labelRowsRemoved == 3L, s"$out")
  }

  test("stale-label audit catches a naive row-filter purge; repairLabels recovers") {
    import spark.implicits._
    val path = tmpDir("cgstale")
    CorpusGraph.write(pairsDf(Seq(
      (1L, 2L, "text"), (2L, 3L, "text"), (3L, 4L, "image"),
      (4L, 5L, "image"))), path)
    // naive purge: drop doc 3's pair rows and label row, NO relabel —
    // exactly what purgeIndex-style row filtering would do
    graft.ext.Takedown.purgeIndex(spark, s"$path/pairs", "doc_a",
      Seq(3L).toDF("doc_a"), CorpusGraph.PairPartCols)
    graft.ext.Takedown.purgeIndex(spark, s"$path/pairs", "doc_b",
      Seq(3L).toDF("doc_b"), CorpusGraph.PairPartCols)
    graft.ext.Takedown.purgeIndex(spark, s"$path/labels", "doc_id",
      Seq(3L).toDF("doc_id"), Seq("bucket"))
    // every leftover row count is now 0 — yet docs 4,5 serve the dead
    // merged label: only the stale audit sees it
    assert(CorpusGraph.readPairs(spark, path)
      .filter(col("doc_a") === 3L || col("doc_b") === 3L).count() == 0L)
    assert(CorpusGraph.readLabels(spark, path)
      .filter(col("doc_id") === 3L).count() == 0L)
    // 4 = the symmetric difference: stored rows 4→1, 5→1 are wrong AND
    // expected rows 4→4, 5→4 are missing
    assert(CorpusGraph.staleLabelCount(spark, path) == 4L,
      "the audit must flag the split component's stale labels")
    // the audit's exit: repairLabels corrects exactly the flagged state
    // (the naive edit deleted doc 3's label row, so purge's component
    // discovery can no longer see the split — repair relabels from the
    // stored pairs themselves)
    assert(CorpusGraph.repairLabels(spark, path) == 2L) // 4→4, 5→4
    assert(CorpusGraph.staleLabelCount(spark, path) == 0L)
    assert(labelMap(path) == rebuilt(path))
  }

  test("purge crash window (pairs purged, labels not) converges on re-run") {
    import spark.implicits._
    val path = tmpDir("cgcrash")
    CorpusGraph.write(pairsDf(Seq(
      (1L, 2L, "text"), (2L, 3L, "text"), (3L, 4L, "image"),
      (4L, 5L, "image"))), path)
    // simulate the real purge dying between its pair rewrite and its
    // label rewrite: pairs purged, label table untouched — the purged
    // doc's label row is still present, which is exactly why discovery
    // works on the re-run
    graft.ext.Takedown.purgeIndex(spark, s"$path/pairs", "doc_a",
      Seq(3L).toDF("doc_a"), CorpusGraph.PairPartCols)
    graft.ext.Takedown.purgeIndex(spark, s"$path/pairs", "doc_b",
      Seq(3L).toDF("doc_b"), CorpusGraph.PairPartCols)
    assert(CorpusGraph.staleLabelCount(spark, path) > 0L)
    val out = CorpusGraph.purge(spark, path, Seq(3L).toDF("doc_id"))
    assert(out.leftover == 0L && out.staleLabels == 0L, s"$out")
    assert(out.labelsChanged == 2L, s"$out") // 4,5 relabel to 4
    assert(labelMap(path) == rebuilt(path))
    assert(labelMap(path) == Map(1L -> 1L, 2L -> 1L, 4L -> 4L,
      5L -> 4L))
  }

  test("propagate covers the graph next to row-purgeable artifacts") {
    import spark.implicits._
    import graft.ext.Takedown
    val path = tmpDir("cgprop")
    CorpusGraph.write(pairsDf(Seq(
      (1L, 2L, "text"), (2L, 3L, "text"), (3L, 4L, "image"))), path)
    // a flat sidecar holding the same doc ids, for the matrix shape
    val side = tmpDir("cgpropside") + "/t"
    Seq(1L, 2L, 3L, 4L).toDF("doc_id").write.parquet(side)
    val out = Takedown.propagate(spark, Seq(3L).toDF("doc_id"), Seq(
      Takedown.DedupGraph("corpus_graph", path),
      Takedown.FlatTable("sidecar", side, "doc_id")))
    assert(out.size == 2)
    out.foreach(a => assert(a.leftover == 0L, s"$a"))
    val g = out.find(_.artifact == "corpus_graph").get
    // 2 pair rows + doc 3's label row + doc 4's (pairless after the
    // purge, so it exits the membership table)
    assert(g.rowsRemoved == 4L, s"$g")
    // the graph's leftover folds in the stale-label audit, so 0 here
    // proves the split relabel happened, not just row removal
    assert(labelMap(path) == rebuilt(path))
  }

  test("property: random graphs — append and purge equal a from-scratch rebuild") {
    import spark.implicits._
    val mods = Array("image", "audio", "video", "text")
    def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      if (pairs.isEmpty) Map.empty
      else Dedup.clusterLabels(pairs.toDF("doc_a", "doc_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nDocs = 12 + rnd.nextInt(15)
      val edges = Seq.fill(5 + rnd.nextInt(25)) {
        val a = rnd.nextInt(nDocs).toLong
        var b = rnd.nextInt(nDocs).toLong
        if (a == b) b = (a + 1) % nDocs
        (math.min(a, b), math.max(a, b), mods(rnd.nextInt(4)))
      }.distinct
      // random ingest split: docs ≥ cut are the new batch — base
      // holds only both-old pairs, the batch every pair touching a
      // new doc (exactly the incremental screens' split)
      val cut = 3 + rnd.nextInt(nDocs - 3)
      val basePairs = edges.filter(e => e._1 < cut && e._2 < cut)
      val batchPairs = edges.filter(e => e._1 >= cut || e._2 >= cut)
      val path = tmpDir(s"cgprop$seed")
      CorpusGraph.write(pairsDf(basePairs), path)
      CorpusGraph.append(spark, path, pairsDf(batchPairs), 1L)
      assert(labelMap(path) == labelsOf(edges.map(e => (e._1, e._2))),
        s"seed $seed: append != rebuild over ${edges.size} edges")
      assert(CorpusGraph.staleLabelCount(spark, path) == 0L,
        s"seed $seed post-append")
      // random purge set (~25% of the id space; may hit bridges,
      // component minima, isolated docs, or nothing)
      val ids = (0L until nDocs.toLong)
        .filter(_ => rnd.nextDouble() < 0.25)
      if (ids.nonEmpty) {
        val out = CorpusGraph.purge(spark, path, ids.toDF("doc_id"))
        assert(out.leftover == 0L && out.staleLabels == 0L,
          s"seed $seed: $out")
        val surviving = edges
          .filter(e => !ids.contains(e._1) && !ids.contains(e._2))
        assert(labelMap(path) == labelsOf(surviving.map(e => (e._1, e._2))),
          s"seed $seed: purge != rebuild from survivors")
      }
    }
  }

  test("empty and degenerate graphs are total") {
    import spark.implicits._
    val path = tmpDir("cgempty")
    CorpusGraph.write(pairsDf(Seq.empty), path)
    assert(CorpusGraph.readPairs(spark, path).count() == 0L)
    assert(CorpusGraph.readLabels(spark, path).count() == 0L)
    assert(CorpusGraph.staleLabelCount(spark, path) == 0L)
    // first real content arrives via append onto the empty base
    CorpusGraph.append(spark, path, pairsDf(Seq((1L, 2L, "text"))), 1L)
    assert(labelMap(path) == Map(1L -> 1L, 2L -> 1L))
    // purging everything empties the graph cleanly
    val out = CorpusGraph.purge(spark, path, Seq(1L, 2L).toDF("doc_id"))
    assert(out.leftover == 0L && out.staleLabels == 0L, s"$out")
    assert(labelMap(path).isEmpty)
    assert(CorpusGraph.readPairs(spark, path).count() == 0L)
  }

  test("purge against the bootstrap crash window (pairs landed, labels absent) converges") {
    import spark.implicits._
    val path = tmpDir("cgboot")
    // simulate GraphStream's bootstrap crash: the pair write landed,
    // the first label write never ran — the label table does not exist
    CorpusGraph.write(pairsDf(Seq(
      (1L, 2L, "text"), (2L, 3L, "text"))), path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/labels"), true)
    // a takedown in this state must purge the pair rows and converge,
    // not abort on the missing table
    val out = CorpusGraph.purge(spark, path, Seq(2L).toDF("doc_id"),
      audit = false)
    assert(out.pairRowsRemoved == 2L && out.leftover == 0L, s"$out")
    assert(CorpusGraph.readPairs(spark, path).count() == 0L)
    // the audit reports the missing label rows (docs 1,3 have no
    // surviving pair here, so the repaired table is empty and clean);
    // on a window with surviving pairs, repairLabels is the recovery
    assert(CorpusGraph.repairLabels(spark, path) == 0L)
    assert(CorpusGraph.staleLabelCount(spark, path) == 0L)
    // same window with SURVIVING pairs: repair rebuilds the labels
    val p2 = tmpDir("cgboot2")
    CorpusGraph.write(pairsDf(Seq(
      (1L, 2L, "text"), (5L, 6L, "image"))), p2)
    fs.delete(new org.apache.hadoop.fs.Path(s"$p2/labels"), true)
    val o2 = CorpusGraph.purge(spark, p2, Seq(2L).toDF("doc_id"))
    assert(o2.pairRowsRemoved == 1L && o2.leftover == 0L, s"$o2")
    assert(o2.staleLabels == 2L, s"survivors unlabeled: $o2")
    assert(CorpusGraph.repairLabels(spark, p2) == 2L)
    assert(labelMap(p2) == Map(5L -> 5L, 6L -> 5L))
  }

  test("append/purge equal a rebuild through the mega-component shuffle-join fallback") {
    import spark.implicits._
    // force every gated join down the shuffle path (the branch a
    // power-law mega-component takes when members exceed
    // BroadcastMemberMax) and re-pin append ≡ rebuild, purge ≡ rebuild
    val saved = CorpusGraph.memberBroadcastBound
    CorpusGraph.memberBroadcastBound = 0L
    try {
      val path = tmpDir("cgshuffle")
      CorpusGraph.write(pairsDf(Seq(
        (1L, 2L, "text"), (2L, 3L, "image"), (10L, 11L, "audio"))), path)
      CorpusGraph.append(spark, path,
        pairsDf(Seq((3L, 10L, "text"), (20L, 21L, "video"))), 1L)
      assert(labelMap(path) == rebuilt(path))
      assert(CorpusGraph.staleLabelCount(spark, path) == 0L)
      val out = CorpusGraph.purge(spark, path, Seq(3L).toDF("doc_id"))
      assert(out.leftover == 0L && out.staleLabels == 0L, s"$out")
      assert(labelMap(path) == rebuilt(path))
      assert(labelMap(path) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L,
        11L -> 10L, 20L -> 20L, 21L -> 20L))
    } finally CorpusGraph.memberBroadcastBound = saved
  }

  test("touched-scope stale audit ≡ full audit on the touched components, blind outside them") {
    import spark.implicits._
    import graft.ext.Takedown
    val path = tmpDir("cgtouch")
    // four components: A {1,2,3}, B {10,11}, C {20,21}, D {30,31,32}
    CorpusGraph.write(pairsDf(Seq(
      (1L, 2L, "text"), (2L, 3L, "text"), (10L, 11L, "image"),
      (20L, 21L, "audio"), (30L, 31L, "text"), (31L, 32L, "text"))),
      path)
    // healthy graph: a scoped audit converges in ≤2 rounds, scope =
    // exactly the touched component, verdict clean
    val healthy = CorpusGraph.staleLabelCountTouched(spark, path,
      Seq(1L).toDF("doc_id"))
    assert(healthy.stale == 0L && !healthy.fellBackToFull, s"$healthy")
    assert(healthy.scopeDocs == 3L && healthy.scopePairs == 2L
      && healthy.rounds <= 2, s"$healthy")

    // plant TWO independent stale regions:
    // A: naive row-filter purge of bridge doc 2 — pairs gone, docs 1
    //    and 3 left as GHOST label rows (the split-blindness state)
    Takedown.purgeIndex(spark, s"$path/pairs", "doc_a",
      Seq(2L).toDF("doc_a"), CorpusGraph.PairPartCols)
    Takedown.purgeIndex(spark, s"$path/pairs", "doc_b",
      Seq(2L).toDF("doc_b"), CorpusGraph.PairPartCols)
    Takedown.purgeIndex(spark, s"$path/labels", "doc_id",
      Seq(2L).toDF("doc_id"), Seq("bucket"))
    // D: doc 31's label row externally deleted — a MISSING member
    Takedown.purgeIndex(spark, s"$path/labels", "doc_id",
      Seq(31L).toDF("doc_id"), Seq("bucket"))
    val full = CorpusGraph.staleLabelCount(spark, path)
    assert(full == 3L, s"2 ghosts in A + 1 missing in D, got $full")

    // scoped to A: finds exactly A's disagreement (ghost discovery
    // runs through the label jump — the pairs are gone)
    val a = CorpusGraph.staleLabelCountTouched(spark, path,
      Seq(1L).toDF("doc_id"))
    assert(a.stale == 2L && !a.fellBackToFull, s"$a")
    assert(a.scopeDocs == 2L && a.scopePairs == 0L, s"$a")
    // scoped to D: finds exactly D's missing member (discovered via
    // the pair hop — 31 has no label row to jump through)
    val d = CorpusGraph.staleLabelCountTouched(spark, path,
      Seq(30L).toDF("doc_id"))
    assert(d.stale == 1L && !d.fellBackToFull, s"$d")
    assert(d.scopeDocs == 3L && d.scopePairs == 2L, s"$d")
    // scoped to healthy B: clean — the audit is BLIND to out-of-scope
    // staleness by design (that's what makes it batch-priced; the
    // full audit runs on cadence for global independence)
    val b = CorpusGraph.staleLabelCountTouched(spark, path,
      Seq(10L).toDF("doc_id"))
    assert(b.stale == 0L && b.scopeDocs == 2L, s"$b")
    // the two scoped verdicts partition the full audit's count
    assert(a.stale + d.stale == full)
    // empty scope is total
    val e = CorpusGraph.staleLabelCountTouched(spark, path,
      spark.range(0).select(col("id").as("doc_id")))
    assert(e.stale == 0L && e.scopeDocs == 0L, s"$e")
  }

  test("touched-scope audit through the shuffle-join fallback; post-append monitor shape") {
    import spark.implicits._
    val saved = CorpusGraph.memberBroadcastBound
    CorpusGraph.memberBroadcastBound = 0L
    try {
      val path = tmpDir("cgtouchsh")
      CorpusGraph.write(pairsDf(Seq(
        (1L, 2L, "text"), (10L, 11L, "image"))), path)
      // the monitor shape: append a batch, audit scoped to ITS pair
      // endpoints — the per-ingest health check the full audit was
      // too expensive to be
      val batch = pairsDf(Seq((2L, 10L, "text"), (20L, 21L, "video")))
      CorpusGraph.append(spark, path, batch, 1L)
      val ids = batch.select(col("doc_a").as("doc_id"))
        .unionByName(batch.select(col("doc_b").as("doc_id"))).distinct()
      val out = CorpusGraph.staleLabelCountTouched(spark, path, ids)
      assert(out.stale == 0L && !out.fellBackToFull, s"$out")
      // scope covered the merged component {1,2,10,11} + {20,21}
      assert(out.scopeDocs == 6L && out.scopePairs == 4L, s"$out")
    } finally CorpusGraph.memberBroadcastBound = saved
  }

  test("mega-component append routes to the full relabel at the break-even (≡ rebuild)") {
    import spark.implicits._
    val savedMin = CorpusGraph.routeMinMembers
    val savedFrac = CorpusGraph.routeFraction
    try {
      val path = tmpDir("cgroute")
      CorpusGraph.write(pairsDf(Seq(
        (1L, 2L, "text"), (2L, 3L, "image"), (10L, 11L, "audio"))), path)
      // default knobs: a fixture-sized append never prices the graph
      // (graphMembers -1) and never routes
      val r0 = CorpusGraph.append(spark, path,
        pairsDf(Seq((50L, 51L, "text"))), 1L)
      assert(!r0.routedFullRelabel && r0.graphMembers == -1L, s"$r0")
      assert(r0.batchPairRows == 1L && r0.touchedDocs == 2L, s"$r0")
      // force the route (the state a mega-component append reaches):
      // touched members exceed the fraction of the graph
      CorpusGraph.routeMinMembers = 0L
      CorpusGraph.routeFraction = 0.0
      val batch = pairsDf(Seq((3L, 10L, "text"), (60L, 61L, "video")))
      val r1 = CorpusGraph.append(spark, path, batch, 2L)
      assert(r1.routedFullRelabel, s"$r1")
      assert(r1.graphMembers == 7L, s"priced the stored graph: $r1")
      assert(r1.touchedMembers == 5L, s"members of {1,2,3}+{10,11}: $r1")
      // routed labels are byte-identical to a rebuild's
      assert(labelMap(path) == rebuilt(path))
      assert(Seq(1L, 2L, 3L, 10L, 11L).forall(labelMap(path)(_) == 1L))
      assert(CorpusGraph.staleLabelCount(spark, path) == 0L)
      // replay through the routed path is idempotent
      val labels1 = labelMap(path)
      val r2 = CorpusGraph.append(spark, path, batch, 2L)
      assert(r2.routedFullRelabel, s"$r2")
      assert(labelMap(path) == labels1)
      assert(CorpusGraph.staleLabelCount(spark, path) == 0L)
    } finally {
      CorpusGraph.routeMinMembers = savedMin
      CorpusGraph.routeFraction = savedFrac
    }
  }

  test("label-write concurrency contract: bounded deltas leave untouched buckets byte-identical; a torn promote is detected and repaired") {
    val path = tmpDir("cgconc")
    // 8 two-doc components spread across the 16 label buckets
    CorpusGraph.write(pairsDf((0 until 16 by 2).map(i =>
      (i.toLong, i.toLong + 1, "text"))), path)

    // per-bucket byte fingerprints of the label table (local fs —
    // the straddling reader's view is exactly these files)
    def fingerprint(): Map[String, Map[String, String]] = {
      val root = new java.io.File(s"$path/labels")
      root.listFiles().filter(f =>
        f.isDirectory && f.getName.startsWith("bucket=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map { f =>
            val bytes = java.nio.file.Files.readAllBytes(f.toPath)
            val md = java.security.MessageDigest.getInstance("MD5")
            f.getName -> md.digest(bytes).map("%02x".format(_)).mkString
          }.toMap
      }.toMap
    }
    val before = fingerprint()

    // bounded delta append touching ONLY component {0,1}: every
    // bucket outside {0 (doc 0), 1 (doc 1), 4 (doc 100)} must be
    // BYTE-identical afterwards — the straddling-reader guarantee for
    // untouched components
    CorpusGraph.append(spark, path,
      pairsDf(Seq((1L, 100L, "text"))), batchId = 1L)
    val after = fingerprint()
    val touched = Set("bucket=0", "bucket=1", "bucket=4")
    before.keySet.filterNot(touched).foreach { b =>
      assert(after(b) == before(b),
        s"bounded delta rewrote untouched $b")
    }
    assert(labelMap(path) == rebuilt(path))
    assert(CorpusGraph.staleLabelCount(spark, path) == 0L)

    // torn ROUTED promote: force the full-relabel route for an append
    // whose only label CHANGE is doc 101 (bucket 5), then restore
    // bucket 5's pre-append bytes — exactly the mixed old/new state a
    // reader straddling the per-bucket promote (or a writer crash
    // mid-promote) can observe. The contract: such a state is always
    // DETECTED by the stale audit and REPAIRED, never silently served
    // past the audit cadence.
    val savedMin = CorpusGraph.routeMinMembers
    val savedFrac = CorpusGraph.routeFraction
    val bucket5 = new java.io.File(s"$path/labels/bucket=5")
    val saved = java.nio.file.Files.createTempDirectory("cgconc5")
    bucket5.listFiles().foreach(f => java.nio.file.Files.copy(f.toPath,
      saved.resolve(f.getName)))
    try {
      CorpusGraph.routeMinMembers = 0L
      CorpusGraph.routeFraction = 0.0
      CorpusGraph.append(spark, path,
        pairsDf(Seq((3L, 101L, "text"))), batchId = 2L)
    } finally {
      CorpusGraph.routeMinMembers = savedMin
      CorpusGraph.routeFraction = savedFrac
    }
    assert(CorpusGraph.staleLabelCount(spark, path) == 0L)
    // tear: bucket 5 reverts to its pre-append content (101's row gone)
    bucket5.listFiles().foreach(f => { f.delete(); () })
    saved.toFile.listFiles().foreach(f => java.nio.file.Files.copy(
      f.toPath, bucket5.toPath.resolve(f.getName)))
    spark.catalog.refreshByPath(s"$path/labels")
    assert(CorpusGraph.staleLabelCount(spark, path) == 1L,
      "the torn promote must be visible to the audit (101→2 missing)")
    assert(CorpusGraph.repairLabels(spark, path) == 1L)
    assert(CorpusGraph.staleLabelCount(spark, path) == 0L)
    assert(labelMap(path) == rebuilt(path))
  }

  test("purge IO is partition-pruned and an unrelated purge is a no-op") {
    import spark.implicits._
    val path = tmpDir("cgnoop")
    CorpusGraph.write(pairsDf(Seq((1L, 2L, "text"))), path)
    CorpusGraph.append(spark, path, pairsDf(Seq((2L, 40L, "image"))),
      batchId = 1L)
    val out = CorpusGraph.purge(spark, path, Seq(999L).toDF("doc_id"))
    assert(out == CorpusGraph.GraphPurge(0L, 0L, 0L,
      out.partsTotal, 0L, 0L, 0L, 0L), s"$out")
    // a real purge of doc 40 touches only batch 1's pair partition and
    // the label buckets of its component
    val out40 = CorpusGraph.purge(spark, path, Seq(40L).toDF("doc_id"))
    assert(out40.pairRowsRemoved == 1L && out40.leftover == 0L
      && out40.staleLabels == 0L, s"$out40")
    assert(out40.partsRewritten + out40.partsDeleted <= 3L,
      s"bounded rewrite expected: $out40")
    assert(labelMap(path) == Map(1L -> 1L, 2L -> 1L))
  }
}
