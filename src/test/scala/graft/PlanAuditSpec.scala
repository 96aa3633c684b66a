package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan invariants over EVERY SparkEntry query — the
  * automated form of the per-operator `.explain` audits: anti-patterns
  * that would sink a 100 TB run must not (re)appear anywhere in the
  * query surface, regardless of which operator a future change touches.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val physical
      : Map[String, org.apache.spark.sql.execution.SparkPlan] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, Sf0001).queryExecution.executedPlan
    }

  private lazy val plans: Map[String, String] =
    physical.map { case (name, p) => name -> p.toString }

  test("event-time predicates push through the NTZ-normalizing read path") {
    // Tables.events casts the NTZ fixture column to session-TZ
    // TimestampType; Catalyst must still fold an event-time predicate
    // into an NTZ literal comparison and push it to the parquet scan —
    // at 100 TB this is the difference between pruning row groups and
    // reading the whole event log to filter in memory.
    import org.apache.spark.sql.functions.col
    val q = Tables(spark, Sf0001).events
      .filter(col("ts") > java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(scan.contains("GreaterThan(ts"),
      s"ts predicate not pushed to parquet scan: $scan")
  }

  test("no query plans a CartesianProduct") {
    // unbroadcast cross joins are O(n²) shuffle disasters at scale; the
    // intentional cross joins (ANN corpus × bounded centroids/queries,
    // scalar-count attach) must all plan as BroadcastNestedLoopJoin with
    // the bounded side broadcast
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  /** Queries whose plans legitimately contain a single-partition
    * exchange: every one feeds it from bounded data — a final global
    * aggregate of already-combined partials (scalar report rows), a
    * ≤k-row limited frame, or a fixed-size suite/result frame. A
    * single-partition exchange over UNBOUNDED data (the
    * customer_value_ranks defect fixed in round 3) must not come back.
    */
  private val boundedSinglePartition = Set(
    "approx_sketches",      // one global sketch row
    "ce_run_report",        // one report row
    "dedup_exact",          // one summary row
    "dedup_survivors",      // one summary row
    "dq_dimension_scores",  // ≤5 dimension rows from a 15-row frame
    "dq_docs_suite",        // fixed 8-expectation frame
    "dq_suite_results",     // fixed 15-expectation frame
    "dq_suite_summary",     // one summary row
    "dq_trend_daily",       // one trend row
    "set_ops_users",        // one flags row
    "customer_value_ranks", // window over the ≤50-row top-k merge
    "schema_drift_report",  // O(distinct keys) report + scalar count
    "dq_alias_suite",       // fixed 15-expectation frame (aliased twin)
    "agent_daily_decisions",// streak windows over the O(days) aggregate
    "quality_filter_report",// one combined-agg row → O(rules) explode
    "bpe_merges",           // k collected merge rows (local table)
    "source_mix_weights",   // one-row corpus-total attach
    "temperature_mix",      // O(sources) aggregate + one-row attaches
    "doc_lm_score",         // one-row vocab-size attach
    "tfidf_top_docs",       // one-row corpus-size attach
    "bm25_top_docs",        // one-row scalars + window over ≤topK rows
    "bm25_served",          // same shared ranking plan, index-fed
    "more_like_this",       // one-row attaches + window over ≤topK rows
    "hybrid_mlt",           // windows over the ≤20-row ranker pools
    "hourly_gapfill",       // one-row bounds agg → O(hours) spine
    "hourly_anomalies",     // rolling window over the O(hours) series
    "event_funnel",         // three 1-row stage counts composed
    "dsir_weights",         // one-row feature-total attach
    "semantic_decontam",    // per-vector top-1 over the ≥τ sliver
    "doc_profile",          // one combined-agg row → O(columns) stack
    "curriculum_plan",      // 1-row percentile thresholds → 4-row agg
    "dataset_card",         // two 1-row aggregates composed
    "ann_index_drift",      // two 1-row stat aggregates composed
    "vocab_growth",         // cum-sum window over O(buckets) rows
    "heavy_hitters",        // one-row stream-total attach over O(symbols)
    "heavy_hitters_served", // same shape, index-fed estimates
    "pmi_collocations",     // one-row corpus-totals attach
    "key_skew_report",      // one-row key-totals attach
    "neg_sampling",         // one-row catalog-size attach
    "decayed_engagement",   // one-row as-of-day attach
    "label_balance",        // one-row corpus-totals attach
    "epoch_plan")           // O(sources) plan + 1-row budget attach

  test("single-partition exchanges only over bounded data") {
    val offenders = plans.collect {
      case (n, p) if p.contains("SinglePartition")
        && !boundedSinglePartition(n) => n
    }
    assert(offenders.isEmpty,
      s"unexpected single-partition exchanges in: $offenders")
  }

  /** Queries whose plans legitimately contain a
    * BroadcastNestedLoopJoin: every one broadcasts a BOUNDED side (the
    * fixed query/probe/centroid set, or a one-row scalar count) against
    * the corpus, so the loop is O(corpus × small-constant) map-side
    * work, not an O(n²) blowup. Any other BNLJ — e.g. a non-equi join
    * that should have been an equi/broadcast-hash join — fails here.
    */
  private val boundedBnlj = Set(
    "ann_topk_brute",       // corpus × 10 broadcast queries
    "ann_topk_lsh",         // corpus × broadcast query buckets (≠ guard)
    "ann_topk_lsh_multiprobe", // corpus × broadcast probe set
    "ann_topk_ivf",         // corpus × broadcast centroids, 2 passes
    "ann_topk_ivf_hier",    // corpus × broadcast coarse centroids
    "ann_topk_ivf_served",  // queries × broadcast centroid tables
    "dedup_embedding_cosine",  // label-block self-join ≠-guard pairs
    "schema_drift_report",  // scalar doc-count attach
    "dedup_exact",          // scalar count attach
    "dedup_survivors",      // scalar count attach
    "top_tokens",           // scalar vocab-size attach
    "customer_value_ranks", // ≤k-row top-k × one-row total count
    "ann_topk_pq",          // codes × broadcast per-query ADC tables
    "ann_topk_ivfpq",       // corpus × broadcast centroids (cell passes)
    "source_mix_weights",   // O(sources) rows × one-row total count
    "temperature_mix",      // O(sources) rows × one-row totals (×2)
    "doc_lm_score",         // positions × one-row vocab size
    "k_anonymity",          // O(QI groups) rows × 4-row threshold list
    "l_diversity",          // O(QI groups) rows × 3-row threshold list
    "tfidf_top_docs",       // tf rows × one-row corpus size
    "bm25_top_docs",        // tf rows × one-row (N, avgdl) scalars
    "bm25_served",          // same shared ranking plan, index-fed
    "more_like_this",       // tf rows × one-row corpus size / query norm
    "hybrid_mlt",           // MLT attaches + corpus × 1-row query vector
    "event_funnel",         // 1-row stage counts × 1-row stage counts
    "dsir_weights",         // positions × one-row smoothing totals
    "semantic_decontam",    // corpus × broadcast benchmark slice
    "hourly_anomalies",     // one-row bounds agg → O(hours) spine
    "curriculum_plan",      // corpus × 1-row threshold broadcast
    "dataset_card",         // 1-row base × 1-row quality aggregate
    "approx_sketches",      // corpus × 1-row sketch-scalars attach
    "ann_index_drift",      // batch × broadcast centroids; 1-row stats
    "vocab_growth",         // corpus × one-row doc-count attach
    "heavy_hitters",        // O(symbols) exact rows × 1-row total
    "heavy_hitters_served", // same shape, index-fed estimates
    "bitext_margin_pairs",  // corpus × broadcast bounded query/cand batch
    "pmi_collocations",     // pair counts × 1-row (N, B) totals
    "hard_negatives",       // corpus × broadcast bounded anchor set
    "hard_negatives_served",// probed cells × broadcast probe set
    "label_noise_knn",      // corpus × broadcast bounded anchor set
    "label_noise_knn_served", // probed cells × broadcast probe set
    "key_skew_report",      // key counts × 1-row totals attach
    "neg_sampling",         // users × 1-row catalog-size attach
    "decayed_engagement",   // day rows × 1-row as-of-day attach
    "label_balance",        // label counts × 1-row totals attach
    "ann_recall_report",    // brute side: corpus × broadcast anchors
    "ann_recall_filtered",  // filtered brute side: same bounded anchors
    "ann_topk_filtered",    // anchors × broadcast centroid tables
    "epoch_plan")           // O(sources) rows × 1-row budget broadcast

  test("BroadcastNestedLoopJoin only over bounded broadcast sides") {
    val offenders = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin")
        && !boundedBnlj(n) => n
    }
    assert(offenders.isEmpty, s"unexpected BNLJ in: $offenders")
  }

  test("temporal joins keep their linear plan shapes") {
    // as-of = union + ONE data shuffle (the window's hash partitioning)
    // + the final presentation sort; a third exchange means the operator
    // regressed into a join-based formulation
    for (q <- Seq("purchase_attribution", "next_error_after_purchase")) {
      val p = plans(q)
      assert(p.contains("Window") && p.contains("Union"), q)
      assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop"), q)
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges <= 2, s"$q has $exchanges exchanges:\n$p")
    }
    // range join must plan as a HASH equi-join on the bucket key; the
    // BETWEEN stays a post-filter, never the join strategy
    val rj = plans("errors_near_purchases")
    assert(rj.contains("HashJoin") && !rj.contains("NestedLoop"), rj)
  }

  test("round-5 query plans keep their intended shapes") {
    // canonicalization: a pure projection + presentation sort — no join,
    // no aggregate, at most the sort's range exchange
    val tn = plans("text_normalized")
    assert(!tn.contains("Join") && !tn.contains("Aggregate"), tn)
    // the quality gate report: no join (one scan -> one combined agg);
    // the single-partition exchange is the allowlisted 1-row agg
    val qf = plans("quality_filter_report")
    assert(!qf.contains("Join"), qf)
    assert(qf.contains("nfc_normalize") == false) // gate reads raw text
    // SCD2 history: one window over incident_id, no self-join
    val ih = plans("incident_history")
    assert(ih.contains("Window") && !ih.contains("Join"), ih)
    // BPE pair stats: top-n via TakeOrdered — per-partition heads, never
    // a global sort of the full pair table
    val bp = plans("bpe_top_pairs")
    assert(bp.contains("TakeOrdered"), bp)
    // PQ: the native query-side codec expression is IN the plan (the
    // HOF formulation would show aggregate/zip_with lambda nodes), and
    // since round 6 the ENCODE must NOT be — codes come from the
    // persisted index; re-encoding the corpus per query is a regression
    val pq = plans("ann_topk_pq")
    assert(pq.contains("pq_dist_tables"), pq)
    assert(!pq.contains("pq_encode"),
      s"ann_topk_pq must serve stored codes, not re-encode:\n$pq")
  }

  test("round-6 query plans keep their intended shapes") {
    // sequence packing: the running-sum window must hash-partition on
    // the sharded (lang:shard) stream key — a single-partition window
    // here would serialize whole-language streams (the scale ceiling
    // round 6 removed)
    val pp = plans("pack_plan")
    assert(pp.contains("Window"), pp)
    assert(!pp.contains("SinglePartition"),
      s"pack_plan window must not funnel to one partition:\n$pp")
    // hierarchical IVF: both centroid tables broadcast; the corpus must
    // never shuffle into a sort-merge join
    val ih = plans("ann_topk_ivf_hier")
    assert(ih.contains("BroadcastHashJoin")
      || ih.contains("BroadcastNestedLoopJoin"), ih)
    assert(!ih.contains("SortMergeJoin"), ih)
    // semantic decontam: benchmark broadcasts against the corpus scan;
    // the corpus side must never sort-merge
    val sd = plans("semantic_decontam")
    assert(sd.contains("BroadcastNestedLoopJoin"), sd)
    assert(!sd.contains("SortMergeJoin"), sd)
    // DSIR: the bucket feature table joins back by BROADCAST hash join
    // (buckets-row table), never by shuffling the position stream into
    // a sort-merge join
    val dw = plans("dsir_weights")
    assert(dw.contains("BroadcastHashJoin"), dw)
    assert(!dw.contains("SortMergeJoin"), dw)
    // cohort retention: user-keyed equi-joins only — no broadcast-loop
    // or cartesian fallback, no global sort before the final aggregate
    val cr = plans("cohort_retention")
    assert(!cr.contains("BroadcastNestedLoopJoin")
      && !cr.contains("CartesianProduct"), cr)
  }

  /** Exact per-query count of GLOBAL (partition-less) WindowExec nodes.
    * Each one funnels its input to a single partition, so every
    * allowlisted instance must sit over a bounded frame (a ≤k-row
    * top-k merge, a 1-row scalar attach, an O(days/hours/sources)
    * aggregate). Counts are pinned EXACTLY: a new global window — even
    * in a query that already has benign ones — fails this test instead
    * of hiding among the existing WindowExec warnings.
    */
  private def countGlobalWindows(
      p: org.apache.spark.sql.execution.SparkPlan): Int =
    p.collect {
      // AQE hides the real tree behind AdaptiveSparkPlanExec (no
      // children) — descend into its input plan explicitly
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        countGlobalWindows(a.inputPlan)
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => 1
    }.sum

  private lazy val globalWindowCounts: Map[String, Int] =
    physical.view.mapValues(countGlobalWindows).filter(_._2 > 0).toMap

  private val globalWindowAllowance: Map[String, Int] = Map(
    "agent_daily_decisions" -> 2, // streak windows over O(days) rows
    "bm25_served" -> 1,           // rank over the ≤topK merged pool
    "bm25_top_docs" -> 1,         // rank over the ≤topK merged pool
    "customer_value_ranks" -> 1,  // ranks over the ≤50-row top-k merge
    "hourly_anomalies" -> 2,      // rolling stats over O(hours) series
    "hybrid_mlt" -> 3,            // lex/vec/fused ranks, each ≤pool rows
    "more_like_this" -> 1,        // rank over the ≤topK merged pool
    "purchase_rank" -> 1,         // rank over the ≤TopK limited frame
    "schema_drift_report" -> 1,   // ordinal over O(distinct keys) rows
    "vocab_growth" -> 1,          // cum-sum over O(buckets) rows
    "epoch_plan" -> 1)            // prefix-sum over O(sources) rows

  test("global windows only where allowlisted, at pinned counts") {
    assert(globalWindowCounts == globalWindowAllowance,
      s"""global-window census changed.
         |unexpected: ${(globalWindowCounts.toSet -- globalWindowAllowance.toSet).toSeq.sorted}
         |missing:    ${(globalWindowAllowance.toSet -- globalWindowCounts.toSet).toSeq.sorted}""".stripMargin)
  }

  test("round-11 continuation plans keep their intended shapes") {
    // takedown audit: ONE column-pruned scan (doc_id + source only)
    // into one combined aggregate — no join, no window, no second scan
    val ta = plans("takedown_audit")
    assert(!ta.contains("Join") && !ta.contains("Window"), ta)
    assert(ta.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"audit must scan only doc_id+source:\n$ta")
    // zipf fit: the rank window partitions by source (vocabulary-sized
    // partitions, never a single-partition funnel of the token stream)
    val zf = plans("zipf_fit")
    assert(zf.contains("Window"), zf)
    // media near-dup: the fingerprint table must be served from the
    // persist barrier (decode-once across the self-join's two sides —
    // without it the codec subtree plans once PER side). The real
    // guard: the decode MapPartitions stage must not appear in the
    // query's own physical tree at all — it lives only inside the
    // cached relation the InMemoryTableScans read
    for (q <- Seq("image_near_dups", "audio_near_dups",
        "video_near_dups")) {
      val p = plans(q)
      assert(p.contains("InMemoryTableScan"),
        s"$q must read fingerprints from the persist barrier:\n$p")
      val decodeNodes = physical(q).collect {
        case n if n.getClass.getSimpleName.contains("MapPartitions") => n
      }
      assert(decodeNodes.isEmpty,
        s"$q plans the codec stage ${decodeNodes.size}× outside the " +
          s"persist barrier (decode would run per join side):\n$p")
    }
  }

  test("round-13 incremental media screen broadcasts the batch side") {
    // the per-ingest contract: batch bands BROADCAST against the
    // (index ∪ batch) band stream, so the stored side never shuffles —
    // a SortMergeJoin here would re-sort the whole index per ingest
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Tables(spark, Sf0001).documents
    val path = java.nio.file.Files
      .createTempDirectory("planfp").toString
    graft.ext.Multimodal.writeMediaFpIndex(docs, path)
    val p = graft.ext.Multimodal.mediaNearDupPairsIncremental(
        spark, path, c => pmod(c, lit(10L)) === lit(7L))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"batch bands must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the stored band stream must never sort-merge per ingest:\n$p")
  }

  test("broadcast joins carry the bounded dimension sides") {
    // the headline fact⋈dims rollups must broadcast, not shuffle, dims
    assert(plans("revenue_by_region").contains("BroadcastHashJoin"))
    assert(plans("q5_local_supplier").contains("BroadcastHashJoin"))
    // simhash signatures are a map-side projection (native simhash_sig):
    // the only exchanges in the near-dup plan are the key self-join's,
    // never a per-bit aggregate over exploded grams
    assert(plans("dedup_simhash").contains("simhash_sig"))
    assert(!plans("dedup_simhash").contains("posexplode"))
    // bloom screen: every position probe is a broadcast join against
    // the bit table — the corpus side shuffles only for the per-doc
    // aggregate, never for a per-gram one
    val bd = plans("bloom_decontam")
    assert(bd.contains("BroadcastHashJoin"), bd)
    assert(!bd.contains("SortMergeJoin"), bd)
  }
}
