package graft

import org.apache.spark.sql.execution.{FormattedMode, SimpleMode}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the properties that keep these queries fast
  * at 100 TB, pinned as assertions so a refactor can't silently lose
  * them (SURVEY §5 audit, round 3).
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(FormattedMode)

  /** Physical plan as the indented operator tree (one line per node). */
  private def tree(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(SimpleMode).linesIterator.toSeq

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan must prune unused columns")
  }

  test("q5_regional_join broadcasts every dimension") {
    val p = plan("q5_regional_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 5, p.take(2000))
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(plan("sort_topk_global").contains("TakeOrderedAndProject"))
  }

  test("per-group top-k gets WindowGroupLimit rank pushdown") {
    assert(plan("window_topk_per_group").contains("WindowGroupLimit"))
  }

  test("broadcast dim join has no shuffle on the fact side") {
    val p = plan("join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("ann brute force broadcasts the probe set") {
    assert(plan("ann_bruteforce_topk").contains("BroadcastNestedLoopJoin"))
  }

  test("ntile deciles rank via distributed range sort, not a global window") {
    val p = plan("window_ntile_decile")
    assert(p.contains("rangepartitioning"), "expected a range repartition of the data")
    assert(!p.contains("ntile("), "must not fall back to the single-partition global ntile")
  }

  test("ngram top-k gets WindowGroupLimit rank pushdown") {
    assert(plan("text_ngram_topk").contains("WindowGroupLimit"))
  }

  test("stratified sample scan prunes to the projected columns") {
    val p = plan("etl_stratified_sample")
    assert(p.contains("ReadSchema"), p.take(500))
    assert(!p.contains("text:string") && !p.contains("n_chars"),
      "sample scan must not read unprojected document columns")
  }

  test("decontamination broadcasts the eval index — the corpus side never shuffles for the flag join") {
    val p = plan("text_decontaminate")
    assert(p.contains("BroadcastHashJoin"), "eval shingle index must broadcast")
  }

  test("corpus-proportional broadcast hints are size-conditional (r16 guard, both sides)") {
    // at gate scale the conditional helper must still hint (the pin
    // above proves the resulting physical broadcast); past the
    // threshold it must return the frame UNHINTED so AQE decides —
    // proven here on the logical plan: a forced-zero limit yields no
    // UnresolvedHint/ResolvedHint node
    val df = Tables.documents(spark, sf).select(col("doc_id")).limit(5)
    def hasHint(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    assert(hasHint(Hints.broadcastIfBounded(spark, sf, df).queryExecution.logical),
      "under the limit the broadcast hint must be attached")
    assert(!hasHint(Hints.broadcastIfBounded(spark, sf, df, limit = 0L)
        .queryExecution.logical),
      "past the limit the frame must be unhinted (AQE decides)")
    // r17: the dedup audit-doc hints gate on DOC COUNT (the bound that
    // tracks a doc-id-list frame — a chars budget misses a duplicate-
    // dense small-doc corpus), pinned on both sides like the chars gate
    assert(hasHint(Hints.broadcastIfDocsBounded(spark, sf, df).queryExecution.logical),
      "under the doc limit the broadcast hint must be attached")
    assert(!hasHint(Hints.broadcastIfDocsBounded(spark, sf, df, limit = 0L)
        .queryExecution.logical),
      "past the doc limit the frame must be unhinted (AQE decides)")
  }

  test("semdedup assignment is in the scan and the pair join is a cid equi-join") {
    val p = plan("pipeline_semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair generation must stay a cid-keyed equi-join, never all-pairs")
  }

  test("graph family reads the materialized co-purchase index, not a fresh self-join") {
    // the round-10 shared-index contract: the lineitem self-join is
    // paid once per dir; every graph query scans the bucketed table
    // (graph_triangles moved to the shared triangle frame in r15 —
    // its edge-index read now happens inside that one-time build, so
    // clustering_coeff, whose degree leg still reads edges, stands in)
    Seq("graph_pagerank", "graph_katz", "graph_clustering_coeff").foreach { q =>
      assert(plan(q).contains("graft_copurchase"),
        s"$q must read the materialized edge index")
    }
  }

  test("triangle frame is materialized and shared (r15: one wedge enumeration per dir)") {
    // VERDICT r14 Next #2: graph_triangles and graph_clustering_coeff
    // each re-ran the oriented wedge join + semi-join close; both must
    // now read the bucketed graft_triangles table
    Seq("graph_triangles", "graph_clustering_coeff").foreach { q =>
      assert(plan(q).contains("graft_triangles"),
        s"$q must read the shared materialized triangle frame")
    }
  }

  test("minhash consumers read the materialized band table") {
    // (cluster_components ends at a checkpointed RDD scan, so its
    // final plan can't show the table — covered via minhash_lsh)
    Seq("dedup_minhash_lsh", "dedup_source_matrix").foreach { q =>
      assert(plan(q).contains("graft_bands"),
        s"$q must read the materialized band index")
    }
    // since r18 jaccard/containment read the df-CAPPED shingle index
    // (graft_shcap — derived once from graft_shingles60, bucketed on
    // shh), not the raw one: the hot-list aggregate + anti-join is
    // paid at build time, and the pair self-join reads co-bucketed
    // files with no exchange
    Seq("dedup_ngram_jaccard", "dedup_containment").foreach { q =>
      assert(plan(q).contains("graft_shcap"),
        s"$q must read the materialized df-capped shingle index")
    }
  }

  test("hier probe-query twins stay broadcast + equi-join shaped (r18)") {
    // the hier legs' scale contract: candidates come from the
    // (cid, fid) key equi-join against BROADCAST probe keys — never a
    // cartesian (the flat ann_reranked leg's whole-corpus ADC cross
    // join is exactly what these legs exist to replace past the
    // switch)
    Seq("ann_filtered_topk_hier", "ann_range_search_hier",
        "ann_reranked_hier").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q probe keys must broadcast")
      assert(!p.contains("CartesianProduct"), s"$q must never go pairwise")
    }
  }

  test("signature consumers read the materialized signature frame (r18)") {
    // the 16-agg MinHash signature build (corpus tokenize + hash) was
    // re-derived by each of 5 consumers; since r18 it is materialized
    // once per dir, bucketed on doc_id
    Seq("dedup_jaccard_approx", "dedup_minhash_accuracy").foreach { q =>
      assert(plan(q).contains("graft_sigs"),
        s"$q must read the materialized signature frame")
    }
  }

  test("containment twin decides on signatures and semi-join-prunes its audit (r15)") {
    // the bounded scale twin's contract: candidates from the
    // materialized band table (O(16) signature compare per pair), the
    // exact intersection only over the 1-in-8 audited docs via a
    // semi-join prune — never the full corpus shingle stream
    val p = plan("dedup_containment_approx")
    assert(p.contains("graft_bands"),
      "candidates must come from the materialized band index")
    assert(p.contains("LeftSemi"),
      "the audit's shingle probe must be semi-join-pruned to audited docs")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin(condition"),
      "no unkeyed joins in the twin")
  }

  test("salted mitigation operators really salt; audited plans stay broadcast (r15 decision pin)") {
    // SURVEY §5 round-15 product decision: no registered query meets
    // the measured salting trigger (shuffle join + unbroadcastable
    // build + hot key + AQE silent), so the mitigation ships as the
    // opt-in operators — pin BOTH that they actually implement it and
    // that the audit's representative broadcast plans stay broadcast
    assert(plan("join_skew_salted").contains("salt"),
      "join_skew_salted must join on the salt key")
    assert(plan("agg_salted_skew").contains("salt"),
      "agg_salted_skew must pre-aggregate on the salt key")
    Seq("q5_regional_join", "join_broadcast_dim").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q must keep its broadcast dims (the audit's qualifying shape)")
    }
  }

  test("substring family filters stop-windows through a semi-join before the self-join") {
    // the 100 TB lever: windows in > SubstringStopT docs drop via a
    // LeftSemi against the frequency table, bounding per-hash fan-out
    Seq("dedup_substring", "dedup_substring_attribution",
        "dedup_substring_mask").foreach { q =>
      assert(plan(q).contains("LeftSemi"),
        s"$q must semi-join the stop-window frequency table")
    }
    // same guard family: edit-distance hot blocks, simhash hot buckets
    Seq("dedup_edit_distance", "dedup_simhash").foreach { q =>
      assert(plan(q).contains("LeftSemi"),
        s"$q must semi-join its block/bucket-size cap table")
    }
  }

  test("token-budget family reads the materialized per-doc ntok table") {
    // the round-11 shared-index contract: the corpus tokenize +
    // distinct-word BPE encode is paid once per dir; the four
    // token-budget queries scan the bucketed (doc_id, counts) table
    Seq("text_pack_greedy", "text_bpe_tokenize",
        "text_tokenizer_fertility", "text_tokenizer_health").foreach { q =>
      assert(plan(q).contains("graft_ntok"),
        s"$q must read the materialized token-count table")
    }
  }

  test("triangle and link-prediction joins never degenerate to nested loops") {
    Seq("graph_triangles", "graph_link_predict").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q wedge/closure joins must be equi-joins")
    }
  }

  test("capped wedge family, cellcap pairs and components stay equi-join (r14 guards)") {
    // the hub guards must not change the JOIN STRATEGY — wedge caps and
    // the (degree,id) orientation are row filters/reorderings on top of
    // the same equi-join shape, and the capped candidate generator at
    // cap=8 runs the identical plan as the production-cap one
    Seq("graph_adamic_adar", "graph_reach_2hop", "graph_clustering_coeff",
      "vec_cellcap_pairs", "graph_components").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must stay equi-join under the r14 guards")
    }
  }

  test("greedy packing shuffles once — on the shard key") {
    val t = tree("text_pack_greedy")
    assert(t.count(_.contains("Exchange hashpartitioning")) == 1,
      "one groupBy(source) exchange is the whole shuffle budget")
  }

  test("language mix rebalance broadcasts its rate table") {
    val p = plan("etl_language_mix")
    assert(p.contains("BroadcastHashJoin"), "per-lang rates must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("audio resample plans as one scan with no shuffle") {
    val t = tree("mm_audio_resample")
    assert(!t.exists(_.contains("Exchange")),
      "codec walk must stay in the scan stage")
  }

  test("skew probe tops-k without a global sort; total rides a broadcast") {
    // the diagnostic you run BEFORE a 100 TB join must itself be cheap:
    // heavy-key top-10 via TakeOrderedAndProject, the 1-row total via
    // broadcast — never a full sort or a shuffled scalar join
    val p = plan("etl_skew_probe")
    assert(p.contains("TakeOrderedAndProject"), "top-10 must not global-sort")
    assert(p.contains("BroadcastNestedLoopJoin"), "1-row total must broadcast")
  }

  test("mixture plan joins the corpus total by broadcast") {
    val p = plan("etl_mixture_plan")
    assert(p.contains("BroadcastNestedLoopJoin"), "1-row total must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("seqlen profile is one map-side-combinable shuffle") {
    // tokenize + bit-length bucket are row-local; only the (source,
    // bucket) rollup may exchange — partial aggregation must sit below it
    val t = tree("text_seqlen_profile")
    assert(t.count(_.contains("Exchange")) == 1,
      "exactly one shuffle for the rollup")
    assert(t.exists(l => l.contains("HashAggregate") && l.contains("partial")),
      "rollup must combine map-side")
  }

  test("bloom prefilter injects might_contain into the fact side of the shuffle join") {
    // sideways information passing: the selective orders side must
    // build a runtime bloom filter that prunes lineitem AT THE SCAN,
    // before the exchange — and the join must actually be a shuffle
    // join (a broadcast would make the demo vacuous)
    val p = plan("join_bloom_prefilter")
    assert(p.contains("might_contain"), "runtime bloom filter must inject")
    assert(p.contains("SortMergeJoin"), "must exercise the shuffle-join path")
  }

  test("dup-ngram coverage joins on the shingle hash, never doc pairs") {
    val p = plan("text_dup_ngram_coverage")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      "coverage must come from shingle-hash equi-joins")
  }

  test("label propagation is equi-join + partial agg per round, never all-pairs") {
    val t = tree("graph_label_prop")
    assert(!t.exists(l => l.contains("CartesianProduct") ||
      l.contains("BroadcastNestedLoopJoin")))
    assert(t.exists(l => l.contains("HashAggregate") && l.contains("partial")),
      "vote counts must combine map-side")
  }

  test("kNN graph candidates come from the trained-cell self-join, never a cross product") {
    val t = tree("vec_knn_graph")
    assert(!t.exists(l => l.contains("CartesianProduct") ||
      l.contains("BroadcastNestedLoopJoin")),
      "kNN graph must block on IVF cells, not score all pairs")
  }

  test("multi-probe LSH broadcasts the expanded probe set; corpus side never sorts") {
    val p = plan("ann_multiprobe_lsh")
    assert(p.contains("BroadcastHashJoin"),
      "probe expansion must ride a broadcast onto the corpus bucket table")
  }

  test("audio VAD plans as one codec scan with zero shuffle") {
    val t = tree("mm_audio_vad")
    assert(!t.exists(_.contains("Exchange")),
      "VAD segment fold is per-doc inside the codec walk")
  }

  test("RGB histogram plans as one codec scan with zero shuffle") {
    val t = tree("mm_rgb_histogram")
    assert(!t.exists(_.contains("Exchange")),
      "histogram fold is per-image inside the codec walk")
  }

  test("DSIR models ride broadcasts onto the per-doc bucket counts") {
    val p = plan("text_dsir_weight")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1 ||
      "BroadcastNestedLoopJoin".r.findAllIn(p).size >= 1,
      "the 1024-row bucket model must broadcast, not shuffle the corpus")
  }

  test("column profiler prunes every leg's scan to its own column") {
    val p = plan("etl_profile_columns")
    // each single-column agg leg must read a one-column schema — a leg
    // scanning the full row width would make profiling cost 8x the table
    assert("ReadSchema: struct<l_orderkey:bigint>".r.findAllIn(p).size >= 1, p.take(1500))
    assert("ReadSchema: struct<l_returnflag:string>".r.findAllIn(p).size >= 1)
  }

  test("hashing-trick vectorization is one scan with no shuffle") {
    // hash + bucket-count fold are row-local: vectorization must run
    // at scan rate, never exchange
    val t = tree("text_hash_vectorize")
    assert(!t.exists(_.contains("Exchange")),
      "vectorization must stay in the scan stage")
  }

  test("RAG chunking plans as one scan with no shuffle") {
    // chunk manifest = sequence + posexplode + substr + md5, all
    // row-local: at 100 TB the chunker must run at scan rate
    val t = tree("text_chunk_sliding")
    assert(!t.exists(_.contains("Exchange")),
      "chunking must stay in the scan stage")
  }

  test("binary-Hamming ANN scans signatures, never a sorted join") {
    // corpus side is one scan producing an 8-byte signature per row;
    // the probe set rides a broadcast — no shuffle before the
    // per-probe shortlist window
    val p = plan("ann_binary_hamming")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "probe signatures must broadcast onto the corpus scan")
    assert(!p.contains("SortMergeJoin"))
  }

  test("ivf centroid assignment combines map-side — no exchange between cross-join and argmax") {
    // The partial max_by must sit DIRECTLY on the broadcast cross join:
    // each vector's C centroid scores collapse to one row before any
    // shuffle. A window/row_number formulation (or a lost partial agg)
    // would push all n*C rows through an Exchange first.
    val t = tree("ann_ivf_topk")
    val pi = t.indexWhere(_.contains("partial_max_by"))
    assert(pi >= 0, "assignment must be a partial max_by aggregate")
    val bi = t.indexWhere(_.contains("BroadcastNestedLoopJoin"), pi)
    assert(bi > pi, "partial max_by must be fed by the broadcast cross join")
    val between = t.slice(pi + 1, bi)
    assert(!between.exists(_.contains("Exchange hashpartitioning")),
      s"shuffle between cross-join and assignment argmax:\n${between.mkString("\n")}")
  }

  test("percent_rank ranks via distributed range sort, not a 3-partition window") {
    val t = tree("window_percent_rank")
    assert(t.exists(_.contains("rangepartitioning")),
      "expected a range repartition of the data")
    assert(!t.exists(_.contains("percent_rank(")),
      "must not fall back to the window percent_rank over a 3-value partition key")
  }

  test("incremental dedup joins the bucketed corpus index without shuffling it") {
    val t = tree("dedup_incremental")
    assert(t.exists(l => l.contains("Bucketed: true") && l.contains("graft_corpus_bands")),
      "corpus band index must be read as a bucketed table")
    // only the (small) batch side exchanges on the band key; the corpus
    // side's bucket layout IS its partitioning
    val bkExchanges = t.count(_.contains("Exchange hashpartitioning(bk"))
    assert(bkExchanges === 1,
      s"expected exactly the batch-side exchange on bk, found $bkExchanges")
  }

  test("max-concurrency sweep is range-partitioned — endpoints never funnel to one task") {
    // The endpoint stream scales with the event log (2 rows/session).
    // Pin the abc_pareto shape: a RangePartitioning exchange feeds the
    // data-sized window; the only SinglePartition consumers are the
    // <=32-row per-partition totals and scalar peak aggregates.
    val t = tree("events_max_concurrency")
    assert(t.exists(_.contains("Exchange rangepartitioning")),
      "sweep must range-repartition on the sweep order")
    // no Window may sit directly on a SinglePartition exchange over the
    // endpoint stream: every single-partition exchange in this plan must
    // carry an aggregate (totals/peak), which the tree prints as
    // Exchange SinglePartition feeding from a HashAggregate
    val winIdx = t.zipWithIndex.collect { case (l, i) if l.trim.startsWith("Window") => i }
    winIdx.foreach { i =>
      val below = t.drop(i + 1).take(3).mkString(" ")
      assert(!below.contains("Exchange SinglePartition") || below.contains("HashAggregate"),
        s"window at line $i rides a single-partition exchange over raw endpoints")
    }
  }

  test("grouped percentiles never buffer group values — two-pass bisect, no percentile agg") {
    // Spark's exact `percentile` holds EVERY group value in its
    // aggregation buffer (executor OOM on a hot group at 100 TB). Pin
    // that agg_percentiles plans as the histogram-bisect: no percentile
    // or collect_list aggregate anywhere, no global (unpartitioned)
    // window, and every window rides a group-partitioned exchange.
    val t = tree("agg_percentiles")
    assert(!t.exists(l => l.contains("percentile") || l.contains("collect_list")),
      "value-buffering aggregate crept back into the plan")
    assert(!t.exists(_.contains("Exchange SinglePartition")),
      "bisect must never move data to one partition")
  }

  test("winsorized mean and calibrated quality gate use the bisect, not percentile") {
    // Both operators moved off Spark's `percentile` aggregate in round
    // 9 (its buffer holds every group value — executor OOM on a hot
    // event_type/lang at 100 TB) onto GroupedPercentile.exact. Pin it.
    for (name <- Seq("agg_winsorized_mean", "text_quality_calibrated")) {
      val t = tree(name)
      assert(!t.exists(l => l.contains("percentile") || l.contains("collect_list")),
        s"$name: value-buffering aggregate crept back into the plan")
      assert(!t.exists(_.contains("Exchange SinglePartition")),
        s"$name: bisect must never move data to one partition")
    }
  }

  test("shingle index build is row-local: no token window shuffle") {
    // Round 9 moved shingle assembly into the native ShingleWindows
    // expression: the old posexplode + lead()-window build shuffled
    // EVERY token across the cluster just to line neighbors up — the
    // dominant cost of the whole MinHash/Jaccard family at 100 TB.
    // Pin that no Window operator appears in the index-building plans.
    for (name <- Seq("dedup_minhash_lsh", "dedup_ngram_jaccard", "text_shingle_novelty")) {
      val t = tree(name)
      assert(!t.exists(_.contains("Window")),
        s"$name: a window crept back into the shingle build")
    }
  }

  test("text_pack_greedy buffers at most one 4096-doc sub-shard per group") {
    // The greedy fold is sequential per group, so the group IS the
    // memory bound: pin that the collect_list aggregate keys include
    // the (doc_id div 4096) sub-shard, never whole-source groups whose
    // array would scale with corpus size.
    val t = tree("text_pack_greedy")
    val aggLines = t.filter(_.contains("collect_list"))
    assert(aggLines.nonEmpty, "expected the sub-shard collect_list fold")
    // Catalyst extracts the (doc_id div 4096) key into a project below
    // the agg as _groupingexpression; pin both halves.
    assert(aggLines.forall(l =>
        l.contains("div 4096") || l.contains("_groupingexpression")),
      s"collect_list no longer keyed by the 4096-doc sub-shard:\n${aggLines.mkString("\n")}")
    assert(t.exists(_.contains("div 4096")),
      "the 4096-doc sub-shard key vanished from the plan")
  }

  test("kmeans assignment is shuffle-free and the update agg is partial") {
    // Centroids ship as literals, so assignment must contain NO join
    // and NO exchange below the (cid, dim) aggregate; the update's only
    // shuffle carries the k*64 partially-combined rows.
    val t = tree("kmeans_train")
    assert(!t.exists(l => l.contains("Join") || l.contains("CartesianProduct")),
      "literal-centroid assignment must not plan a join")
    assert(t.exists(_.contains("partial_sum")), "update agg must be partial")
    val exchanges = t.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1,
      s"expected exactly the (cid, dim) update exchange, found $exchanges")
  }

  test("wav decode plans as one scan with no shuffle") {
    val t = tree("mm_wav_decode")
    assert(!t.exists(_.contains("Exchange")),
      "container decode is per-row work — any shuffle is a regression")
  }

  test("trained-IVF ANN never shuffles the corpus before the candidate join") {
    // assignment + probe-cell selection are literal-centroid arithmetic
    // in the scan; the only hashpartitioning exchange is the (small)
    // candidate set moving to the per-query top-k window
    val t = tree("ann_ivf_trained")
    assert(t.exists(_.contains("BroadcastHashJoin")), "candidates join must broadcast probes")
    val exchanges = t.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1,
      s"expected only the candidate top-k exchange, found $exchanges")
    assert(t.exists(_.contains("WindowGroupLimit")), "top-k must get rank pushdown")
  }

  test("interval-overlap join decomposes to a bucket equi-join, never a nested loop") {
    val t = tree("join_interval_overlap")
    assert(!t.exists(l => l.contains("NestedLoop") || l.contains("CartesianProduct")),
      "key-less interval join must bucketize, not theta-join")
  }

  test("runtime bloom filter injects on a selective shuffle join") {
    // The 100 TB lever AQE alone doesn't give: a selective dim filter
    // turns into a bloom filter applied at the FACT scan, so filtered
    // rows never reach the shuffle. Thresholds are tuned down because
    // sf0.001 is below the defaults; the pinned property — Spark 4's
    // InjectRuntimeFilter fires for this plan shape — is what holds at
    // real scale with the default thresholds.
    import org.apache.spark.sql.functions._
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> c.get(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle join
      val l = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val p = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
        .queryExecution.explainString(SimpleMode)
      assert(p.contains("might_contain"),
        s"runtime bloom filter did not inject:\n${p.take(1500)}")
    } finally saved.foreach { case (k, v) => c.set(k, v) }
  }

  test("etl_partition_prune resolves the day filter against partition metadata") {
    val p = plan("etl_partition_prune")
    assert(p.contains("PartitionFilters: [isnotnull(di"),
      s"day filter must prune partitions, not rows:\n${p.take(1500)}")
    assert(p.contains("(di#") && p.contains(">= 19725"),
      s"range predicate missing from partition filters:\n${p.take(1500)}")
  }

  test("etl_bucketed_join reads co-located buckets — only the final agg shuffles") {
    val c = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> c.get(k))
    try {
      c.set("spark.sql.adaptive.enabled", "false")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("etl_bucketed_join")
      assert("Bucketed: true".r.findAllIn(p).size == 2,
        s"both scans must read the bucket layout:\n${p.take(2000)}")
      val ex = "hashpartitioning\\(([a-z_]+)".r.findAllMatchIn(p).toSeq
      assert(ex.map(_.group(1)) == Seq("o_orderstatus"),
        s"join keys must not shuffle (bucketing is the shuffle): ${ex.map(_.group(1))}")
    } finally saved.foreach { case (k, v) => c.set(k, v) }
  }

  test("partitioned sink output gets partition pruning on read") {
    import org.apache.spark.sql.functions.col
    // materialize the partitioned layout once
    SparkEntry.queries("etl_sink_roundtrip")(spark, sf).queryExecution.toRdd.count()
    val dir = etl.TmpDirs.dir(s"sinkrt_${etl.Bucketing.dirTag(sf)}")
    val p = spark.read.parquet(dir).filter(col("source") === "src3")
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters: [isnotnull(source"), p.take(1500))
  }

  test("q19 pushes each table's slice of the OR-of-ANDs into its scan") {
    val p = plan("q19_disjunctive_brackets")
    // lineitem scan gets the quantity-range disjunction…
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0),LessThanOrEqual(l_quantity,11.0)"),
      s"quantity brackets not pushed:\n${p.take(2000)}")
    // …and the part scan gets the brand/size disjunction + the common
    // p_size >= 1 conjunct extracted from the brackets
    assert(p.contains("EqualTo(p_brand,Brand#12),LessThanOrEqual(p_size,5)"),
      s"brand/size brackets not pushed:\n${p.take(2000)}")
    assert(p.contains("GreaterThanOrEqual(p_size,1)"),
      "common conjunct not extracted from the disjunction")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      "part must broadcast")
  }

  test("ahash near-dup joins banded hash keys, never all-pairs") {
    val p = plan("mm_ahash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be an equi-join:\n${p.take(2000)}")
  }

  test("q10 ranks returned-item revenue via TakeOrdered, dims broadcast") {
    val p = plan("q10_returned_items")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not global-sort")
    assert(p.contains("BroadcastHashJoin"), "nation must broadcast")
  }

  test("q6 pushes every predicate into the scan and never joins") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      p.contains("LessThan(l_quantity,24.0)"),
      s"predicates not pushed:\n${p.take(1500)}")
    assert(!p.contains("Join"), "Q6 has no join")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      "agg must be partial")
  }

  test("pagerank message passing is equi-join + partial agg, never all-pairs") {
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct"),
      s"message passing must stay an equi-join:\n${p.take(2000)}")
    // rank updates (edges ⋈ contrib, deg ⋈ inSum) must be equi-joins
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "rank updates must be equi-joins")
    // the ONLY nested-loop joins are the 1-row teleport-constant
    // attaches (GraphEdges.withScalars): initial ranks + one per
    // iteration — constant work per probe row, NOT a pair explosion
    val t = tree("graph_pagerank")
    assert(t.count(_.contains("BroadcastNestedLoopJoin")) <= 3,
      s"only 1-row scalar attaches may broadcast-nest:\n${t.mkString("\n")}")
  }

  test("media curation never degenerates to a cartesian candidate join") {
    val p = plan("pipeline_media_curation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band join must stay an equi-join:\n${p.take(2000)}")
  }

  test("bm25 top-k plans as TakeOrdered, stats ride broadcast joins") {
    val p = plan("text_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), "top-k must never globally sort")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "df/corpus stats must broadcast, not shuffle the scoring side")
  }

  test("abc_pareto's data-sized window is partitioned; only totals see one partition") {
    val p = plan("abc_pareto")
    // the cumulative over parts must be partitioned by pid (distributed);
    // the only unpartitioned window may touch the <=32 per-partition totals
    assert(p.contains("windowspecdefinition(pid"),
      "per-part cumulative must run inside range partitions")
  }

  test("two-pass median sorts only inside target buckets, never globally") {
    val t = tree("agg_exact_median_2pass")
    // every Sort in the plan is either window-local (bkt-partitioned) or
    // over the tiny histogram — a global Sort of cents would show as a
    // Sort above the scan with a range Exchange under it
    assert(!t.exists(l => l.contains("Exchange rangepartitioning(cents")),
      "no range-sort of the full column")
  }

  test("hybrid RRF ranks shortlists: both sides reach the fusion via TakeOrdered") {
    val p = plan("ann_hybrid_rrf")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      "both rankings must shortlist before the global rank window")
  }

  test("ann_ivf_pq: corpus codes join broadcast probes, never a sort-merge") {
    val p = plan("ann_ivf_pq")
    // the corpus side is cid + 8 code nibbles computed in the scan; the
    // only data movement is the cell equi-join against the broadcast
    // probe/ADC table — a SortMergeJoin here would shuffle the corpus
    assert(p.contains("BroadcastHashJoin"), "probe table must broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle for the cell join")
  }

  test("events_cusum broadcasts the per-type totals onto the daily series") {
    val p = plan("events_cusum")
    assert(p.contains("BroadcastHashJoin"), "|types|-row totals must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("bloom manifest probes broadcast against the bit table") {
    assert(plan("etl_bloom_manifest").contains("BroadcastHashJoin"))
  }

  test("vec_rp_project projects row-locally: one scan, one histogram exchange") {
    val t = tree("vec_rp_project")
    // the 1024-term affine map must stay in the scan's project — the
    // only shuffles are the <=20-bucket histogram agg and its ~20-row
    // total; an explode/join formulation would add a vectors-sized one
    assert(t.count(_.contains("Exchange")) <= 2,
      "projection must not shuffle the vector set:\n" + t.mkString("\n"))
    assert(!t.exists(_.contains("Generate")), "no explode in the projection")
  }

  test("hour-dow profile is one partial agg plus a broadcast total") {
    val p = plan("events_hour_dow_profile")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the 1-row total must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("source matrix attaches sources via its banded candidate join, no all-pairs") {
    val p = plan("dedup_source_matrix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must stay a band equi-join")
  }

  test("silhouette distances ride a broadcast centroid table, no vector pairs") {
    val p = plan("vec_simplified_silhouette")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the |labels|x64 centroid table must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "no vector-vector pair join may appear")
  }

  test("source JSD pairs fan out from the term equi-join, never a cross join") {
    val p = plan("text_source_jsd")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair generation must stay keyed on the term")
  }

  test("quarantine router is map-only: no exchange at all") {
    val t = tree("etl_quarantine_split")
    assert(!t.exists(_.contains("Exchange")),
      "row routing must not shuffle:\n" + t.mkString("\n"))
  }

  test("vocab cutoff curve explodes the vocabulary-sized count table, not tokens") {
    // Two Generates: the token explode (feeds the term-count agg) and
    // the x7 cutoff explode. The cutoff one must sit ABOVE the
    // term-count shuffle — i.e. an Exchange separates them — so the
    // fan-out multiplies vocab rows, not corpus tokens.
    val t = tree("text_vocab_cutoffs")
    val gi = t.indexWhere(_.contains("Generate"))
    val gj = t.lastIndexWhere(_.contains("Generate"))
    assert(gi >= 0 && gj > gi, "expected two Generate nodes:\n" + t.mkString("\n"))
    assert(t.slice(gi, gj).exists(_.contains("Exchange")),
      "cutoff explode must run above the term-count agg:\n" + t.mkString("\n"))
  }

  test("katz iterations stay equi-joins + partial aggs, no pair explosion") {
    val p = plan("graph_katz")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("page-hinkley windows partition by event_type") {
    assert(plan("events_page_hinkley").contains("windowspecdefinition(event_type"))
  }

  test("knn hubness reuses the trained-cell candidate join, no all-pairs") {
    val p = plan("vec_knn_hubness")
    assert(!p.contains("CartesianProduct"),
      "candidates must come from the IVF-cell equi-join")
  }

  test("ship-lag SLOs never buffer values: no Percentile aggregate in the plan") {
    val p = plan("orders_ship_lag_sla")
    assert(!p.contains("percentile"),
      "quantiles must come from the histogram-bisect two-pass")
  }

  test("PSI per-half totals ride broadcasts onto the bin pivot") {
    val p = plan("events_psi_drift")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("held-out perplexity joins on the (source, term) key only") {
    val p = plan("text_heldout_perplexity")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup impact and band calibration stay equi-join shaped") {
    assert(!plan("pipeline_dedup_impact").contains("CartesianProduct"))
    assert(!plan("dedup_band_calibration").contains("CartesianProduct"))
  }

  /** The rank/ECDF windows of the hypothesis tests must consume a
    * value-level (or cell-level) AGGREGATE, never fact rows: the
    * single-partition window is then dimension-sized (<= distinct
    * values) no matter the fact size. In the SimpleMode tree the
    * window's input prints below it, so an upstream fold shows as a
    * HashAggregate line after the first Window line.
    */
  private def windowFedByAggregate(name: String): org.scalatest.Assertion = {
    val t = tree(name)
    val wi = t.indexWhere(_.contains("Window"))
    assert(wi >= 0, s"$name: expected a window in the plan")
    assert(t.drop(wi).exists(_.contains("HashAggregate")),
      s"$name: the window must run over an aggregated value table, not fact rows")
  }

  test("rank-sum, KS, and chi-square windows run over value-level folds") {
    windowFedByAggregate("agg_mannwhitney")
    windowFedByAggregate("agg_ks_test")
    windowFedByAggregate("agg_chisq_independence")
  }

  test("rolling correlation windows the calendar-day series, not fact rows") {
    windowFedByAggregate("window_rolling_corr")
  }

  test("welch t-test is pure aggregation: no window, no join") {
    val p = plan("agg_welch_ttest")
    assert(!p.contains("Window") && !p.contains("Join"), p.take(1500))
  }

  test("mmr stages only ever touch shortlist-keyed equi-joins past the scan") {
    // The corpus appears once (the shortlist scoring pass, a broadcast
    // NL against the 10 probes); every greedy stage after it joins on
    // qid/vec_id — an unkeyed pair join here would be quadratic in the
    // corpus instead of the 20-row shortlist.
    val p = plan("ann_mmr_diversify")
    assert(!p.contains("CartesianProduct"))
    // The scoring pass's broadcast NL prints once per reuse of the
    // cached shortlist; the property that matters is that every reuse
    // IS the cache (InMemoryTableScan), not a recomputed corpus scan.
    assert(p.contains("InMemoryTableScan"),
      "greedy stages must reuse the cached shortlist, not rescan the corpus")
  }

  test("nprobe curve candidates come from the cell equi-join, widths from a literal explode") {
    val p = plan("ann_nprobe_recall_curve")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), "probe cells must broadcast")
  }

  test("residual quantize encodes in the scan: no join, no shuffle") {
    val p = plan("vec_residual_quantize")
    assert(!p.contains("Join") && !p.contains("Exchange"), p.take(1500))
  }

  test("image entropy is explode + two partial aggs, no joins") {
    assert(!plan("mm_image_entropy").contains("Join"))
  }

  test("fk orphan audit broadcasts every dimension parent") {
    val p = plan("etl_fk_orphans")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      "part/supplier/customer/documents parents must broadcast")
  }

  test("funnel lag percentiles never buffer values; length gini windows the value fold") {
    assert(!plan("events_funnel_lag_percentiles").contains("percentile"),
      "quantiles must come from the histogram-bisect two-pass")
    windowFedByAggregate("text_length_gini")
  }

  test("eval sampler gets WindowGroupLimit pushdown on the stratum window") {
    assert(plan("etl_eval_sample").contains("WindowGroupLimit"))
  }

  test("poisson rate test broadcasts the scalar midpoint") {
    val p = plan("agg_poisson_rate_test")
    assert(p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("disorder profile never buffers values; media gates are join-free") {
    assert(!plan("events_disorder_profile").contains("percentile"),
      "lateness quantiles must come from the histogram-bisect two-pass")
    assert(!plan("mm_audio_snr").contains("Join"))
    assert(!plan("mm_image_quantize_palette").contains("Join"))
  }

  test("rank correlations run on the cell fold: midranks broadcast, pair join bounded") {
    windowFedByAggregate("agg_spearman_corr")
    val p = plan("agg_kendall_tau")
    // the concordance join is an inequality join over the ~550-cell
    // contingency — a nested loop over CELLS is constant-size at any
    // fact volume; what must never appear is a join over raw rows
    assert(p.contains("HashAggregate"), "cells must fold before the pair join")
  }

  test("window funnel stages join on the user key, ratio CI is pure aggregation") {
    val p = plan("events_window_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "funnel stages must stay user-keyed equi-joins")
    assert(!plan("agg_ratio_delta_method").contains("Join"))
  }

  test("late-wave ops keep the shared shapes: no value buffers, no stray pair joins") {
    assert(!plan("text_bitext_mine").contains("CartesianProduct"),
      "bitext candidates must come from the IVF-cell equi-join")
    for (q <- Seq("agg_runs_test", "events_quantile_calibration", "agg_trimmed_mean"))
      assert(!plan(q).contains("percentile"),
        s"$q: quantiles must come from the histogram-bisect two-pass")
    for (q <- Seq("orders_gmv_mix", "supplier_single_source")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
        s"$q: the part dim must broadcast")
    }
    windowFedByAggregate("events_error_budget_burn")
    assert(plan("orders_trend_mann_kendall").contains("HashAggregate"),
      "months must fold before the pairwise-sign join")
  }

  test("xyz classes broadcast the part dim, gap percentiles never buffer values") {
    val px = plan("part_xyz_class")
    assert(px.contains("BroadcastHashJoin") && !px.contains("SortMergeJoin"))
    assert(!plan("events_gap_percentiles").contains("percentile"),
      "quantiles must come from the histogram-bisect two-pass")
  }
}
