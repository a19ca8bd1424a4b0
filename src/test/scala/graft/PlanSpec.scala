package graft

/** Physical-plan shape assertions: the plans that make these queries scale
  * are part of the contract, not an accident. If Catalyst stops choosing
  * them (regression, config drift), these specs fail.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q1 top-K plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("q1_topk_by_time").contains("TakeOrderedAndProject"))
  }

  test("q2 priority listing: capped top-K (TakeOrderedAndProject), filter before the fold output, no global sort") {
    // The serving-edge scale argument (SignalStore.listByPriority): the
    // MaxPageSize'd orderBy(id).limit must plan as TakeOrderedAndProject —
    // each partition keeps a local top-K, the driver merges — never a
    // global Sort of the priority set; and the LWW fold underneath stays
    // a two-phase (map-side partial) aggregate even with the filter and
    // limit stacked on top.
    val p = plan("q2_filter_by_priority")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the SortAggregate fold's intra-partition sorts are global=false;
    // what must never appear is a global (true) Sort of the priority set
    assert(!"""Arguments: \[[^\]]*\], true,""".r.findFirstIn(p).isDefined,
      s"q2 must not plan a global sort:\n$p")
    assert("(?s)partial_max_by|HashAggregate.*max_by.*HashAggregate.*max_by".r
      .findFirstIn(p).isDefined, p)
    // the equality filter runs as a Filter over the folded rows (priority
    // is derived post-fold, so scan-level pushdown is impossible by
    // construction — the pin is that it still precedes the top-K, i.e.
    // the limit never sees non-matching rows)
    assert("(?s)TakeOrderedAndProject.*Filter".r.findFirstIn(p).isDefined, p)
  }

  test("a4 filters are pushed down to the parquet scan") {
    val p = plan("a4_filter_sum")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("a4 scan prunes to only the referenced columns") {
    val p = plan("a4_filter_sum")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_orderkey"), readSchema)
  }

  test("e15 pushes the metadata predicate into the embeddings scan") {
    val p = plan("e15_filtered_knn")
    // pre-filtering: the scan itself carries the vec_id pushdown (the
    // label % 3 derived predicate folds to a Filter directly over the
    // scan — no exchange between them), and the top-K is
    // TakeOrderedAndProject, never a global sort.
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("Not(EqualTo(vec_id,0))"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("a3 star join broadcasts the dimension tables") {
    val p = plan("a3_regional_join")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("p3 LWW fold is a two-phase hash aggregate (map-side partial)") {
    val p = plan("p3_lww_upsert")
    assert("(?s)partial_max_by|HashAggregate.*max_by.*HashAggregate.*max_by".r
      .findFirstIn(p).isDefined, p)
  }

  test("a10 semi/anti joins plan as semi/anti, not row-multiplying joins") {
    val p = plan("a10_semi_anti")
    assert(p.contains("LeftSemi"))
    assert(p.contains("LeftAnti"))
  }

  test("e2 fused cosine expression runs inside the scan stage (codegen)") {
    val p = plan("e2_knn_expr")
    assert(p.contains("cosine_similarity"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("IVF assign is a pure projection: no Exchange, no join, no row multiplication") {
    val emb = Tables(spark, sf("sf0.001"), "embeddings")
    val centroids = Array.fill(4)(Array.fill(64)(0.1f))
    val p = graft.operators.IvfIndex.assign(emb, centroids)
      .queryExecution.executedPlan.toString
    assert(p.contains("nearest_centroid"), p)
    assert(!p.contains("Exchange"), s"assign must not shuffle:\n$p")
    assert(!p.contains("Join"), s"assign must not join:\n$p")
  }

  test("d6 LSH near-dup plans as an equi hash join, never a nested loop") {
    val p = plan("d6_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("a24 binned range join plans as an equi join, never a nested loop") {
    val p = plan("a24_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("d2 minhash shuffles only band minima (partial agg before exchange)") {
    val p = plan("d2_minhash_signatures")
    assert(p.contains("shingle_hashes"), p)
    assert("(?s)partial_min|HashAggregate.*min.*Exchange".r.findFirstIn(p).isDefined, p)
  }

  test("e8 SQ8 KNN is one corpus pass: broadcasts + TakeOrderedAndProject, no shuffle join") {
    val p = plan("e8_sq_knn")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("e8 scores through the fused sq8_cosine expression (compiled, not HOF lambdas)") {
    val p = plan("e8_sq_knn")
    assert(p.contains("sq8_cosine"), p)
    // the per-row interpreted decode (transform over an index sequence) is
    // gone from the corpus scan; the only remaining lambdas are in the
    // one-row (lo, hi) stats aggregate, which is not the hot path
    assert(!p.contains("transform(sequence"), p)
  }

  test("e4 dedups AFTER scoring: no exchange carries an embedding column") {
    // The d6-proven ordering (score -> dedup on the narrow projection):
    // e4's only shuffle is the vec_id dedup, and its rows must be
    // (vec_id, cos_sim) — never the two 64-float embeddings
    // (~16 bytes/candidate vs ~520).
    val p = plan("e4_knn_lsh")
    val exchangeInputs = """\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, p)
    exchangeInputs.foreach { cols =>
      assert(!cols.contains("embedding") && !cols.contains("qe"),
        s"shuffle exchange carries a wide embedding column: [$cols]")
    }
  }

  test("t9 TF-IDF windows partition by doc_id (no global window)") {
    val p = plan("t9_tfidf_top_term")
    assert("windowspecdefinition\\(doc_id#\\d+L?,".r.findFirstIn(p).isDefined, p)
    // the only single-partition stage is the one-row corpus count (N)
    assert("SinglePartition".r.findAllIn(p).size === 1, p)
  }

  test("a25 grouping sets plan as one Expand feeding a two-phase aggregate") {
    val p = plan("a25_grouping_sets")
    assert(p.contains("Expand"), p)
    assert("(?s)partial_count|HashAggregate.*Exchange.*HashAggregate".r
      .findFirstIn(p).isDefined, p)
  }

  test("d8 decontamination broadcasts the benchmark grams (corpus never shuffles raw grams)") {
    val p = plan("d8_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("shingle_hashes"), p)
  }

  test("x1 mixture sampling is scan -> project -> filter: no join, no aggregate") {
    val p = plan("x1_mixture_sample")
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("x8 DSIR: bucket model broadcast back, partial aggs, no window, no sort-merge join") {
    val p = plan("x8_dsir_sample")
    // the B-row model (and its totals) joins back by broadcast — the
    // corpus-sized occurrence frame must never shuffle on the bucket key
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // both count models and the per-doc fold are two-phase (map-side
    // combine absorbs hot buckets before any exchange)
    assert(p.contains("partial_count"), p)
    // no window function anywhere: scoring is projection + aggregation
    assert(!p.contains("Window"), p)
  }

  test("x2 packing windows partition by bucket; only the tiny totals frame is single-partition") {
    val p = plan("x2_pack_sequences")
    // the corpus-wide running sum must be keyed by the prefix bucket...
    assert("windowspecdefinition\\(pbucket#\\d+L?, doc_id".r.findFirstIn(p).isDefined, p)
    // ...and the only single-partition stage is the bucket-totals window,
    // fed by a two-phase aggregate that collapsed the corpus first
    assert("SinglePartition".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_sum"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x3 stratified rank: windows partition by (stratum, rank bucket), offsets broadcast") {
    val p = plan("x3_stratified_exact")
    // the corpus-side rank window must be keyed by (lang, rbucket) — a
    // whole-stratum window (the oracle's shape) would sort a stratum in
    // one task
    assert("windowspecdefinition\\(lang#\\d+, rbucket#\\d+,".r.findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t12 bigram counting is a two-phase aggregate; the freq join is never a cartesian") {
    val p = plan("t12_bigram_novelty")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d10 keep-best is a partial-aggregated argmax, not a per-cluster window sort") {
    val p = plan("d10_cluster_keep_best")
    assert(p.contains("partial_max_by"), p)
    assert(!p.contains("windowspecdefinition(cluster"), p)
  }

  test("a29 heavy hitters: per-key counts materialized once, totals broadcast as a 1-row side") {
    // The per-key aggregate is eagerly checkpointed (single corpus scan,
    // GC-owned blocks), so the final plan reads the materialized RDD —
    // never the events table — and broadcasts the 1-row totals back.
    val p = plan("a29_heavy_hitters")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.toLowerCase.contains("parquet"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t18 BPE application is a pure per-row projection: no join, no aggregate") {
    // Training collects run eagerly before the returned plan; application
    // itself must stay a map over the corpus (the production tokenizer
    // pass) — any Join/HashAggregate here means the merges leaked into
    // the per-row path.
    val p = plan("t18_bpe_apply")
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("a43 quantile sketch: typed bounded aggregate with partial merge, no window") {
    val p = plan("a43_sketch_quantiles")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("x4 epoch shuffle: windows partition by shard (no global sort of the corpus)") {
    val p = plan("x4_epoch_shuffle")
    assert(p.contains("windowspecdefinition(shard"), p)
    assert(!p.contains("windowspecdefinition()"), p)
  }

  test("x5 upsampling is scan -> project -> filter -> explode: no join, no aggregate") {
    val p = plan("x5_repeat_upsample")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("d12 semdedup: cluster equi-join + broadcast anti keep-filter, no nested loop") {
    val p = plan("d12_semdedup")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d13 winnow pairs: two-phase aggregates, equi joins only") {
    val p = plan("d13_winnow_pairs")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("e9 batch KNN bounds candidates in a partial aggregate, not a window sort") {
    val p = plan("e9_knn_batch")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("pipeline3 semantic curation: equi joins only, no nested loop, no cartesian") {
    val p = plan("pipeline3_semantic")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sql2 Q8 star: every dimension broadcasts, lineitem streams, p_type pushed down") {
    val p = plan("sql2_market_share")
    assert(p.contains("BroadcastHashJoin"), p)
    // at sf0.001 statistics make every join side broadcastable; the pin is
    // that Catalyst never falls back to a shuffle or nested-loop join for
    // the comma-join syntax
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("EqualTo(p_type,PROMO)"), p)
  }

  test("a35 SCD2: both windows share one exchange+sort (lag filter preserves partitioning)") {
    val p = plan("a35_scd2_intervals")
    // node (a): the user_id window exchange; node (b): the final orderBy
    // range partition — nothing else may shuffle
    assert("""\) Exchange""".r.findAllIn(p).size === 2, p)
    assert("""\) Window""".r.findAllIn(p).size === 2, p)
    assert("""\) Sort""".r.findAllIn(p).size === 2, p)
  }

  test("a42 gapfill: grid is generate-side (Explode), fill window partitions by user") {
    val p = plan("a42_daily_gapfill")
    assert(p.contains("Generate"), p)
    assert("windowspecdefinition\\(user_id#\\d+L".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("a40 gini: both stacked aggs are partial+final — no shuffle moves raw events") {
    val p = plan("a40_gini_diversity")
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("Join"), p)
  }

  test("a41 unpivot: stack is a per-row Generate — no join, no extra shuffle") {
    val p = plan("a41_unpivot")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Join"), p)
  }

  test("a39 transitions: one user window, totals broadcast, no cartesian") {
    val p = plan("a39_markov_transitions")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t16 chi-squared: rank window partitions by lang, margins broadcast") {
    val p = plan("t16_distinctive_terms")
    assert("windowspecdefinition\\(lang#\\d+,".r.findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t15 chunking: scan -> explode -> project, no shuffle before the output sort") {
    val p = plan("t15_chunking")
    assert("""\) Exchange""".r.findAllIn(p).size === 1, p) // output orderBy only
    assert(p.contains("Generate"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("a38 outliers: per-type moments broadcast back, no sort-merge join") {
    val p = plan("a38_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("e10 trained-assignment serve plan: pure projection, no join, one output sort") {
    // training jobs run eagerly at construction; the RETURNED plan is the
    // index-build assignment — per-row distances against driver-resident
    // centroids, so the only exchange is the output orderBy
    val p = plan("e10_kmeans_train")
    assert("""\) Exchange""".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("a36 attribution: the collapse agg reuses the window's user_id partitioning") {
    val p = plan("a36_attribution")
    // window exchange + output orderBy only — the groupBy(user_id, ...)
    // must NOT re-shuffle (HashPartitioning(user_id) satisfies the
    // grouping's clustered distribution)
    assert("""\) Exchange""".r.findAllIn(p).size === 2, p)
    assert(p.contains("partial_count"), p)
  }

  test("a37 correlation: all six moments in ONE two-phase aggregate pass") {
    val p = plan("a37_correlation")
    assert("""\) Exchange""".r.findAllIn(p).size === 2, p) // agg + output orderBy
    assert("""\) HashAggregate""".r.findAllIn(p).size === 2, p)
    assert(p.contains("partial_sum((x#"), p)
  }

  test("a34 deciles: rank windows partition by (lang, band), offsets broadcast back") {
    val p = plan("a34_quality_deciles")
    // the data-sized window must be keyed by (lang, band) — a whole-
    // language window (the oracle's shape) would sort a language in one
    // task; the only single-partition work is the tiny (lang, band)
    // count frame's running offsets
    assert("windowspecdefinition\\(lang#\\d+, band#\\d+L?,".r.findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("a32 funnel stages: partial min-agg per slice, prior stage broadcast, no cartesian") {
    val p = plan("a32_funnel")
    assert(p.contains("partial_min"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("a33 retention: two-phase distinct + first-day broadcast back, no cartesian") {
    val p = plan("a33_retention")
    assert(p.contains("partial_min"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t14 BM25 bounds top-10 per term BEFORE the window exchange (WindowGroupLimit)") {
    val p = plan("t14_bm25_topk")
    // rank<=10 is pushed into a partial WindowGroupLimit ahead of the
    // exchange, so the shuffle carries ≤10 rows per (partition, term),
    // and the query-term selection is TakeOrderedAndProject, never a
    // global window over the vocabulary
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d9 Bloom probe is a pure map pass: no join, no aggregate, one final sort") {
    // d8's broadcast join is replaced by an m-bit literal bitmap + the
    // compiled BloomHits probe: the corpus side must plan as
    // scan -> project -> filter with NO join operator of any kind and no
    // aggregation — the only exchange is the output orderBy. That plan
    // shape (not the constants) is the whole point of the operator.
    val p = plan("d9_bloom_decontaminate")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Aggregate"), p)
    assert(p.contains("bloom_hits"), p)
  }

  test("d14 substring runs: compiled window hashes, hash-keyed join, pair-bounded islands window") {
    val p = plan("d14_substring_runs")
    // windows come from the compiled positional kernel (no HOF lambda),
    // pairs from an equi-join on the window hash — never a cartesian;
    // the islands window is partitioned (per doc-pair diagonal), never
    // a global single-partition sort of the corpus
    assert(p.contains("shingle_hashes_bag"), p)
    assert(!p.contains("LambdaFunction"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("windowspecdefinition(doc_a#"), p)
  }

  test("e11 hybrid RRF: both rankers bound their lists before the fusion join") {
    val p = plan("e11_hybrid_rrf")
    // dense + sparse each end in TakeOrderedAndProject(limit=50) before
    // ranks are assigned, so the fusion outer join touches <= 2K rows;
    // the single query vector and the 5 qterms broadcast
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("LambdaFunction"), p)
  }

  test("pipeline4: composing the gates adds no corpus-sized join beyond d14's own") {
    val p = plan("pipeline4_decontam")
    // the Bloom gate is a map pass (bloom_hits, no join of its own), the
    // run-drop set and rate table join back small — nothing plans as a
    // cartesian, and the temperature rates broadcast
    assert(p.contains("bloom_hits"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x6 temperature sampling: derived rate table broadcasts back, corpus is one filtered pass") {
    val p = plan("x6_temperature_sample")
    // the ≤languages-row rate table (two-phase count + 1-row min side)
    // broadcasts back onto the corpus scan — the corpus itself never
    // shuffles for a sampling decision
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("e5/e17 serve from the cid-partitioned inverted-list copy: probe filter prunes partitions") {
    // The IVF scale contract made physical (IvfIndex.servingCopy): the
    // serving plan's cid IN (probes) predicate must appear as a
    // directory-level PartitionFilter on the partitioned copy — the scan
    // READS ~nprobe/k of the corpus — never as a post-scan filter over a
    // full corpus scan. Pinned on the queries' ACTUAL plans, not a
    // mechanism demo (that is PartitionPruningSpec's job).
    Seq("e5_ivf_knn", "e17_ivfpq_knn").foreach { name =>
      val p = plan(name)
      assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p).isDefined,
        s"$name must prune by cid at the directory level:\n$p")
    }
  }

  test("x11 shard balance: rank offsets broadcast back, no corpus sort-merge") {
    val p = plan("x11_shard_balance")
    // the global desc rank must stay two-level: the bounded histogram's
    // offsets broadcast onto the corpus (never a sort-merge exchange of
    // the docs), and the only SinglePartition exchange is the one over
    // the histogram — the corpus-sized stage is the PARTITIONED
    // within-length-class window
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("SinglePartition".r.findAllIn(p).size === 1, p)
  }

  test("e19 IVF append audit: the census computes once — no parquet scan in the serve plan") {
    val p = plan("e19_ivf_append")
    // the k-row census is localCheckpoint-materialized and feeds BOTH the
    // corpus total and the output — if a parquet scan reappears here, one
    // of the branches went back to re-assigning the whole corpus
    assert(!p.contains("Scan parquet"), p)
    assert(p.contains("ExistingRDD"), p)
  }

  test("e20 BQ KNN: shortlist scans ONLY the packed code column of the ingest-written copy") {
    // The "written at ingest" I/O claim made physical: the Hamming
    // shortlist serves from IvfIndex.signCodeCopy, so its scan's
    // ReadSchema carries vec_id + the packed code words and NEVER the
    // float embedding — the pass reads 1/32nd of the embedding bytes.
    // The popcount kernel is the built-in codegen'd bit_count, and the
    // shortlist boundary is a bounded top-K, not a global sort.
    val p = graft.operators.SimilarityPack.bqShortlist(spark, sf("sf0.001"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(p.contains("bit_count"), p)
    assert("ReadSchema: [^\n]*code".r.findFirstIn(p).isDefined, p)
    assert(!"ReadSchema: [^\n]*embedding".r.findFirstIn(p).isDefined,
      s"shortlist scan must not read the float embeddings:\n$p")
  }

  test("e20 BQ KNN: re-rank point-fetches the shortlist via a pushed In(vec_id) filter") {
    // The wide-column fetch is bounded: ≤ BqShortlist rows leave the
    // float corpus, selected by a scan-level pushed In filter (row-group
    // skipping on vec_id stats at scale), then a bounded top-K re-rank.
    val p = plan("e20_bq_knn")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("PushedFilters: \\[[^\\]]*In\\(vec_id".r.findFirstIn(p).isDefined,
      s"re-rank must push the shortlist In(vec_id) filter to the scan:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("e19 census reads zero data columns from the serving layout (partition statistics)") {
    // The standing-list census counts rows per cid on the cid-PARTITIONED
    // serving copy: the scan's ReadSchema must be empty (struct<>) — the
    // census is directory listing + footer row counts, never a data scan.
    val p = graft.operators.SimilarityPack.ivfListCensus(spark, sf("sf0.001"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ReadSchema: struct<>"),
      s"census scan must read no data columns:\n$p")
  }

  test("e21 tombstone lookup reads ONLY the narrow vec_id column of the serving copy") {
    // The delete audit's id→list lookup: cid is the partition column, so
    // the ledger join's scan carries exactly one i64 data column — the
    // audit never reads an embedding byte (the e19/e20 I/O discipline).
    val p = graft.operators.SimilarityPack.ivfTombstoneCensus(spark, sf("sf0.001"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ReadSchema: struct<vec_id:bigint>"),
      s"tombstone scan must read only vec_id:\n$p")
    assert(!"ReadSchema: [^\n]*embedding".r.findFirstIn(p).isDefined,
      s"tombstone scan must not read the float embeddings:\n$p")
  }

  test("a44 count-min probes join the bounded grid as a broadcast") {
    val p = plan("a44_count_min")
    // grid side: partial+final agg (map-side combine caps task output at
    // d*w cells); probe side joins it broadcast — never a sort-merge
    // exchange of the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t2/t3/t12/t13 text kernels are fully compiled: zero HOF lambdas anywhere in the plan") {
    // HOF lambdas evaluate interpreted, outside whole-stage codegen — the
    // r7 driver bench showed exactly the two lambda-bearing text queries
    // (t12/t13) inflating 7-9× under CPU contention while every codegen'd
    // query held. The marker counts now run through CountIn and the
    // bigrams through ShingleHashesBag; this pin keeps it that way.
    import org.apache.spark.sql.catalyst.expressions.LambdaFunction
    Seq("t2_quality_score", "t3_langid", "t12_bigram_novelty",
        "t13_langid_margin", "t18_bpe_apply", "t19_bigram_lm_score").foreach { name =>
      val opt = SparkEntry.queries(name)(spark, sf("sf0.001"))
        .queryExecution.optimizedPlan
      val lambdas = opt.collect { case node =>
        node.expressions.flatMap(_.collect { case l: LambdaFunction => l })
      }.flatten
      assert(lambdas.isEmpty,
        s"$name contains interpreted HOF lambdas: ${lambdas.mkString("; ")}")
    }
  }

  test("t23 scrub: compiled rewrite, no corpus-wide ordered listagg") {
    // Round 11's relational tail (explode covered positions ×3, distinct
    // the (doc,pos) frame, re-join the posexploded words, ordered listagg)
    // spilled 256 GB of external sort state at x1000m (§3c slope 4.4 vs
    // 3.33 linear). The rewrite scrubs in one compiled ScrubSpans pass;
    // this pin keeps the SortAggregate-based listagg (and the second
    // corpus-sized position join) out of the plan for good.
    val p = plan("t23_span_scrub")
    assert(p.contains("scrub_spans"), p)
    assert(!p.contains("listagg"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("t25 blocklist gate: one compiled projection — no join, no aggregate, no window") {
    // the C4-style gate must stay a scan-bandwidth map pass: CountIn
    // compiled into the projection, the only exchange the output sort
    val p = plan("t25_blocklist_gate")
    assert(p.contains("count_in"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Aggregate"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("e25 multi-probe assignment is the compiled projection — no window, no cartesian") {
    // the relational top-2 (explode ×k + rank window) would multiply
    // the corpus ×k and shuffle it; the kernel keeps assignment a map
    // pass fused into the scan — only the probe explode (×2 on the
    // narrow stream) and the candidate join remain
    val p = plan("e25_bitext_probe2")
    assert(p.contains("nearest_centroids"), p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t26 Gopher gate: compiled kernels, scan-bandwidth — no join/aggregate/window/lambda") {
    // same contract as t25: the rule set must stay a map pass (CountIn +
    // AlphaWordCount compiled into the projection) so it composes into
    // the streaming ingest edge unchanged
    val p = plan("t26_gopher_rules")
    assert(p.contains("count_in"), p)
    assert(p.contains("alpha_word_count"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Aggregate"), p)
    assert(!p.contains("windowspecdefinition"), p)
    import org.apache.spark.sql.catalyst.expressions.LambdaFunction
    val opt = SparkEntry.queries("t26_gopher_rules")(spark, sf("sf0.001"))
      .queryExecution.optimizedPlan
    val lambdas = opt.collect { case node =>
      node.expressions.flatMap(_.collect { case l: LambdaFunction => l })
    }.flatten
    assert(lambdas.isEmpty, s"t26 contains interpreted HOF lambdas: $lambdas")
  }

  test("t27 repetition gate: ONE kernel pass, scan-bandwidth — no join/aggregate/window/lambda") {
    // t26's contract, plus: the 15 element_at slots must NOT re-inline
    // the kernel (CollapseProject duplicating a non-cheap producer would
    // turn one O(9·chars) scan into fifteen) — exactly one
    // repetition_stats call in the optimized plan
    val p = plan("t27_repetition_rules")
    assert(p.contains("repetition_stats"), p)
    assert(p.split("repetition_stats", -1).length - 1 == 1,
      s"kernel inlined more than once:\n$p")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Aggregate"), p)
    assert(!p.contains("windowspecdefinition"), p)
    import org.apache.spark.sql.catalyst.expressions.LambdaFunction
    val opt = SparkEntry.queries("t27_repetition_rules")(spark, sf("sf0.001"))
      .queryExecution.optimizedPlan
    val lambdas = opt.collect { case node =>
      node.expressions.flatMap(_.collect { case l: LambdaFunction => l })
    }.flatten
    assert(lambdas.isEmpty, s"t27 contains interpreted HOF lambdas: $lambdas")
  }

  test("t28 C4 rewrite: one kernel pass over the page, no join/aggregate/window") {
    // the page CONSTRUCTION is fixture synthesis (HOF lambdas allowed
    // there); the operator itself must stay a single compiled map pass
    val p = plan("t28_c4_filters")
    assert(p.contains("c4_lines"), p)
    assert(p.split("c4_lines", -1).length - 1 == 1,
      s"kernel inlined more than once:\n$p")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Aggregate"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("the canon feature chain runs each kernel once, no join, no exchange") {
    // t29/s23's shared front (c4 construction + line rewrite + A1.1 +
    // A1.2 + 26 margins) must stay ONE wide scan: every compiled kernel
    // exactly once per row, no shuffle anywhere before the training
    // repartition — the scan-bandwidth claim §3g-addendum prices.
    val p = graft.operators.TextPack.canonFeats(
        graft.Tables(spark, sf("sf0.001"), "documents"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    Seq("c4_lines", "repetition_stats", "alpha_word_count").foreach { k =>
      assert(p.split(k, -1).length - 1 == 1, s"kernel $k not exactly once:\n$p")
    }
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("t29 scoring reads the pinned feature frame, never re-parsing the corpus") {
    // the trainer localCheckpoints (doc_id, canon_keep, y, x1..x26) once;
    // the scoring
    // job must scan that pin (ExistingRDD), not the documents parquet —
    // a parquet scan here means the E+1-scan-front regression returned
    // (measured 165 s vs 18 s at 5 M docs; e22's pin discipline)
    val p = plan("t29_quality_perceptron")
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("documents"), p)
  }

  test("e22 drift audit: compiled per-row distortion, k-bounded agg computed once") {
    val p = plan("e22_ivf_drift")
    // the k-row byList frame is localCheckpoint-materialized and feeds
    // both the totals and the output — a parquet scan here means a
    // branch went back to re-scoring the corpus (e19's pin, same reason)
    assert(!p.contains("Scan parquet"), p)
    assert(p.contains("ExistingRDD"), p)
    // the per-row stage (pre-checkpoint) is the compiled cosine against
    // the centroid literal — no join, no row fan-out
    val per = graft.operators.SimilarityPack.e22PerRow(spark, sf("sf0.001"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(per.contains("cosine_similarity"), per)
    assert(!per.contains("Join"), per)
    assert(!per.contains("Generate"), per)
  }

  test("e23 bitext mining folds both directions through the bounded heap, no window sort") {
    val p = plan("e23_bitext_mine")
    // e9's contract, both directions: candidates bound map-side in the
    // typed TopK aggregate — a windowed row_number here would sort every
    // |side|-sized partition in full
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("windowspecdefinition"), p)
    // (the mutual-pair join of the two k·|side| frames may legitimately
    // sort-merge — both sides grow with the corpus; what must NOT appear
    // is a window sort over the |A|·|B| score matrix, pinned above)
  }

  test("x19 realization: pinned draw frame, broadcast plan/offsets, no whole-source window") {
    // the realization contract at scale (shared realizedCum — so this
    // pins x16's shape too): the corpus is parsed ONCE into the pinned
    // narrow draw frame (ExistingRDD; an unpinned form recomputed the
    // scan + the (source, fp) dedup window for the offsets branch —
    // the double scan this pin exists to catch), the per-doc running
    // sum is the two-level (source, rbucket) window (never a
    // single-partition or whole-source exchange of the corpus), and
    // both the offsets frame and the 2·|sources|-row plan come back as
    // broadcasts — a sort-merge join here means a corpus-sized shuffle
    // replaced a catalog-sized broadcast
    val p = plan("x19_anneal_sample")
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("SinglePartition"), p)
  }
}
