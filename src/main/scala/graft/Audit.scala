package graft
import org.apache.spark.sql.SparkSession
object Audit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // same engine conf as Bench/Verify: bucketed scans report their
      // sortBy order (one file per bucket by construction), so the
      // audited plans match the executed ones
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def audit(name: String)(checks: (String, String => Boolean)*): Unit = {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      checks.foreach { case (label, f) =>
        println(f"$name%-22s ${if (f(plan)) "OK " else "MISS"} $label")
      }
    }
    audit("q01_pricing_summary")(
      ("filter pushed to scan", _.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate")),
      ("column pruned scan", p => p.contains("ReadSchema") && !p.contains("l_partkey")))
    audit("q02_knn_exact")(
      ("queries broadcast", _.contains("BroadcastNestedLoopJoin")),
      ("rank pushdown (WindowGroupLimit)", _.contains("WindowGroupLimit")))
    audit("q08_search_routed")(
      ("routes broadcast", _.contains("BroadcastHashJoin")),
      ("top-k partial limit", _.contains("WindowGroupLimit")))
    audit("q25_minhash_lsh")(
      ("band equi-join (no cross product)", p => p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin")))
    audit("q34_events_window")(
      ("partial agg before shuffle", _.contains("HashAggregate")))
    audit("q14_covar_proxy")(
      // the OR-predicate form degenerated to a nested loop over every
      // (pair, row) combination; the union-of-equi-joins must hash-join
      ("no nested-loop join", p => !p.contains("BroadcastNestedLoopJoin")),
      ("pair equi-join", p => p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")))
    // q13 itself serves memoized rows; audit the underlying operator's scan
    locally {
      val plan = graft.operators.Stats
        .ksAllPairs(Tables.points(spark, dir), sampleSize = 2000)
        .queryExecution.executedPlan.toString
      val ok = plan.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id")
      println(f"ksAllPairs(sampled)     ${if (ok) "OK " else "MISS"} sample pushed to scan")
    }
    audit("q48_fbin_source")(
      // the DSv2's two selling points: the id range narrows the PLANNED
      // scan (FbinScan rows=[lo,hi)), and the scan feeds codegen directly
      ("id range pushed into fbin scan", _.contains("rows=[100,200)")),
      ("whole-stage codegen over scan", _.contains("*(1) Filter")))
    audit("q57_u8bin_source")(
      ("u8 dtype + id range pushed", p => p.contains("dtype=u8") && p.contains("rows=[100,200)")))
    audit("q26_simhash")(
      // single-pass SimHash32 expression: no 32-row-per-token explode
      ("no per-bit explode", p => !p.contains("sequence(0, 31")),
      ("simhash32 map-stage expression", _.contains("simhash32")))
    audit("q52_simhash_neardup")(
      ("no per-bit explode", p => !p.contains("sequence(0, 31")))
    audit("q67_asof_join")(
      // union-tag + running carry: the ts >= theta must never plan as a
      // nested loop
      ("no nested-loop range join", p => !p.contains("BroadcastNestedLoopJoin")),
      ("single-shuffle window carry", _.contains("Window")))
    audit("q46_interval_algebra")(
      // split_overlaps is a coverage sweep; a pieces-x-intervals range join
      // would be a nested loop (measured 58s vs 2s at sf0.1)
      ("no range-join nested loop", p => !p.contains("BroadcastNestedLoopJoin")))
    audit("q61_dedup_clusters")(
      // label propagation joins only the candidate-pair EDGE SET — any
      // nested loop would mean a pairs-x-corpus cross product slipped in
      ("edges-only equi-joins (no BNLJ)", p => !p.contains("BroadcastNestedLoopJoin")))
    audit("q72_moving_avg")(
      // per-user ROWS windows: partition-local sort inside the window
      // exchange — a global Sort node would mean a single-partition plan
      ("windowed (per-user), not global", _.contains("Window")),
      ("no global top-level sort", p => !p.linesIterator.exists(l =>
        l.contains("Sort ") && !l.contains("Sort [user_id"))))
    audit("q75_bloom_dedup")(
      // bloom flag is a literal-bitmap map stage; the only joins are the
      // candidate-only exact verify (equi) — never a nested loop
      ("no nested-loop join", p => !p.contains("BroadcastNestedLoopJoin")),
      ("bloom verify is equi-join", p => p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")))
    audit("q76_contamination")(
      // gram-keyed capped equi-join, same discipline as the dedup generators
      ("no nested-loop join", p => !p.contains("BroadcastNestedLoopJoin")))
    audit("q78_semantic_dedup")(
      // cluster-bucketed candidates: the pair join must be keyed on the
      // cluster id, not a cross product
      ("no cross/nested-loop pair join", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")))
    audit("q44_pq_adc_search")(
      // literal-LUT strategy: ONE map stage over the codes + one top-k
      // shuffle — no LUT join anywhere in the plan
      ("no join in ADC search", p => !p.contains("Join")),
      ("top-k partial limit", _.contains("WindowGroupLimit")))
    audit("q45_ivfpq_search")(
      // driver routing + shard_id->qids map literal: the routed "join" is
      // a filter + generator, not a join operator
      ("no join in IVF-PQ search", p => !p.contains("Join")),
      ("top-k partial limit", _.contains("WindowGroupLimit")))
    audit("q79_seq_packing")(
      // two-phase prefix sum: the cumsum runs in the RDD stage (range
      // shuffle inside the lineage), NEVER as a global single-partition
      // window in the SQL plan
      ("no window operator", p => !p.contains("Window")),
      ("RDD two-phase stage (no SQL sort/exchange)", p =>
        p.contains("SerializeFromObject") && !p.contains("Exchange")))
    audit("q80_pii_redact")(
      // pure per-row regexp arithmetic: no join, no aggregate, no shuffle
      ("map-only (no exchange beyond ingest spread)", p =>
        !p.contains("Join") && !p.contains("HashAggregate")))
    audit("q81_vocab")(
      // top-N must be a TakeOrdered (per-partition partial), with the
      // rank window running over the already-limited rows
      ("TakeOrdered top-N", _.contains("TakeOrderedAndProject")))
    audit("q84_mixture")(
      // quotas broadcast; the per-source rank is a partition-local window
      ("quota broadcast join", _.contains("BroadcastHashJoin")),
      ("no global sort", p => !p.linesIterator.exists(l =>
        l.contains("Sort ") && l.contains("global=true") &&
          !l.contains("md5"))))
    // q85's full plan includes exact-kNN (whose BNLJ broadcast of the
    // query batch is the INTENDED shape, same as q02); isolate the sweep
    // operator to assert its one-pass claim: exactly 2 windows (route
    // rank + the shared candidate rank — a per-t implementation would
    // plan maxT+1) and exactly ONE candidate equi-join on shard_id
    locally {
      import org.apache.spark.sql.functions.col
      val pts = Tables.points(spark, dir)
      val cents = graft.operators.Sharding.fitCentroids(spark, pts, 8, 1)
      val sharded = pts.join(
        graft.operators.Sharding.assign(pts, cents).select("id", "shard_id"), "id")
      val plan = graft.operators.ShardedSearch
        .searchSweep(sharded, Tables.queryPoints(spark, dir), cents, 10, 4)
        .queryExecution.executedPlan.toString
      val nWin = plan.linesIterator.count(_.contains("Window ["))
      val ok1 = nWin == 2
      // the only BNLJs are the tiny query-x-centroid broadcast crosses
      // (route + distance, same shape q02 asserts); the CANDIDATE join
      // must be the hash equi-join on shard_id
      val ok2 = plan.contains("BroadcastHashJoin [shard_id")
      println(f"searchSweep(maxT=4)     ${if (ok1) "OK " else "MISS"} one shared rank window (2 total, got $nWin)")
      println(f"searchSweep(maxT=4)     ${if (ok2) "OK " else "MISS"} candidates via shard_id equi-join")
    }
    audit("q82_boilerplate")(
      // chunk-df join is keyed on (source, chunk): equi only
      ("chunk equi-join (no BNLJ)", p => !p.contains("BroadcastNestedLoopJoin")))
    audit("q88_image_dhash")(
      // ONE codec kernel pass: bucket counts come from a window over the
      // hash key, not a groupBy + self-join that re-runs the map kernel
      ("single codec kernel stage",
        p => p.linesIterator.count(_.contains("SerializeFromObject")) == 1),
      ("no self-join", p => !p.contains("Join")))
    audit("q90_curriculum")(
      // exact decile binning via the RDD two-phase sweep, no SQL window
      ("no window operator", p => !p.contains("Window")))
    audit("q91_wordpiece")(
      // tokenization over DISTINCT words only, joined back as an equi-key;
      // the expression itself appears as a plain projection (no UDF)
      ("distinct-words equi-join", p =>
        (p.contains("BroadcastHashJoin [word") || p.contains("SortMergeJoin [word")
          || p.contains("ShuffledHashJoin [word")) &&
          p.contains("HashAggregate(keys=[word")),
      // the expression is a native Catalyst node: its evaluation shows up
      // inside the post-distinct projection, never as a UDF operator
      // (a ScalaUDF prints as "UDF(...)" in the plan string)
      ("no UDF tokenization", p =>
        !p.contains("UDF(") && !p.contains("BatchEvalPython")))
    audit("q93_pack_by_source")(
      // group-partitioned window: the sort key leads with grp, so every
      // sort is partition-local (a GLOBAL sort prints as "Sort [...], true"
      // in Spark's plan string — the boolean is the global flag)
      ("per-group window", _.contains("Window")),
      ("no global sort", p => !p.linesIterator.exists(l =>
        l.contains("Sort [") && l.contains("], true"))))
    audit("q92_json_props")(
      // codegen'd json path + partial agg before the shuffle
      ("partial agg before shuffle", _.contains("HashAggregate")),
      ("no UDF json parsing", p =>
        !p.contains("UDF(") && !p.contains("BatchEvalPython")))
    audit("q94_dup_provenance")(
      // pair counts from combinatorics over the (hash, source) COUNT
      // table: no pair materialization, so no generator/explode at all
      ("no pair explode", p => !p.contains("Generate explode")),
      ("hash equi-join only", p => !p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct")))
    audit("q95_pack_contents")(
      // token slices shuffle once on block_id; reassembly is array_sort
      // inside the aggregate — never a window, never a nested loop
      ("no window operator", p => !p.contains("Window")),
      ("no nested-loop join", p => !p.contains("BroadcastNestedLoopJoin")))
    // q96's final plan is the RDD-backed packing tail, which HIDES the
    // upstream SQL stages — audit the pre-packing pipeline directly
    locally {
      val plan = SparkEntry.prepSurvivors(spark, dir)
        .queryExecution.executedPlan.toString
      val ok1 = !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct")
      val ok2 = !plan.linesIterator.exists(l =>
        l.contains("Sort [") && l.contains("], true"))
      println(f"q96 survivors stages    ${if (ok1) "OK " else "MISS"} equi-joins only")
      println(f"q96 survivors stages    ${if (ok2) "OK " else "MISS"} no global sort")
    }
    audit("q96_prep_pipeline")(
      ("packing tail is RDD two-phase (pinned counts)", p =>
        p.contains("SerializeFromObject") && !p.contains("Exchange")))
    audit("q100_graph_ann")(
      // the executed beam materializes each round (r11 — the composed DAG
      // duplicated the visited subtree 2^rounds), so the final plan roots
      // at the last round's checkpoint: assert the final cut here, the
      // full beam shape on the composed twin below
      ("adjacency expansion equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("final top-k partial limit", p =>
        p.linesIterator.count(_.contains("WindowGroupLimit")) >= 1))
    // the SAME beam left composed in one DAG (Audit's plan-shape hook):
    // routed-shard pruning must reach the parquet scans, every expansion
    // keys on (shard_id, id), and each round's ef cut + the final top-k
    // run as partial per-partition limits
    locally {
      val plan = graft.operators.GraphAnn
        .topK(SparkEntry.graphVisitedComposed(spark, dir), k = 10)
        .queryExecution.executedPlan.toString
      val ok1 = plan.contains("PartitionFilters: [shard_id") && plan.contains(" IN (")
      val ok2 = !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct")
      val ok3 = plan.linesIterator.count(_.contains("WindowGroupLimit")) >= 4
      println(f"q100 composed beam      ${if (ok1) "OK " else "MISS"} routed-shard partition pruning on index scans")
      println(f"q100 composed beam      ${if (ok2) "OK " else "MISS"} adjacency expansion equi-joins only")
      println(f"q100 composed beam      ${if (ok3) "OK " else "MISS"} beam + final top-k partial limits")
    }
    audit("q103_graph_pq_probe")(
      // DiskANN shape: the WALK prices nodes by PQ codes; raw vectors are
      // scanned exactly once, by the exact-refine tail
      ("raw vectors scanned once (refine only)", p =>
        p.linesIterator.count(l => l.contains("FileScan") && l.contains("vec:array")) == 1),
      ("no nested-loop join", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("routed-shard partition pruning", p =>
        p.contains("PartitionFilters: [shard_id") && p.contains(" IN (")))
    audit("q107_bm25")(
      // inverted-index shape: every join keys on term/id — a nested loop
      // would mean query x corpus
      ("term equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("top-k partial limit", _.contains("WindowGroupLimit")))
    audit("q110_dup_spans")(
      // anchor matching is a hash-keyed equi-join back from the df>=2
      // hash set — duplicate PAIRS are never materialized
      ("hash equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      // winnowing min + islands sweep run in id-partitioned windows only
      ("no global-order sort", p =>
        !p.linesIterator.exists(l => l.contains("Sort [") && l.contains("], true"))))
    audit("q111_bpe_encode")(
      // distinct-words-then-join: the corpus side pays one vocab-keyed
      // equi-join; the rule chain is a map over the distinct-word table
      ("vocab equi-join only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("per-doc reassembly, no global sort", p =>
        !p.linesIterator.exists(l => l.contains("Sort [") && l.contains("], true"))))
    audit("q112_quality_classifier")(
      // the model table is tiny by construction: pricing tokens must be a
      // broadcast hash join, never a shuffle of the corpus on bucket
      ("weight table broadcast", _.contains("BroadcastHashJoin")),
      ("no nested-loop join", p => !p.contains("BroadcastNestedLoopJoin")))
    audit("q114_span_dedup")(
      // keeper selection is one agg per segment VALUE + a hash join back —
      // segment pairs are never materialized
      ("hash equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("per-doc reassembly, no global sort", p =>
        !p.linesIterator.exists(l => l.contains("Sort [") && l.contains("], true"))))
    audit("q115_split_leakage")(
      // q25's banded candidate generation stays the only join; the split
      // is a map over the pair table
      ("banded equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("no global-order sort", p =>
        !p.linesIterator.exists(l => l.contains("Sort [") && l.contains("], true"))))
    audit("q116_token_budget")(
      // the only non-agg operator is the 1-row corpus-totals broadcast
      // (the q84 scalar convention); sources agg is map-side partial
      ("one-row totals broadcast", _.contains("BroadcastNestedLoopJoin")),
      ("partial agg over sources", _.contains("HashAggregate")))
    audit("q117_pagerank")(
      // every round is a score-to-edge equi-join + per-node partial agg
      // over the pinned edge frame — no nested loop, no driver state
      ("equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("no global-order sort", p =>
        !p.linesIterator.exists(l => l.contains("Sort [") && l.contains("], true"))))
    audit("q119_profile")(
      // ONE scan: the multi-column distinct expands in-plan; nothing joins
      ("single-scan multi-distinct agg", _.contains("Expand")),
      ("no join anywhere", p => !p.contains("Join")))
    audit("q120_constraints")(
      // FK checks are equi-anti-joins; only counts reach the report
      ("anti-join FKs", _.contains("LeftAnti")),
      ("no cross product", p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("q121_snapshot_cdc")(
      // diff is ONE full-outer equi-join on the key; hashes (not payloads)
      // are what shuffles
      ("full-outer diff join", _.contains("FullOuter")),
      ("no cross product", p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("q122_zorder_layout")(
      // z-value is map-only codegen'd bit math; stats are one partial agg
      // on the bounded bucket key — no join, no global sort
      ("no join anywhere", p => !p.contains("Join")),
      ("partial agg on bucket", _.contains("HashAggregate")),
      ("no global-order sort", p =>
        !p.linesIterator.exists(l => l.contains("Sort [") && l.contains("], true"))))
    audit("q123_audio_quality")(
      // pure map kernel over the audio bytes: no join; the only exchange
      // is Tables.documents' round-robin fan-out (kernel parallelism over
      // a single parquet file), never a key shuffle
      ("no join anywhere", p => !p.contains("Join")),
      ("no key shuffle", p => !p.contains("hashpartitioning") &&
        !p.contains("rangepartitioning")))
    audit("q124_image_neardup")(
      // banded candidates come from an EQUI-join on (band_idx, band_val);
      // the codec kernel is checkpointed so the self-join reads it once
      ("band equi-join", p =>
        p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
          p.contains("BroadcastHashJoin")),
      ("no cross product", p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("q125_scd_history")(
      // ordering window is PARTITION-LOCAL (partitionBy user_id): the sort
      // line carries a partial flag, never a global one
      ("no global-order sort", p =>
        !p.linesIterator.exists(l => l.contains("Sort [") && l.contains("], true"))),
      ("per-key window", _.contains("Window")),
      ("no join anywhere", p => !p.contains("Join")))
    audit("q126_point_in_time")(
      // as-of against the history is a union-tag + running carry — one
      // shuffle on the key, NO interval range join (which would be a BNLJ)
      ("no cross product", p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")),
      ("no global-order sort", p =>
        !p.linesIterator.exists(l => l.contains("Sort [") && l.contains("], true"))))
    audit("q118_max_passage")(
      // sparse dot: chunk vectors equi-join the BROADCAST query vectors
      // on bucket; the corpus never shuffles on a pair key
      ("query vectors broadcast", _.contains("BroadcastHashJoin")),
      ("no nested-loop join", p => !p.contains("BroadcastNestedLoopJoin")),
      ("top-k partial limit", _.contains("WindowGroupLimit")))
    audit("q127_bucketed_join")(
      // the layout's whole point: both scans report the hash distribution,
      // so the sort-merge join needs NO exchange under it — the ONLY
      // Exchange in the plan is the final per-priority aggregate
      ("bucketed scans (16 buckets)", _.contains("SelectedBucketsCount: 16 out of 16")),
      ("sort-merge join (not re-broadcast)", _.contains("SortMergeJoin")),
      ("single exchange (agg only)", p => p.sliding("Exchange".length).count(_ == "Exchange") == 1))
    audit("q128_bq_search")(
      // the coarse cut ranks the 8-byte codes (query batch broadcast, same
      // plan as q02); raw vectors enter ONLY via the candidate equi-join
      ("query codes broadcast", _.contains("BroadcastNestedLoopJoin")),
      ("hamming cut is a partial limit", _.contains("WindowGroupLimit")),
      ("refine is an equi-join (no second scan-wide NLJ)", p =>
        p.sliding("BroadcastNestedLoopJoin".length)
          .count(_ == "BroadcastNestedLoopJoin") == 1))
    audit("q129_ivm_merge")(
      // the IVM claim: the base facts are NOT re-scanned — the state
      // enters as the pinned checkpoint block; the only FileScans are the
      // two DELTA legs (inserts + deletes), both with pushed filters
      ("base state is the pinned block", _.contains("Scan ExistingRDD")),
      ("only the delta legs scan the facts", p =>
        p.sliding("FileScan".length).count(_ == "FileScan") == 2),
      ("delta filters pushed to scan", _.contains(
        "PushedFilters: [IsNotNull(l_shipdate)")),
      ("no join anywhere (union + re-agg)", p => !p.contains("Join")))
    audit("q130_rollup")(
      // re-aggregation rollup: NO Expand (Spark's native rollup replicates
      // every FACT row once per level through the aggregate) and NO fact
      // scan at all — every level re-reads the pinned finest state
      ("no Expand node", p => !p.contains("Expand")),
      ("no fact-table scan", p => !p.contains("FileScan")),
      ("levels read the pinned state", _.contains("Scan ExistingRDD")),
      ("no join anywhere", p => !p.contains("Join")))
    audit("q146_triangles")(
      // wedge enumeration + closing join must both be hash-joinable pair
      // equi-joins — a cartesian here is corpus², not degree²·|V|
      ("no nested-loop/cartesian", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")))
    audit("q145_phrase_search")(
      // postings probe discipline: term equi-join only — a phrase join
      // that degenerates to a nested loop or cartesian re-scans the
      // corpus per query
      ("no nested-loop/cartesian", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("phrase-length side broadcast", _.contains("BroadcastHashJoin")),
      // the build side must be the QUERY side: the checkpoint-backed
      // postings have no stats, and before the explicit broadcast() hint
      // the CBO built the hash table on the INDEX — backwards at scale
      ("postings never the broadcast side", p => {
        val ls = p.linesIterator.toVector
        !ls.zipWithIndex.exists { case (l, i) =>
          l.contains("Scan ExistingRDD") && i > 0 &&
            ls(i - 1).contains("BroadcastExchange") }
      }))
    audit("q149_phrase_bucketed")(
      // the layout's whole point: the postings scan reports its term-hash
      // distribution, so the sort-merge term join re-shuffles ONLY the
      // phrase side — exactly one Exchange hashpartitioning on term in
      // the entire plan, and none above the bucketed scan
      ("bucketed postings scan (8 buckets)",
        _.contains("SelectedBucketsCount: 8 out of 8")),
      ("sort-merge join on term", _.contains("SortMergeJoin")),
      ("postings never re-shuffled (one term exchange: the phrase side)",
        p => "Exchange hashpartitioning\\(term".r.findAllIn(p).size == 1))
    audit("q150_phrase_bigram")(
      // the pair constraints (n−1 per phrase) are the tiny side: they
      // broadcast-hash-join the pinned index, never the reverse, and the
      // probe has no nested-loop anywhere
      ("pair constraints broadcast-joined", _.contains("BroadcastHashJoin")),
      ("no nested-loop join", p => !p.contains("BroadcastNestedLoopJoin")),
      ("pinned index never the broadcast side", p => {
        val ls = p.linesIterator.toVector
        !ls.zipWithIndex.exists { case (l, i) =>
          l.contains("Scan ExistingRDD") && i > 0 &&
            ls(i - 1).contains("BroadcastExchange") }
      }))
    audit("q159_phrase_prod_layout")(
      // the composed layout: bucketed bigram scan feeds the SMJ directly;
      // the only hash Exchange on the bigram key is the tiny pair side
      ("bucketed bigram scan (8 buckets)",
        _.contains("SelectedBucketsCount: 8 out of 8")),
      ("sort-merge join on the pair key", _.contains("SortMergeJoin")),
      ("index never re-shuffled (one pair-key exchange: the phrase side)",
        p => "Exchange hashpartitioning\\(b#".r.findAllIn(p).size == 1))
    audit("q154_dsir_select")(
      // the nBuckets-row log-ratio table is the broadcast side; the
      // exploded gram stream is never shuffled for the join
      ("log-ratio table broadcast-joined", _.contains("BroadcastHashJoin")),
      ("no nested-loop on the gram stream", p =>
        // the 1-row totals crossJoin is the only (intentional) BNLJ
        "BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1),
      ("top-k never a global sort", _.contains("TakeOrderedAndProject")))
    audit("q143_heavy_hitters")(
      // the two-pass claim: the returned plan is ONE probe scan whose
      // map-side literal CMS filter precedes the count shuffle — the
      // sketch itself is a driver artifact, never a second scan
      ("single probe scan", p => p.sliding("FileScan".length).count(_ == "FileScan") == 1),
      ("literal CMS filter on the map side", _.contains("element_at")))
    audit("q144_weighted_sample")(
      // global top-k must be per-partition heads + merge, never a full sort
      ("TakeOrderedAndProject (no global sort)", _.contains("TakeOrderedAndProject")))
    audit("q141_matryoshka_stored")(
      // the stored-prefix layout's whole point: the coarse scan's
      // ReadSchema carries ONLY (id, pvec) — the full vec column's bytes
      // never leave parquet until the k·refine candidate equi-join
      ("coarse scan pruned to the prefix column",
        _.contains("ReadSchema: struct<id:bigint,pvec:array<float>>")),
      ("refine scan reads vec (not pvec)",
        _.contains("ReadSchema: struct<id:bigint,vec:array<float>>")),
      ("coarse cut is a partial limit", _.contains("WindowGroupLimit")))
    audit("q137_hist_quantile")(
      // sketch probe discipline: grid fit + bin counts are pinned build
      // work, so the quantile query reads ONLY the ≤64-row state — no
      // fact-table scan in the plan at all (was: an eager min/max fit
      // inside the body scanning lineitem twice per invocation)
      ("no fact-table scan (state pinned)", p => !p.contains("FileScan")),
      ("runs over the pinned sketch", _.contains("Scan ExistingRDD")))
    audit("q131_gapfill_locf")(
      // the carry window is PARTITION-LOCAL per user; the grid-obs join is
      // an equi-join on (user, day) — a range/interval shape here would
      // mean the grid degenerated to a nested loop
      ("no global-order sort", p =>
        !p.linesIterator.exists(l => l.contains("Sort [") && l.contains("], true"))),
      ("grid join is equi (no nested loop)", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("carry window present", _.contains("Window")))
    audit("q132_funnel")(
      // per-stage equi-joins against the entity-sized previous frame —
      // events never pair with events
      ("stage joins are equi", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("stage filters pushed to scan", _.contains("PushedFilters: [IsNotNull(event_type)")),
      ("partial min-aggs", _.contains("partial_min")))
    audit("q134_cohort_retention")(
      ("no window at all", p => !p.contains("Window")),
      ("cohort join is equi", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")))
    audit("q133_bloom_join")(
      // the reduction's point: the literal-bitmap test FILTERS the probe
      // side before its shuffle (map-only floor/pow arithmetic — no join
      // to the build side for the membership test), and the real join
      // stays the SMJ regime a non-broadcastable build side forces
      ("bloom filter on the probe side", p =>
        p.contains("FLOOR(") || p.contains("floor(")),
      ("join is the SMJ (non-broadcastable build regime)",
        _.contains("SortMergeJoin")),
      ("no nested loop anywhere", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")))
    audit("q135_mutual_knn")(
      // reciprocity is ONE self-equi-join on the (src, nbr) pair key over
      // the pinned edge list — candidate-sized, never corpus-sized
      ("pair-key equi-join", p =>
        p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
          p.contains("BroadcastHashJoin")),
      ("edges enter as the pinned block", _.contains("Scan ExistingRDD")),
      ("no nested loop", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")))
    audit("q136_matryoshka")(
      // the coarse stage is the intended q02 broadcast scan (the ONLY
      // nested loop); full-dim vectors enter via the candidate equi-join
      ("exactly one broadcast scan (the coarse stage)", p =>
        p.sliding("BroadcastNestedLoopJoin".length)
          .count(_ == "BroadcastNestedLoopJoin") == 1),
      ("coarse cut is a partial limit", _.contains("WindowGroupLimit")),
      ("refine is an equi-join", p =>
        p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
          p.contains("ShuffledHashJoin")))
    audit("q102_graph_insert")(
      // incremental merge: batch-keyed equi-joins + the per-src re-cut —
      // a nested loop would mean old x union degenerated to all-pairs
      ("batch equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("per-src re-cut partial limit", _.contains("WindowGroupLimit")))
    audit("q166_suffix_array")(
      // the doubling is positional equi-joins + the RDD range-rank; a
      // cross product anywhere means a shift key stopped being equi
      ("no cross product", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      // the only GLOBAL sort allowed is the final output ordering — the
      // dense rank inside the build is range-partition + local sort
      ("single global sort (output ordering only)", p =>
        p.linesIterator.count(l => l.contains("Sort [") && l.contains("], true")) == 1))
    audit("q167_exact_dup_spans")(
      // window probe, doc mapping, and descent lookups are all equi-joins
      ("equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("single global sort (output ordering only)", p =>
        p.linesIterator.count(l => l.contains("Sort [") && l.contains("], true")) == 1))
    audit("q170_blocklist_scan")(
      // the pattern side is broadcast INSIDE the automaton (collected
      // driver-side), so the scan has no join operator at all — a join
      // appearing here would mean the termlist became a shuffled relation
      ("no join in the scan (automaton is broadcast state)", p =>
        !p.contains("Join") && !p.contains("CartesianProduct")),
      ("single global sort (output ordering only)", p =>
        p.linesIterator.count(l => l.contains("Sort [") && l.contains("], true")) == 1))
    audit("q169_video_codec")(
      // encode→decode per id inside one flatMap: a single scan, no KEYED
      // shuffle anywhere — the embarrassingly-parallel media-kernel
      // shape. (The only Exchange is Tables.spread's round-robin
      // small-file adapter, dropped at real scale.)
      ("no keyed shuffle (per-row codec kernel)", p =>
        !p.contains("hashpartitioning") && !p.contains("rangepartitioning")),
      ("no cross product", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")))
    audit("q168_exact_dedup_rewrite")(
      ("equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      // the cut merge windows are doc-PARTITIONED (hashpartitioning(id)
      // feeds them) — never a single-partition global window
      ("cut-merge window partitioned by doc", p =>
        !p.contains("SinglePartition") || !p.contains("Window")),
      ("single global sort (output ordering only)", p =>
        p.linesIterator.count(l => l.contains("Sort [") && l.contains("], true")) == 1))
    audit("q171_graph_delete")(
      // FreshDiskANN local repair: deletion-set anti/semi joins + the
      // two-hop candidate equi-join — a nested loop would mean the repair
      // degenerated to damage x shard
      ("repair equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      // the re-cut window runs only over damaged sources' rows; untouched
      // lists union through with no window at all
      ("damage-only re-cut partial limit", _.contains("WindowGroupLimit")))
    audit("q172_graph_delete_search")(
      // the executed beam materializes each round (r11), so the final
      // plan roots at the last round's checkpoint; the post-repair
      // partition pruning and full beam shape are asserted on the
      // composed twin over the SAME written artifacts, below
      ("beam equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("final top-k partial limit", p =>
        p.linesIterator.count(_.contains("WindowGroupLimit")) >= 1))
    // composed beam over the gidxdel serving artifacts the query just
    // wrote: the re-read scans must carry the routed-shard pruning (the
    // POST-REPAIR index keeps the build's layout contract)
    locally {
      val plan = SparkEntry.servedBeamComposed(spark, dir, "gidxdel")
        .queryExecution.executedPlan.toString
      val ok1 = plan.contains("PartitionFilters: [shard_id") && plan.contains(" IN (")
      val ok2 = plan.linesIterator.count(_.contains("WindowGroupLimit")) >= 4
      println(f"q172 served beam        ${if (ok1) "OK " else "MISS"} post-repair scans partition-pruned")
      println(f"q172 served beam        ${if (ok2) "OK " else "MISS"} beam + final top-k partial limits")
    }
    // q172's repair chain, pre-materialization: the layout/adjacency
    // scans must read ONLY routed shards' files, and the repair must
    // stay equi-join-shaped
    locally {
      val plan = SparkEntry.graphDeleteRepaired(spark, dir)
        .adjacency.queryExecution.executedPlan.toString
      val ok1 = plan.contains("PartitionFilters: [shard_id") && plan.contains(" IN (")
      val ok2 = !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct")
      println(f"q172 repair chain       ${if (ok1) "OK " else "MISS"} routed-shard partition pruning on index scans")
      println(f"q172 repair chain       ${if (ok2) "OK " else "MISS"} repair equi-joins only")
    }
    audit("q179_incremental_neardup")(
      // ingest probe: batch bands against the stored index is an
      // equi-join on the band key; the verify side re-shingles only
      // semi-join-pruned candidate reference docs — a nested loop or a
      // cartesian anywhere means batch x corpus leaked in
      ("band probe + verify equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("reference pruned by semi-join before shingling", p =>
        p.contains("LeftSemi")))
    audit("q180_sa_ingest_probe")(
      // the ingest probe is ONE gram equi-join against the stored
      // witness index + a per-doc islands window — a nested loop or
      // cartesian anywhere means batch x corpus leaked in
      ("gram probe equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("islands merge is a windowed pass", _.contains("Window")))
    audit("q181_lsh_index_fold")(
      // fold + probe: band equi-joins only; the verify side re-shingles
      // only semi-join-pruned candidate reference docs (q179's contract)
      ("fold + probe equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("reference pruned by semi-join before shingling", p =>
        p.contains("LeftSemi")))
    audit("q183_gram_index_fold")(
      ("fold + probe equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")))
    audit("q184_dedup_first_ann")(
      // the deduped beam plans like q100 (rounds materialized since r11;
      // the shared beam shape is asserted on q100's composed twin) — the
      // dedup itself is audited below
      ("beam equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("final top-k partial limit", p =>
        p.linesIterator.count(_.contains("WindowGroupLimit")) >= 1))
    // q184's keeper selection, pre-materialization: candidate generation
    // is a bucket equi-join (never all-pairs) and the keeper cut is one
    // anti-join
    locally {
      import org.apache.spark.sql.functions.col
      val p = Tables.points(spark, dir)
      val planted = p.unionByName(
        p.where(col("id") % 10 === 0)
          .select((col("id") + 100000).as("id"), col("vec")))
      val dupIds = graft.operators.Dedup.embeddingNearDups(planted, threshold = 0.99)
        .select(col("id_b").as("id")).distinct()
      val plan = planted.join(dupIds, Seq("id"), "left_anti")
        .queryExecution.executedPlan.toString
      val ok1 = !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct")
      val ok2 = plan.contains("LeftAnti")
      println(f"q184 keeper selection   ${if (ok1) "OK " else "MISS"} bucket equi-join, never all-pairs")
      println(f"q184 keeper selection   ${if (ok2) "OK " else "MISS"} keeper cut is an anti-join")
    }
    // the gram-index fold itself (q183 materializes it before the probe,
    // so its plan is audited on the operator directly): novel grams enter
    // via ONE anti-join against the stored index — nothing corpus-sized
    // shuffles
    locally {
      import spark.implicits._
      val stored = Seq(("abcde", 1L, 0L)).toDF("gram", "doc", "off")
      val batch = Seq((100L, "hello world example")).toDF("id", "text")
      val plan = graft.operators.SuffixArray.gramIndexAppend(stored, batch, 5)
        .queryExecution.executedPlan.toString
      val ok1 = plan.contains("LeftAnti")
      val ok2 = !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct")
      println(f"gramIndexAppend         ${if (ok1) "OK " else "MISS"} novel grams via anti-join")
      println(f"gramIndexAppend         ${if (ok2) "OK " else "MISS"} no nested-loop/cartesian")
    }
    audit("q178_graph_churn_search")(
      ("beam equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("final top-k partial limit", p =>
        p.linesIterator.count(_.contains("WindowGroupLimit")) >= 1))
    // composed beam over the gidxchurn serving artifacts (q172's pattern)
    locally {
      val plan = SparkEntry.servedBeamComposed(spark, dir, "gidxchurn")
        .queryExecution.executedPlan.toString
      val ok1 = plan.contains("PartitionFilters: [shard_id") && plan.contains(" IN (")
      val ok2 = plan.linesIterator.count(_.contains("WindowGroupLimit")) >= 4
      println(f"q178 served beam        ${if (ok1) "OK " else "MISS"} post-churn scans partition-pruned")
      println(f"q178 served beam        ${if (ok2) "OK " else "MISS"} beam + final top-k partial limits")
    }
    audit("q182_churn_health")(
      // the health readout is one anti-join + two per-shard counts over
      // shard_id-keyed inputs — a nested loop would mean points x edges
      ("anti-join + counts, equi only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      ("orphan detection is an anti-join", p => p.contains("LeftAnti")))
    // q178's churn chain (insert merge + delete repair), pre-
    // materialization: same pruning + join-shape contract as q172's
    locally {
      val plan = SparkEntry.graphChurnRepaired(spark, dir, materialize = false)
        .adjacency.queryExecution.executedPlan.toString
      val ok1 = plan.contains("PartitionFilters: [shard_id") && plan.contains(" IN (")
      val ok2 = !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct")
      println(f"q178 churn chain        ${if (ok1) "OK " else "MISS"} routed-shard partition pruning on index scans")
      println(f"q178 churn chain        ${if (ok2) "OK " else "MISS"} maintenance equi-joins only")
    }
    audit("q173_rewrite_pipeline")(
      ("equi-joins only", p =>
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")),
      // the packing tail consumes PINNED counts: the two-phase sweep is
      // RDD-backed with no Exchange of its own (q96's shape)
      ("packing tail is RDD two-phase (pinned counts)", p =>
        p.contains("SerializeFromObject") && !p.contains("Exchange")))
    audit("q174_blocklist_10k")(
      // 10k patterns still ride inside the broadcast automaton — P must
      // never become a shuffled relation no matter how large
      ("no join in the scan (automaton is broadcast state)", p =>
        !p.contains("Join") && !p.contains("CartesianProduct")),
      ("single global sort (output ordering only)", p =>
        p.linesIterator.count(l => l.contains("Sort [") && l.contains("], true")) == 1))
    // q151's BATCH twin (the query entry reads the streaming sink, so the
    // plan to audit is the shared definition itself): the attribution
    // join must plan as a user_id equi-join with the time-range bound as
    // a join-level post-condition — a nested loop would mean Spark saw
    // only the range predicate and paid views × clicks
    locally {
      import org.apache.spark.sql.functions.col
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val plan = graft.operators.Streaming.attributionJoin(
          ev.where(col("event_type") === "view"),
          ev.where(col("event_type") === "click"))
        .queryExecution.executedPlan.toString
      val ok1 = !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct")
      val ok2 = plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin")
      println(f"attributionJoin(batch)  ${if (ok1) "OK " else "MISS"} no nested-loop/cartesian")
      println(f"attributionJoin(batch)  ${if (ok2) "OK " else "MISS"} user_id equi-join")
    }
    spark.stop()
  }
}
