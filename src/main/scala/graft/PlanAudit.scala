package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Emits the physical plans (`explain("formatted")`) of the most
  * scale-critical operators to a markdown file — the audit trail for
  * "is this the plan you'd want on a 1000-executor cluster", kept in
  * the repo as PLAN_AUDIT_r6.md.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [outFile]
  */
object PlanAudit {

  private type B = (SparkSession, String) => DataFrame
  private def reg(name: String): B =
    (s, d) => SparkEntry.registry(name).fn(s, d)

  /** (section, what the plan must show to be scale-correct, builder) */
  val audited: Seq[(String, String, B)] = Seq[(String, String)](
    "q01_pricing_summary" ->
      "Range predicate in PushedFilters; partial_ aggregates before the single Exchange; ReadSchema pruned to the 7 needed columns.",
    "q05_revenue_by_nation" ->
      "All four dimension joins are BroadcastHashJoin (no shuffle); the only Exchanges are the final agg keys.",
    "q_bucketed_join" ->
      "SortMergeJoin with ZERO Exchange before the join on the pre-bucketed twins — the fact-fact join shape. (Audited with broadcast disabled; with it on, AQE picks an equally shuffle-free broadcast join at this SF.)",
    "dedup_minhash_lsh" ->
      "Banded signature keys drive the self-join Exchange; InMemoryTableScan shows the persisted index read by both legs.",
    "q_bloom_semi_join" ->
      "graft_bloom_contains filter sits in the scan stage BEFORE the join Exchange — shuffle input is prefiltered.",
    "q_interval_join_binned" ->
      "The pure range join runs as SortMergeJoin/ShuffledHashJoin on the bin key — no BroadcastNestedLoopJoin/Cartesian anywhere.",
    "q_salted_agg" ->
      "Two HashAggregate pairs: distinct state is partial-aggregated per (key, salt) before the second, tiny rollup.",
    "ch_uniq_upto" ->
      "ObjectHashAggregate with partial_ and final uniqupto stages — bounded-buffer state merged map-side first.",
    "mv_route" ->
      "The scan is the graft_mvproj projection parquet, NOT orders.parquet — the optimizer substituted the registered pre-aggregation; one row per group is read.",
    "q19_brand_or" ->
      "BroadcastHashJoin on the hoisted p_partkey equi key with the three-way OR as residual condition — no BroadcastNestedLoopJoin.",
    "q04_order_priority" ->
      "LeftSemi join keyed on orderkey carrying the non-equi date conjunct as join condition — the decorrelated EXISTS, one shuffle.",
    "src_bucket_pruning" ->
      "SelectedBucketsCount: 1 out of 8 on the bucketed scan — a point lookup reads 1/8th of the files with zero shuffle.",
    "q_dpp" ->
      "PartitionFilters carries a dynamicpruning#... subquery fed by the broadcast dimension — only qualifying month directories of the fact layout are listed and read.",
    "q_shuffle_hash_join" ->
      "ShuffledHashJoin replaces SortMergeJoin by hint: both sides shuffle but neither sorts — the right call when partitions fit memory and output needn't be key-ordered.",
    "q_reused_exchange" ->
      "The monthly-revenue Exchange appears once; the max-revenue consumer reads a ReusedExchange/ReusedQueryStage instead of recomputing the aggregation.",
    "dedup_incremental" ->
      "The probe (new batch) explodes ~10% of the corpus; the history index is the persisted InMemoryTableScan — join cost is proportional to the BATCH, not history squared.",
    "dq_checks" ->
      "All five scan rules fold into ONE Scan parquet of orders (the uniqueness rule adds the standard two-stage distinct rewrite on top of the same scan — rule count never adds passes over the data); the referential check is a BroadcastHashJoin LeftAnti.",
    "src_time_travel" ->
      "The versioned read is a plain multi-dir FileScan: both snapshot reads push their own work down; no manifest indirection appears at plan level (manifests resolve to paths before planning)."
  ).map { case (n, c) => (n, c, reg(n)) } ++ Seq[(String, String, B)](
    // ---- write-path + iterative sections (round-6 additions) ----
    ("sink_wap",
      "Write-audit-publish leaves NO plan-level indirection: the query over the published table is a plain pruned parquet FileScan of published part files only (staged batches live under an unpublished dir the scan never lists); publish itself was a manifest write + rename, so no rewrite shuffle appears anywhere.",
      reg("sink_wap")),
    ("sink_compact",
      "Small-file compaction is partition-scoped copy-on-write: the read-back is ONE parquet scan over the compacted file set — the only Exchange in the pipeline was the write-side coalesce of the compacted partition, never a full-table shuffle.",
      reg("sink_compact")),
    ("dq_profile_approx (bench shape)",
      "The 100 TB ANALYZE shape: ONE Scan parquet of orders feeding a single two-phase aggregate (partial HLL/min/max/count_if states merged map-side; planned as a SortAggregate pair because string min/max state is not hash-aggregable), NO Expand (the exact twin pays a 4x-rows Expand for multi-column exact NDV), no join, no second pass.",
      (s, d) => SparkEntry.registry("dq_profile_approx").benchFn
        .getOrElse(sys.error("dq_profile_approx must register a bench shape"))
        .apply(s, d)),
    ("mm_feature_extract",
      "Batch media decode: ReadSchema prunes to doc_id alone (payloads are synthesized per-row here; a real corpus would carry binary columns through the same shape), and the decode is a single MapPartitions stage with a per-partition codec. The one Exchange before it is a deliberate RoundRobin repartition of the doc_id keys to core count — the input is a small-file scan whose file splits underparallelize a CPU-bound stage; only ids move, payload bytes are synthesized (or, on a real corpus, read) inside the decode partition and never shuffle.",
      reg("mm_feature_extract")),
    ("ann_ivf_topk (bench shape)",
      "The IVF serving plan: cell assignment of the corpus is pure per-row codegen expression work (graft_cells — no driver round-trip, no shuffle, the centroid matrix rides inside the expression object); the tiny probe set enters the candidate join via BroadcastExchange so the corpus never moves; candidate volume is ~nprobe/cells of the corpus, scored by the codegen dot product, and the only Exchange is the query-keyed top-k window over candidates — at 100 TB the corpus-side work is one scan + expression eval however many cells there are.",
      (s, d) => SparkEntry.registry("ann_ivf_topk").benchFn
        .getOrElse(sys.error("ann_ivf_topk must register a bench shape"))
        .apply(s, d)),
    ("ann_pq_topk (bench shape)",
      "The PQ/ADC serving plan: encode is per-row codegen expression work; the LUT (query x sub x codeword partials) enters via BroadcastExchange; the ADC score is a map-side-combinable hash aggregation, so the shuffle carries ONE row per (query, candidate), never per code; exact rerank touches only the top-rr shortlist. The memory-bound 100 TB serving shape: m bytes per vector move, never the raw floats (until the rr-row rerank fetch).",
      (s, d) => SparkEntry.registry("ann_pq_topk").benchFn
        .getOrElse(sys.error("ann_pq_topk must register a bench shape"))
        .apply(s, d)),
    // ---- round-7 additions ----
    ("src_delta_log",
      "The Delta-format versioned read carries NO plan-level indirection: log replay (JSON actions -> active file set) resolves to concrete parquet paths BEFORE planning, so each snapshot read is a plain multi-file FileScan with normal pushdown/pruning — at 100 TB the log is driver-side metadata and the scan cost is exactly that of an unversioned table. The three per-version aggregations union below it; no extra Exchange beyond each rollup's own agg keys.",
      reg("src_delta_log")),
    ("txt_tfidf",
      "The second Zipf-skew-proof join (fixed at the sf10 decade): head terms (top-1024 by df, df aggregated from tf itself — no second distinct pass) join via BroadcastHashJoin with no shuffle; the tail path's head-exclusion LeftAnti is pushed BELOW the tail (doc, term) aggregation by the optimizer (term is a grouping key), so head tokens are dropped before the tail aggregates, and the remaining tail shuffle join has every tf-side key group <= the head-minimum df — no stopword can funnel ~nDocs rows through one task.",
      reg("txt_tfidf")),
    ("txt_unigram_logprob",
      "The Zipf-skew-proof vocabulary join: head tokens (top-1024 words — the Zipf mass) join via BroadcastHashJoin with NO shuffle; the tail path is a broadcast LeftAnti (cheap head exclusion) followed by a shuffle join whose every key has frequency <= the head minimum, so no task can be hot. The fixed sf1 cliff: a single shuffle join here funnels the top word's tokens through one task however many executors exist.",
      reg("txt_unigram_logprob")),
    // ---- round-8 additions ----
    ("src_delta_skipping",
      "The add.stats data-skipping read: file pruning happens at the METADATA level (driver-side stats-range tests against the replayed add actions), so the plan contains a plain FileScan whose input is ONLY the admitted file subset — no filter-over-all-files shape, no indirection node. The residual range predicate still appears in PushedFilters on that scan (file-grain pruning is necessary, not sufficient), and the aggregate above it is the standard partial/final pair. At 100 TB: planning cost ∝ active-file count, scan cost ∝ admitted files only.",
      reg("src_delta_skipping")),
    // ---- round-9 additions ----
    ("dedup_embedding_srp (bench shape)",
      "The high-dim embedding near-dup scale plan: the SRP projection (graft_srp, planes inside the expression object) is pure per-row codegen work; bucketing is ONE ObjectHashAggregate keyed (band, signature) — the only Exchange of the candidate stage carries bands x n tiny signature rows, never vector payloads, and NO WindowExec or self-join sort appears anywhere (the r13 sf100 fix: the prior window+SMJ formulation sorted the n x bands set three times, ~59 GB of spill); pairs emit inside the sorted per-bucket member array (all-pairs within the cap, adjacent chain above it) and dedupe across bands in a partial/final aggregate; under the verify budget the exact-dot check is a broadcast-lookup FILTER directly over the candidate aggregate — no vector-fetch join at all — while past the budget the fetch joins are shuffle-hash with the memoized normalized-vector cache as build sides. At 100 TB: no n^2 anywhere, no metric-pruning geometry assumption, bucket skew bounded by the cap, nothing candidate-sized sorted or vector-annotated before a shuffle.",
      (s, d) => SparkEntry.registry("dedup_embedding_srp").benchFn
        .getOrElse(sys.error("dedup_embedding_srp must register a bench shape"))
        .apply(s, d)),
    // ---- round-10 additions ----
    ("ann_ivfpq_topk (bench shape)",
      "The composed dim-256 production serving plan (IVF coarse + PQ ADC + exact rerank): corpus-side work is ONE codegen pass emitting (cell, m codes) per vector (graft_cells for both the coarse cell and every per-subspace encode — centroids and codebooks ride inside the expression objects); the probe set and the (query x sub x code) LUT both enter via BroadcastExchange, so the candidate restriction is a broadcast join on cell and the ADC partial lookup never shuffles; the per-(query, candidate) integer sum is a map-side-combinable hash aggregate; only the rr-row shortlist fetches raw vectors for the rerank. At 100 TB: the scan pays dim NOWHERE (codes are dim-free lookups) and n only within probed cells — the FAISS IVF-PQ cost model, as a Spark plan.",
      (s, d) => SparkEntry.registry("ann_ivfpq_topk").benchFn
        .getOrElse(sys.error("ann_ivfpq_topk must register a bench shape"))
        .apply(s, d)),
    // ---- round-11 additions ----
    ("q02_min_cost_supplier",
      "TPC-H Q2's correlated-MIN trap, decorrelated: the supply-edge aggregation (min unit price per (part, supplier)) is the ONLY big shuffle — keyed on the group-by pair with a partial min below it; the part slice and the Europe supplier dim both enter via BroadcastExchange; the per-part MIN side is a second aggregate over the already-joined edges whose equality join-back is again a broadcast (part-count rows). At 100 TB: one lineitem-scale shuffle total, the correlated subquery never re-evaluates per candidate row.",
      reg("q02_min_cost_supplier")),
    ("q11_important_parts",
      "TPC-H Q11's global-scalar HAVING: the per-part value aggregate and the (total, npart) scalar both reduce the SAME broadcast-filtered base; the scalar arrives back as a 1-row BroadcastNestedLoopJoin (the right plan for a single-row side), so the threshold is evaluated once, not per group; both aggregates are partial/final pairs. At 100 TB: two reductions of one scan + a 1-row broadcast — no re-scan, no per-group subquery.",
      reg("q11_important_parts")),
    ("q20_dominant_supplier",
      "TPC-H Q20's nested-IN, decorrelated into two stacked aggregates over ONE filtered scan: per-(part, supplier) quantity and per-part total (an exact decimal sum over the same base — summing the per-supplier doubles would be order-dependent float addition); the >50%-share filter joins them on the part key, and the supplier table is reduced by a LeftSemi on the surviving supplier ids. At 100 TB: the red-part 1997 slice is scanned once; everything downstream is proportional to the supply-edge count, not lineitem.",
      reg("q20_dominant_supplier")),
    ("ann_knn_join (bench shape)",
      "The self-kNN-graph plan (both sides are the corpus — nothing broadcasts): cell assignment and the nprobe probe-list explode are per-row codegen expression work; candidate generation is a cell-keyed ShuffledHashJoin (never sort-merge); the cosine is evaluated in the join's projection so every post-join row is (query, id, cos) — no raw vector ever re-shuffles; and the per-query top-k is a bounded-heap ObjectHashAggregate (graft TopK) whose PARTIAL stage sits in the join stage itself, so the n^1.5 candidate stream is consumed in place — NO Sort and NO Exchange of candidates appears anywhere (the r13 sf100 finding: the previous window formulation's per-partition sort of ~1.1e10 candidate rows spilled past single-host disk; selection needs no sorted input). The single query-keyed Exchange carries one <= k-entry heap per (query, probed cell). At 100 TB: candidate volume is n*nprobe*n/cells ~ n^1.5 at cells~sqrt(n) of pure expression work, and nothing candidate-sized ever touches disk or network.",
      (s, d) => SparkEntry.registry("ann_knn_join").benchFn
        .getOrElse(sys.error("ann_knn_join must register a bench shape"))
        .apply(s, d)),
    ("dedup_semantic (bench shape)",
      "The SemDeDup verdict plan: cell assignment is per-row codegen; the within-cell pair check is a cell-keyed ShuffledHashJoin whose projection evaluates the cosine immediately (post-join rows are (vec_id, dup_of candidates) — no vector re-shuffles); the min-lower-id verdict is a partial/final hash aggregate on vec_id; the verdict join-back to the corpus is keyed on vec_id. At 100 TB: pairwise work is sum_c(n_c^2) ~ n^2/cells (n^1.5 at trained cells~sqrt(n)), never a global product, and skew is bounded by the trained cells' balance.",
      (s, d) => SparkEntry.registry("dedup_semantic").benchFn
        .getOrElse(sys.error("dedup_semantic must register a bench shape"))
        .apply(s, d)),
    ("src_iceberg_pos_delete (MOR read)",
      "The merge-on-read shape: the post-delete read is the plain multi-file FileScan (pushdown/pruning intact — log and manifests resolve to paths before planning) with ONE BroadcastHashJoin LeftAnti applying the position-delete vectors keyed on (_metadata file, row_index); the vectors are the broadcast side by construction (size ∝ deleted rows, never table size). No data file is rewritten at delete time — the write cost moved to a small vector append, the read cost to this one broadcast anti-join. At 100 TB: delete commit ∝ matched rows; read amplification is a metadata-sized broadcast.",
      (s, d) => {
        import graft.sources.IcebergLite
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_audit_mor"
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
        IcebergLite.commitAppend(
          graft.Tables.orders(s, d).select("o_orderkey", "o_orderstatus",
            "o_totalprice"), root)
        IcebergLite.commitPositionDeletes(s, root,
          org.apache.spark.sql.functions.col("o_orderstatus") === "F")
        IcebergLite.readLatest(s, root)
      }),
    ("ch_lttb",
      "The LTTB downsampling plan: ONE sort Exchange (the per-series order) feeding the streaming selection fold (MapGroups/FlatMapGroupsInR-free — a typed flatMapSortedGroups, so the shuffle sort provides the order and no series is ever sorted in heap); the bucket-sum subplan reduces to groups x 18 rows collected as driver metadata (the IVF-centroid class) and the group-stats side enters via BroadcastExchange. At 100 TB: cost is one scan + one sort shuffle however long the series are; per-task state is O(1) plus the final bucket.",
      reg("ch_lttb")),
    ("graph_pagerank (superstep)",
      "The per-iteration unit cost of distributed PageRank: the ranks side enters the contribution join via BroadcastExchange (node-count rows), so the edge index is NEVER shuffled per superstep — the only per-step shuffle Exchange is the dst-keyed contribution aggregation with a partial sum before it. (The left-leg edge-index build with its own Exchanges appears in this audit plan only because the plan is un-persisted; the operator builds eDeg once, loop-invariant, and persists it.) The full operator runs this plan once per superstep behind an eager per-step checkpoint.",
      (s, d) => graft.operators.Graph.pageRankSuperstepPlan(s, d)),
    // ---- round-12 additions ----
    ("graph_pagerank (superstep, PAST the broadcast gate)",
      "The billion-node regime the r11 verdict flagged: ranksBroadcastable gates the hint on measured node count, and past the gate the SAME superstep plans as a ShuffledHashJoin with NO BroadcastExchange in the superstep itself — the exchanged side is the node-count ranks frame (build side by hint), never the edge index (here persisted src-partitioned, as the operator holds it; GraphSpec counts exactly 2 superstep exchanges: ranks-in and the dst-keyed aggregation). A BroadcastExchange visible under the InMemoryRelation is the cached eDeg BUILD plan (one-time, loop-invariant), not per-superstep work. Degradation is graceful: per-superstep data moved stays O(nodes).",
      (s, d) => {
        import org.apache.spark.sql.functions._
        val e = graft.operators.Graph.tradeEdges(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val eDeg = e.join(e.groupBy("src")
          .agg(count(lit(1)).as("deg")), "src")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        eDeg.count(): Unit
        val ranks = e.select(col("src").as("node")).distinct()
          .withColumn("rank_u", lit(graft.operators.Graph.RankUnit / 1000))
        graft.operators.Graph.contributionJoin(eDeg, ranks,
          broadcastRanks = false)
      }),
    ("ch_quantile_tdigest (bench shape)",
      "The mergeable-sketch MV plan: ONE scan of lineitem feeding a two-phase ObjectHashAggregate — partial t-digest states (O(compression) bytes each) built map-side, merged at the final stage; the shuffle carries one digest per (group, map task), never value rows. This is the AggregatingMergeTree materialized-view shape: at 100 TB the value stream folds into bounded state wherever it lands, and read-side merge cost is groups x compression.",
      (s, d) => SparkEntry.registry("ch_quantile_tdigest").benchFn
        .getOrElse(sys.error("ch_quantile_tdigest must register a bench shape"))
        .apply(s, d)),
    ("src_iceberg_eq_delete (MOR read)",
      "The equality-delete read shape: the same plain multi-file FileScan as the position-delete twin, with the key-match applied as a null-safe BroadcastHashJoin LeftAnti (delete-key rows are the broadcast side — size ∝ retracted keys) restricted by the per-file sequence number, which joins on as bounded broadcast metadata (one row per live file). No scan-at-commit, no file rewrites; read amplification is two metadata-sized broadcasts.",
      (s, d) => {
        import graft.sources.IcebergLite
        import org.apache.spark.sql.functions._
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_audit_eqdel"
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
        IcebergLite.commitAppend(
          graft.Tables.orders(s, d).select("o_orderkey", "o_orderstatus",
            "o_totalprice"), root)
        IcebergLite.commitEqualityDeletes(s, root,
          graft.Tables.orders(s, d)
            .filter(col("o_orderstatus") === "F").select("o_orderkey"))
        IcebergLite.readLatest(s, root)
      }),
    // ---- round-13 additions ----
    ("ch_quantile_disc (rank-select)",
      "Exact per-group discrete quantiles WITHOUT the per-group sort: the 5-key partitionBy window sorted every group in ONE task (the sf100 rung's measured parallelism ceiling — ~14.5x/decade with 315 idle partitions); now the plan is groupBy(group, value) partial/final aggregate, the RankSelect range-partitioned prefix sum (two mapPartitions passes over ONE range shuffle, bounded numPartitions-row driver collect), a #groups-row broadcast of the group offsets, and a when()-filtered final aggregate picking the value whose (prev, cum] interval contains ceil(n*p). NO WindowExec anywhere. At 100 TB: parallelism is partition-count, not group-count; per-task state is O(1).",
      reg("ch_quantile_disc")),
    ("ch_equidepth (rank-select)",
      "ntile's equi-depth buckets WITHOUT the per-row ntile sort: each tile is a FIXED rank interval [s, e] (pure arithmetic on the group count), its n is the interval width, and lo/hi are the values AT ranks s and e — selected from the same distributed cumulative distribution as ch_quantile_disc via a 20-row broadcast bounds join. NO WindowExec; the orderkey tiebreak never changes a selected VALUE, only which row carries a boundary rank, so output is byte-identical to the window form (PrefixSumSpec pins it).",
      reg("ch_equidepth")),
    ("ch_mann_whitney",
      "The rank-sum test WITHOUT per-group row buffers (CH sorts both samples in memory): one scan reduces lineitem to the distinct-VALUE count table (partial/final hash aggregate), the pooled tie-averaged ranks come from the range-partitioned prefix-sum pass over values (state O(distinct values), the ks_test device), and the closing U/z arithmetic is a 1-row reduction. At 100 TB: rows never buffer, never re-shuffle; everything after the first aggregate is value-domain-sized.",
      reg("ch_mann_whitney")),
    ("ch_rank_corr",
      "Spearman as Pearson-on-ranks with the ranks on the DIMS: the two per-(group, value) rank tables build from grouped counts with a window that runs over the value-domain-bounded dim (never the fact), both join back via BroadcastHashJoin — the fact table is scanned once and NEVER shuffles — and one partial/final hash aggregate collects the five exact moments. At 100 TB: fact-side cost is scan + two broadcast probes + map-side partials; shuffle volume is groups x moments.",
      reg("ch_rank_corr")),
    ("src_iceberg_prune (distributed manifest scan)",
      "The stats-pruned snapshot read: snapshotFilesDistributed plans the manifest replay as ONE Spark job over the manifest avros (tasks decode + drop tombstones + apply DeltaLog.fileAdmits where the manifests live; the driver receives SURVIVORS only — never the O(files) entry list), so the plan here is a plain FileScan over the admitted subset with the residual range re-applied as a row Filter above it. At 100 TB: driver metadata is bounded by survivors, scan cost by admitted files, and planning never touches the full manifest set.",
      (s, d) => {
        import graft.sources.{DeltaLog, IcebergLite}
        import org.apache.spark.sql.functions._
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_audit_icebprune"
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
        IcebergLite.commitAppend(
          graft.Tables.orders(s, d).select("o_orderkey", "o_orderstatus",
            "o_totalprice").repartitionByRange(8, col("o_orderkey")),
          root)
        IcebergLite.readSnapshotPruned(s, root,
          IcebergLite.currentSnapshotId(s, root),
          Seq(DeltaLog.ColRange("o_orderkey", Some(1L), Some(100L))))
      }))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.drop(1).headOption.getOrElse("PLAN_AUDIT_r14.md")
    // derive the round tag from the output name so the header can't go
    // stale again (r13 verdict: a regenerated audit still said round 9)
    val round = "r(\\d+)".r.findFirstIn(out).getOrElse("HEAD")
    val spark = Session.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append(s"# Plan audit — scale-critical operators ($round)\n\n")
    sb.append("Generated by `runMain graft.PlanAudit` at sf=" + sfDir +
      ". Each section states the property the plan must exhibit for the\n" +
      "operator to hold up at 100 TB, followed by the actual\n" +
      "`explain(\"formatted\")` output (header portion).\n")
    for ((name, claim, build) <- audited) {
      // the bucketed-join audit shows the no-broadcast (fact-fact)
      // shape; planning is lazy, so the conf must hold through the
      // explainString call, not just DataFrame construction
      if (name == "q_bucketed_join")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = build(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      if (name == "q_bucketed_join")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          (64L * 1024 * 1024).toString)
      // keep the operator tree + the first exchanges/scans; the full
      // per-node detail section is long — truncate at 120 lines.
      val lines = formatted.linesIterator.toSeq
      val kept = lines.take(120).mkString("\n")
      sb.append(s"\n## $name\n\n**Must hold:** $claim\n\n```\n$kept\n```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
