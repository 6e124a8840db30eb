package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Physical-plan assertions: the plans we *want*, not just plans that
  * pass. Guards the scale properties the 100 TB posture depends on —
  * filter/column pushdown into the parquet scan, broadcast for small
  * dims, TakeOrderedAndProject for top-k, sort-merge for fact-fact, and
  * no cartesian products in the LSH candidate generation. */
class PlanChecksSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.queryExecution.executedPlan.toString()
  }

  test("q01: shipdate filter and column pruning reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_orderkey"), "scan reads columns the query never uses:\n" + p)
  }

  test("q02: selective predicate pushed down") {
    val p = plan("q02_filter_project")
    // (toString truncates long filter lists; the status filter is visible)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(o_orderstatus,O)"), p)
  }

  test("q03: dimension joins broadcast (no shuffle on nation/region)") {
    val p = plan("q03_join_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q04: fact-fact join is sort-merge as hinted") {
    val p = plan("q04_join_sortmerge_facts")
    assert(p.contains("SortMergeJoin"), p)
  }

  test("q06/q07: semi and anti joins plan as such") {
    assert(plan("q06_join_semi").contains("LeftSemi"), plan("q06_join_semi"))
    assert(plan("q07_join_anti").contains("LeftAnti"), plan("q07_join_anti"))
  }

  test("q13: global top-k plans TakeOrderedAndProject (no full sort)") {
    val p = plan("q13_topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q35: LSH candidate generation is equi-join only — no cartesian") {
    val p = plan("q35_dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q38: query side broadcast against corpus scan") {
    val p = plan("q38_ann_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q39: bucketed ANN joins on the code — hash-partitionable") {
    // the LSH candidate path itself must stay a pure (band, code)
    // equi-join — no product, no nested loop
    val pl = SimilarityQueries.lshTopK(spark, sf001, 4, 8, 2)
      .queryExecution.executedPlan.toString()
    assert(!pl.contains("CartesianProduct"), pl)
    assert(!pl.contains("BroadcastNestedLoopJoin"), pl)
    // the catalog AUDIT additionally carries the exact q38 baseline,
    // whose 10-row broadcast query side is a nested-loop BY DESIGN
    // (certification baseline, not the index path) — only a true
    // cartesian is banned there
    val p = plan("q39_ann_lsh_bucketed")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q47: IVF assignment is a narrow projection — no product, no per-vector window") {
    // the IVF index path itself: no product, no nested loop
    val p = SimilarityQueries.ivfTopKAuto(spark, sf001)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the catalog AUDIT adds the q38 baseline (10-row broadcast
    // nested loop by design); only a true cartesian is banned there
    val pa = plan("q47_ann_ivf")
    assert(!pa.contains("CartesianProduct"), pa)
    // the only Window exec left is the final per-query top-k rank — the
    // full-corpus assignment window of the old plan is gone. ("Window ["
    // matches the exec node, not WindowGroupLimit.)
    assert(p.split("Window \\[").length - 1 <= 1,
      "more than one Window exec in the IVF plan:\n" + p)
  }

  test("q57: no collect_list over vectors — centroid state is bounded by vector width") {
    // Round-3's oracle-exact q57 shipped sort_array(collect_list(struct(
    // vec_id, v))) per label: every vector of a label materialized in ONE
    // aggregation row — unbounded per-group state, fatal when a label
    // holds billions of vectors. The fixed-point split-sum plan keeps
    // per-(label, dim) state at three longs; the only collect left
    // reassembles the 64 dim-partials per label (bounded by the vector
    // WIDTH, not the corpus). Assert collect_list never sees the vector
    // column or vec_id.
    val p = plan("q57_label_centroid_outliers")
    val collects = "collect_list\\([^)]*\\)".r.findAllIn(p).toList
    collects.foreach { c =>
      assert(!c.contains("vec_id") && !c.contains(" v#") && !c.contains("(v#"),
        s"collect_list aggregates vectors — unbounded per-label state: $c\n$p")
    }
    // and the per-dimension sums are plain codegen'd HashAggregate longs
    assert(p.contains("HashAggregate"), p)
    // the top-3-per-label rank must plan as WindowGroupLimit: each map
    // partition forwards <= 3 rows per label to the reducer, so the
    // final window is never a full per-label sort of the corpus
    assert(p.contains("WindowGroupLimit"),
      "rnk <= 3 did not push into WindowGroupLimit:\n" + p)
  }

  test("q33: exact dedup is a single hash aggregate over one exchange") {
    val p = plan("q33_dedup_exact")
    assert(p.contains("HashAggregate"), p)
    // partial + final aggregate => map-side combine before the shuffle
    assert(p.split("HashAggregate").length >= 3, p)
  }

  test("q53: df never re-shuffles the exploded terms, and no term-partition window exists") {
    // Round-2 verdict: df's terms.distinct().groupBy re-shuffled the
    // biggest intermediate. df now aggregates tf. Two properties matter
    // at 100 TB: (a) no exchange partitioned on the RAW exploded
    // (doc_id, term) rows beyond tf's own two (one per branch — Spark
    // recomputes lineage; a distinct() would add a third on wider rows);
    // (b) the only Window exec is the final per-doc rank — a
    // `count OVER (PARTITION BY term)` would put every document holding
    // a common term into one unsplittable window partition.
    val df = SparkEntry.queries("q53_tfidf_topk")(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
    val windows = p.split("Window \\[").length - 1
    assert(windows <= 1, s"expected only the rank window, found $windows:\n" + p)
    val termDocExchanges = "Exchange hashpartitioning\\(doc_id#\\d+L?, term#\\d+"
      .r.findAllIn(p).size
    assert(termDocExchanges <= 2,
      s"raw exploded terms shuffled $termDocExchanges times:\n" + p)
  }

  test("q64: benchmark shingles broadcast — corpus side never shuffles before the count") {
    val df = SparkEntry.queries("q64_benchmark_contamination")(spark, sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q65: similarity edges come from an equi-join — no cartesian in cluster formation") {
    // inspect the edge-construction plan DIRECTLY: the clustering loop
    // localCheckpoints (truncating lineage), so the final result's plan
    // no longer contains the shingle join and would vacuously pass
    val edges = DedupQueries.clusterEdges(spark, sf001)
    edges.collect()
    val p = edges.queryExecution.executedPlan.toString()
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q66: full-corpus edge construction is the LSH equi-join — no cartesian") {
    // same direct-inspection rationale as q65: the clustering loop
    // checkpoints away its lineage, so guard the plan that BUILDS the
    // full-corpus edges (the part that must survive 100 TB)
    val edges = DedupQueries.lshConfirmedPairs(
      graft.Tables.documents(spark, sf001), 0.5)
    edges.collect()
    val p = edges.queryExecution.executedPlan.toString()
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q67: repetition stats stay inside the row — no explode, no aggregation exchange") {
    // the whole point of the native expression: the naive formulation is
    // Generate(explode) -> HashAggregate x2 with two full-gram-stream
    // exchanges; the shipped plan must have neither. Only the final
    // orderBy's range exchange is allowed.
    val p = plan("q67_repetition_quality")
    assert(p.contains("repetition_stats"), p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("HashAggregate"), p)
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected at most the orderBy exchange, got $exchanges:\n$p")
  }

  test("q69: the corpus window is shard-partitioned; only the shard-totals window is global") {
    // The distributed-prefix-sum contract: the window that sees one row
    // PER DOCUMENT must be partitioned by shard (parallel, bounded
    // partitions); the only partition-less (single-partition) window
    // runs over the per-shard totals — one row per 1,000 docs. A
    // regression that drops the shard partitioning would single-thread
    // the corpus through one window partition at 100 TB.
    val df = SparkEntry.queries("q69_sequence_packing")(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
    val windowLines = p.linesIterator.map(_.trim).filter(_.contains("Window ["))
      .map(_.dropWhile(c => !c.isLetter)).toList
    assert(windowLines.size == 2, s"expected exactly 2 Window execs:\n$p")
    val corpus = windowLines.filter(_.contains("sum(n_tokens"))
    assert(corpus.size == 1 &&
      corpus.head.matches(""".*\], \[shard#\d+L?\], \[doc_id#.*"""),
      s"per-document window is not shard-partitioned:\n${windowLines.mkString("\n")}")
    val global = windowLines.filter(_.contains("sum(tot"))
    assert(global.size == 1 &&
      global.head.matches(""".*\], \[shard#\d+L? ASC.*"""),
      s"shard-totals window shape changed:\n${windowLines.mkString("\n")}")
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    // The other half of the 100x-scan-reduction story next to static
    // pruning (SourceFormatsSpec): the fact side is partitioned on the
    // join key, the dim side carries the only selective predicate — so
    // the partitions to read are unknowable at compile time. DPP injects
    // a runtime subquery filter (reusing the dim broadcast) into the
    // fact scan's PartitionFilters; at 100 TB that is the difference
    // between scanning one partition and scanning them all.
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    spark.range(0, 50000)
      .select($"id", ($"id" % 5).as("r_key"), concat(lit("p-"), $"id").as("payload"))
      .write.partitionBy("r_key").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.range(0, 5)
      .select($"id".as("r_key"), concat(lit("region-"), $"id").as("r_name"))
    val joined = fact.join(dim, Seq("r_key")).where($"r_name" === "region-3")
    // execute THIS queryExecution so the AQE final plan is inspectable
    assert(joined.collect().length == 10000)
    val p = joined.queryExecution.executedPlan.toString()
    assert(p.toLowerCase.contains("dynamicpruning"),
      "no dynamicpruning subquery in the fact scan's PartitionFilters:\n" + p)
  }

  test("AQE skew-join engages on a manufactured skewed fact-fact join") {
    // One key owns ~75% of the left side. At 100 TB this is the shape
    // that strands a single reducer for hours; the engine's posture is
    // AQE skew-split (SURVEY §9.5), so prove it actually engages under
    // this session's configs (thresholds scaled down to test size).
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val skewed = spark.range(0, 300000)
        .select(when($"id" % 4 =!= 0, lit(0L)).otherwise($"id").as("k"),
          concat(lit("payload-"), $"id").as("v"))
      val dim = spark.range(0, 1000).select($"id".as("k"), lit("d").as("dv"))
      val joined = skewed.join(dim, "k")
      // execute THIS queryExecution (count() would wrap a new one and
      // leave the inspected plan unfinalized under AQE)
      assert(joined.collect().nonEmpty)
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.contains("skew=true"),
        "AQE skew-join did not engage; final plan:\n" + p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q71: the rate table broadcasts back; the corpus side never wide-shuffles") {
    val p = plan("q71_domain_mixture_sample")
    assert(p.contains("BroadcastHashJoin"),
      "per-domain rates must ride back as a broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    // the tokenize scan reads only what the mixture needs
    assert(!p.contains("n_chars"), "scan reads columns the query never uses:\n" + p)
  }

  test("q72: assignment is a narrow projection; pairs form only via the cluster equi-join") {
    val p = plan("q72_semantic_dedup")
    assert(p.contains("nearest_cells"),
      "cluster assignment must be the single-pass native expression:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the within-cluster pair stage must join on the cluster id, " +
        "never product the corpus:\n" + p)
  }

  test("q73: scalar bounds broadcast; no cartesian; scan pruned to the two dims") {
    val p = plan("q73_zorder_layout")
    assert(!p.contains("CartesianProduct"), p)
    // 1-row bounds/zmax ride as broadcasts (BNLJ over one row is the
    // intended scalar-join shape, same as q53's corpus-stats scalar)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("o_totalprice"), "scan reads columns the query never uses:\n" + p)
  }

  test("q74: top keys via TakeOrderedAndProject; the rank window sees 10 rows, not the key set") {
    val p = plan("q74_key_skew_profile")
    assert(p.contains("TakeOrderedAndProject"),
      "heavy-key selection must be a top-k, not a full sort/window:\n" + p)
    // the only Window in the plan must sit ABOVE the limit — i.e. the
    // plan has no window directly over the per-key aggregate output
    val winIdx = p.indexOf("Window")
    val takeIdx = p.indexOf("TakeOrderedAndProject")
    assert(winIdx >= 0 && takeIdx > winIdx,
      "rank window must run over the 10 taken rows (window above take):\n" + p)
  }

  test("q75: delta-vs-corpus dedup is all equi-joins — no cartesian, no nested-loop probe") {
    // the asymmetric LSH probe and the hash-index join must both be
    // equi-joins: at 100 TB the fuzzy tier's cost must track
    // |delta| x collision rate, never corpus^2
    val p = plan("q75_incremental_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q76: the frequent-shingle set rides back as a broadcast, not a corpus-side shuffle") {
    // the threshold caps the frequent set's size by construction; joining
    // it back any other way would shuffle the full shingle stream twice
    val df = SparkEntry.queries("q76_boilerplate_ngrams")(spark, sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q77: covariance reduces to one buffer; the grid join is a 1-row broadcast") {
    // the scale claim: shuffle payload is the 2,145-double moment buffer,
    // never a d^2 x N explode — so the corpus side must show exactly one
    // aggregate pair over the embedding scan and no cartesian
    val p = plan("q77_embedding_covariance")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Generate"), "no per-dimension explode of the corpus:\n" + p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "typed CovMoments aggregate present:\n" + p)
  }

  test("q79: ranking is top-k; model statistics come back as broadcasts") {
    val p = plan("q79_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "BM25 ranking must be a top-k, not a full sort:\n" + p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the query-term filter must hit the exploded stream BEFORE the tf
    // aggregate — rows entering the aggregate ∝ query-term hits
    assert(p.contains("spark") && p.contains("Filter"), p)
  }

  test("q80: SCD2 never self-joins the fact table; windows share the user exchange") {
    val df = SparkEntry.queries("q80_scd2_history")(spark, sf001)
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Join"), "gaps-and-islands, not a self-join:\n" + p)
    // one scan of events only
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
    // lag + running-sum share one (user_id) exchange; the segment agg and
    // the lead stitch each re-key once — anything above 3 means a window
    // spec stopped aligning and Spark added a redundant shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p)
  }

  test("q81: LM training and scoring are equi-joins; only V rides a 1-row broadcast") {
    val p = plan("q81_bigram_lm_score")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop allowed is the broadcast of the single-row
    // vocab-size scalar
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q82: per-source medians ride back as broadcasts — corpus never sort-merges") {
    val p = plan("q82_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "tiny per-source stats must broadcast, not shuffle the corpus:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q83: checksum is one scan + one hash aggregate — no joins, no row sort") {
    val df = SparkEntry.queries("q83_table_checksum")(spark, sf001)
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Join"), "anti-entropy must not join anything:\n" + p)
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("HashAggregate"), p)
    // scan must read only the digest columns
    assert(!p.contains("o_totalprice"), "scan reads unused columns:\n" + p)
  }

  test("q86: the funnel is an equi-join chain on user_id — no inequality self-join") {
    val p = plan("q86_funnel_stages")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "funnel stages must join on user_id with the time gate as a " +
        "post-join filter, never an inequality-only join:\n" + p)
  }

  test("q87: cohort matrix plans two aggregates and an equi-join — no window") {
    val p = plan("q87_retention_cohorts")
    assert(!p.contains("Window"), "cohort anchor is an aggregate, not a window:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q88: orphan detection plans LEFT ANTI joins; dim parents broadcast") {
    val p = plan("q88_referential_integrity")
    assert(p.contains("LeftAnti"), "orphans must be anti-joins:\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "nation/region parents must broadcast:\n" + p)
  }

  test("q89: the profile is aggregates only — no joins beyond the union") {
    val p = plan("q89_column_profile")
    assert(!p.contains("Join"), "column profile must not join:\n" + p)
    // exact distinct plans as a two-level aggregate: partial per-value
    // grouping before the final distinct count — never a global collect
    assert(p.contains("partial_count(distinct"),
      "distinct must partial-aggregate per value first:\n" + p)
  }

  test("q90: changelog compacts via ONE aggregate — no window sort over the facts") {
    val p = plan("q90_cdc_merge")
    assert(!p.contains("Window"),
      "compaction must be the max-struct aggregate, not row_number:\n" + p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(p.contains("FullOuter") || p.contains("full_outer"),
      "merge is a full outer join:\n" + p)
  }

  test("q91: candidate generation is equi-join only — no cartesian anywhere") {
    val p = plan("q91_setsim_join_exact")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q92: windows partition by event_type over GRID rows, never the facts") {
    val p = plan("q92_gap_fill_interpolate")
    // the only Exchange feeding a Window hashes event_type (grid side)
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Generate explode"),
      "grid must come from sequence()+explode, not a fact-side scan:\n" + p)
  }

  test("q94: no window and no join — two aggregates build the index") {
    val p = plan("q94_inverted_index")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("q96: only candidate tokens reach the exact aggregate; no window") {
    val p = plan("q96_heavy_hitters")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"),
      "candidate set must broadcast into the confirm pass:\n" + p)
  }

  test("q97: top-k per group is an aggregate, NOT a window sort") {
    val p = plan("q97_topk_per_group")
    assert(!p.contains("Window"),
      "the whole point is replacing row_number():\n" + p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      "typed aggregator must partial-aggregate:\n" + p)
  }

  test("q95: pagerank iterations are equi-joins + sums, no cartesian") {
    val p = plan("q95_pagerank")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q95: iteration reuse — the edge exchange computes once, not once per iteration") {
    // The iteration-reuse contract (see the pagerank Scaladoc: an explicit
    // persist+checkpoint variant measured ~75% slower at sf0.1, so the
    // LAZY plan is the shipped one): the edge subtree appears under every
    // iteration's join, but Catalyst's ReuseExchange must dedup it so the
    // purchase-graph build (lineitem JOIN orders + distinct + union)
    // executes once. A rewrite that defeats the reuse would rescan the
    // fact table `iters`+2 times at 100 TB — fail here instead.
    val df = SparkEntry.queries("q95_pagerank")(spark, sf001)
    df.collect() // finalize AQE so reuse nodes are visible in the final plan
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("ReusedExchange") || p.contains("TableCacheQueryStage")
      || p.contains("InMemoryTableScan"),
      s"no exchange/cache reuse in the iteration plan:\n$p")
  }

  test("q84: diversity has no window over the corpus and no cartesian") {
    val p = plan("q84_token_diversity")
    // per-doc totals come from re-aggregating tc and joining back — the
    // AQE-splittable shape (q53's argument) — never a term/doc window
    assert(!p.contains("Window"), "no window over exploded tokens:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q100: FastSS candidates are a variant equi-join — no cartesian") {
    val p = plan("q100_editdist_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "all-pairs levenshtein would be NLJ:\n" + p)
  }

  test("q102/q107: co-occurrence and triangle joins are all equi-joins") {
    Seq("q102_triangles", "q107_item_similarity").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("q101: drift never builds the dense source x vocab grid") {
    val p = plan("q101_source_drift")
    // the only cross join is the broadcast 1-row corpus total; the
    // dense grid would be a source x term nested-loop join
    assert(!p.contains("CartesianProduct"), p)
    val nlj = p.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
    assert(nlj <= 1, s"only the 1-row total may cross-join ($nlj):\n$p")
  }

  test("q104: OLS is window-min + one aggregate — no collect, no sort-fold") {
    val p = plan("q104_trend_ols")
    assert(!p.contains("collect_list"), "no giant per-group rows:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q109: within-day prefix windows partition by day; carry is day-rows only") {
    val p = plan("q109_concurrency_profile")
    // the change-stream window must be day-partitioned; the only
    // unpartitioned window runs over per-day totals (rows = days)
    val winSpecs = p.split("\n").filter(_.contains("windowspecdefinition"))
    val global = winSpecs.filterNot(_.contains("day#"))
    // user-keyed session windows + day-keyed prefix; the day-total
    // carry and final presentation sort are the only global pieces
    assert(winSpecs.exists(_.contains("day#")),
      "day-sharded prefix missing:\n" + p)
    assert(global.forall(s => !s.contains("es#") || s.contains("day#")),
      "a global window over the change stream:\n" + winSpecs.mkString("\n"))
  }

  test("q110: both arms come from ONE aggregate pass — no self-join") {
    val p = plan("q110_ab_lift")
    assert(!p.contains("Join"), "arm self-join shuffles the facts twice:\n" + p)
  }

  test("q150: the CDC window filter pushes to the orders scan; merge is one key join") {
    // at 100 TB the change feed is the pruned side — a full orders scan
    // here would defeat the point of windowed CDC
    val p = plan("q150_merge_cdc_upsert")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      "CDC date window must reach the parquet scan:\n" + p)
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q152: compaction planning is metadata-sized — one file-stats aggregate, broadcast total") {
    val p = plan("q152_compaction_plan")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the 1-row total must ride as a broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q153: as-of reconstruction is union + aggregate — no join anywhere") {
    // the change log unions filtered projections of ONE scan; the per-key
    // election and the per-version rollup are aggregates. Any join here
    // would mean the reconstruction pays versions x table, not change-log
    val p = plan("q153_snapshot_time_travel")
    assert(!p.contains("Join"), "as-of read must not join:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q156: the row-level as-of read is one key aggregate — no join, no version explode") {
    val p = plan("q156_snapshot_asof_read")
    assert(!p.contains("Join"), "as-of read must not join:\n" + p)
    assert(!p.contains("Generate"), "single-version read must not explode versions:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q154: vacuum planning keeps q150's single-merge-join shape — no cartesian") {
    val p = plan("q154_vacuum_plan")
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      "the one key join feeding the file stats:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q155: the probe product is a BROADCAST over manifest-sized stats") {
    // 6 probe rows x 32 bucket-stat rows — a metadata product by
    // construction; the pin is that the probe side rides as a broadcast
    // (never a shuffled cartesian) and the stats subtree is q73's
    val p = plan("q155_minmax_pruning_audit")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "probes must broadcast against the stats frame:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q157: span dedup is ONE aggregate exchange — no join anywhere") {
    // the Lee-et-al substring pass must stay q33-shaped: explode + one
    // map-side-combinable aggregate on the span; any join here means an
    // accidental pair product over span carriers
    val p = plan("q157_span_dedup")
    assert(!p.contains("Join"), "span dedup must not join:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial"),
      "the span aggregate must map-side combine:\n" + p)
  }

  test("q158: the global-histogram product rides as a BROADCAST; no shuffled cartesian") {
    val p = plan("q158_t_closeness")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the sensitive-domain histogram must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q159: pair counting runs over the vocab and top-k is TakeOrderedAndProject") {
    val p = plan("q159_bpe_merge_candidates")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must not materialize a global sort:\n" + p)
    assert(!p.contains("Join"), "pair expansion must not join:\n" + p)
  }

  test("q160: the CDF pre-image is equi-joins only — no cartesian, no version explode") {
    // pre-images come from ONE key-equi-join of the changed keys against
    // the as-of election; a cartesian or a Generate here would mean the
    // feed pays versions x table instead of change-set + election
    val p = plan("q160_change_data_feed")
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      "the pre-image key join:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Generate"), "no version explode in a CDF read:\n" + p)
  }

  test("q161: the MV delta folds in ONE combinable aggregate over the feed") {
    val p = plan("q161_incremental_mv_refresh")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum") || p.contains("partial"),
      "the delta aggregate must map-side combine:\n" + p)
  }

  test("q162: both retrieval legs end in TakeOrderedAndProject; the query vector broadcasts") {
    // each leg's top-50 must plan as a bounded heap, never a full global
    // sort, and the 1-row query vector rides as a broadcast — the shapes
    // that keep hybrid retrieval corpus-size-free past the legs
    val p = plan("q162_hybrid_retrieval_rrf")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k legs must not materialize a global sort:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the query vector must broadcast against the corpus:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q167: the join keys carry the salt; the small side replicates via explode") {
    // the salted layout must actually reach the physical join: salt in
    // the join keys, sequence-explode on the dim side, and the whole
    // thing stays an equi-join (no cartesian)
    val p = plan("q167_salted_skew_join")
    assert(p.contains("__graft_salt"), "salt column missing from the plan:\n" + p)
    assert(p.contains("Generate") || p.contains("explode"),
      "small-side salt replication missing:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q168: both legs stay top-k; the audit is one 1-row aggregate") {
    val p = plan("q168_rank_agreement")
    assert(p.contains("TakeOrderedAndProject"),
      "legs must not materialize a global sort:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q169: CUPED is aggregate + 1-row broadcast — no window, no self-join") {
    val p = plan("q169_cuped_adjustment")
    assert(!p.contains("Window"), "no window in the adjustment:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the theta scalar must ride as a broadcast:\n" + p)
  }

  test("q166: provenance joins only the span-count frame — no document pair product") {
    // the pair explosion is factored away arithmetically: the only join
    // keys the (span, source) count frame by span (bounded fan-out);
    // a cartesian or a join of document-level frames means the closed
    // form was lost
    val p = plan("q166_span_provenance")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      "the per-span count self-join:\n" + p)
    assert(!p.contains("doc_id#"),
      "a document-level column crossed the join — pair product resurrected:\n" + p)
  }

  test("q164: the parity rollup is ONE combinable aggregate — no join, no window") {
    val p = plan("q164_tokenizer_parity_by_lang")
    assert(!p.contains("Join"), "lang rollup must not join:\n" + p)
    assert(!p.contains("Window"), "lang rollup must not window:\n" + p)
    assert(p.contains("partial"), "the lang aggregate must map-side combine:\n" + p)
  }

  test("q165: every superstep is equi-joins + a min aggregate — no cartesian, shared edge subtree") {
    val p = plan("q165_label_propagation")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"),
      "the labels x edges equi-join:\n" + p)
    // the edge list feeds all three rounds from ONE computed subtree —
    // the q95 iteration-reuse contract; finalize AQE so reuse nodes are
    // visible in the final plan
    val df = SparkEntry.queries("q165_label_propagation")(spark, sf001)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString()
    assert(fin.contains("ReusedExchange") || fin.contains("TableCacheQueryStage")
      || fin.contains("InMemoryTableScan"),
      s"rounds must reuse the edge exchange, not rebuild it:\n$fin")
  }

  test("q163: the depth sweep is a window over manifest-sized events — no interval self-join") {
    // the sweep exists to replace the O(F^2) overlap self-join; the only
    // join allowed is the final bucket->profile equi-join on (dim, lo)
    val p = plan("q163_clustering_depth_audit")
    assert(p.contains("Window"), "the cumulative sweep window:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoopJoin") || p.contains("BroadcastNestedLoopJoin"),
      "no shuffled interval product:\n" + p)
  }

  test("q173: decomposition is ONE data aggregate; MA/seasonal run on the month frame") {
    // the only data-proportional pass is the month rollup; everything
    // downstream (2x12 MA, seasonal index, residuals) is windows over
    // the ~80-row calendar frame — no join touches the fact table twice
    val p = plan("q173_seasonal_decomposition")
    assert(!p.contains("Join"), "decomposition must not join:\n" + p)
    assert(p.contains("Window"), "the MA/seasonal windows:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q174: CUSUM is one (type, day) rollup + per-type windows; mean broadcasts") {
    val p = plan("q174_cusum_changepoint")
    assert(p.contains("BroadcastHashJoin"),
      "the per-type mean must ride as a broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "no data-sized shuffle join in the CUSUM chain:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q176: the probe side broadcasts against ONE corpus scan; no cartesian") {
    val p = plan("q176_matryoshka_fidelity")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "4 probes must ride as a broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      "nothing here is big enough to shuffle-join:\n" + p)
  }

  test("q177: clustering profile rides q102's equi-join triangle plan; no cartesian") {
    val p = plan("q177_local_clustering")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoopJoin") || p.contains("BroadcastNestedLoopJoin"),
      "triangle closure must stay equi-join:\n" + p)
    assert(p.contains("Generate"), "the 3-way triangle attribution explode:\n" + p)
  }

  test("q178: stratified readout is ONE unit aggregate + a 1-row broadcast; no window") {
    val p = plan("q178_post_stratified_ate")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the total must ride as a broadcast:\n" + p)
    assert(!p.contains("Window"), "no window anywhere:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q179: first-occurrence aggregates fold against a BROADCAST checkpoint spine") {
    val p = plan("q179_vocab_growth")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the 14-row threshold spine rides as a broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"),
      "checkpoints are thresholds — no global row_number sort:\n" + p)
  }

  test("q180: every peel round is aggregates + equi-joins; no cartesian") {
    val p = plan("q180_kcore_peel")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoopJoin") || p.contains("BroadcastNestedLoopJoin"),
      "endpoint filtering must stay equi-join:\n" + p)
  }

  test("q181: SRM is ONE rollup aggregate — no join, no window") {
    val p = plan("q181_srm_audit")
    assert(!p.contains("Join"), "assignment-frame rollup must not join:\n" + p)
    assert(!p.contains("Window"), p)
    assert(p.contains("Expand") || p.contains("expand"),
      "the ROLLUP grouping-set expand:\n" + p)
  }

  test("q175: ACF joins only the day frame; the lag spine and moments broadcast") {
    // the self-join runs on the calendar-bounded day rollup; the 7-row
    // lag spine and the 1-row (n, Sx)/den frames must all broadcast —
    // a shuffled product here would mean the join is data-sized
    val p = plan("q175_autocorrelation")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "lag spine and moment frames ride as broadcasts:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "no shuffled cartesian anywhere:\n" + p)
  }

  test("q182/q183: every per-value window is shard-partitioned; only shard totals go global") {
    // The q69 distributed-prefix-sum contract applied to the two-sample
    // scaffold: the value-level cumulative windows (sum(c1)/sum(c0))
    // must be partitioned by shard, and the only partition-less windows
    // run over the per-shard totals (sum(t1)/sum(t0) — one row per
    // $100 price band). The scaffold subtree is referenced from
    // several aggregates, so windows APPEAR repeatedly in the plan —
    // the pin therefore checks the SHAPE of every occurrence rather
    // than counting nodes.
    Seq("q182_ks_two_sample", "q183_mann_whitney_u").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf001)
      df.collect() // finalize AQE
      val p = df.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==")(0)
      val windowLines = p.linesIterator.map(_.trim)
        .filter(_.contains("Window [")).toList
      assert(windowLines.nonEmpty, s"$q lost its windows:\n$p")
      windowLines.foreach { w =>
        if (w.contains("sum(c1") || w.contains("sum(c0"))
          assert(w.matches(""".*\], \[shard#\d+L?\], \[v#.*"""),
            s"$q per-value window not shard-partitioned:\n$w")
        else if (w.contains("sum(t1") || w.contains("sum(t0"))
          assert(w.matches(""".*\], \[shard#\d+L? ASC.*"""),
            s"$q shard-totals window shape changed:\n$w")
        else fail(s"$q unexpected window:\n$w")
      }
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("q184: one unit aggregate + one rollup expand; no window, no cartesian") {
    val p = plan("q184_diff_in_diff")
    assert(!p.contains("Window"), "DiD needs no window:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Expand") || p.contains("expand"),
      "the ROLLUP grouping-set expand:\n" + p)
  }

  test("q185: top-k is TakeOrdered; the 256-cell sketch frames broadcast") {
    val p = plan("q185_countmin_estimate")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must not global-sort:\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "cell frames must broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "no shuffled join against 256-row frames:\n" + p)
  }

  test("q186: ONE aggregate pass — no join, no window") {
    val p = plan("q186_ams_f2_sketch")
    assert(!p.contains("Join"), "sketch + exact fold in one pass:\n" + p)
    assert(!p.contains("Window"), p)
  }

  test("q187: ntiles run over the per-customer aggregate, never raw orders") {
    val df = SparkEntry.queries("q187_rfm_segmentation")(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    // the q106 scale contract: the global-sort windows are only ever fed
    // the aggregated customer frame — an aggregate must sit BELOW the
    // first Window exec in the plan text (plans print top-down, so the
    // aggregate appears after the window line it feeds)
    val lines = p.linesIterator.toList
    val firstWin = lines.indexWhere(_.contains("Window ["))
    assert(firstWin >= 0, p)
    assert(lines.drop(firstWin).exists(_.contains("HashAggregate")),
      "no aggregate below the ntile windows — they see raw orders:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q188: metadata-only plan — no window, no shuffled join") {
    val p = plan("q188_orphan_file_audit")
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "the 1-row max frame must broadcast:\n" + p)
    assert(p.contains("Union"), "committed + aborted attempt branches:\n" + p)
  }

  test("q189: every LTV window is cohort-partitioned") {
    val df = SparkEntry.queries("q189_cohort_ltv")(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    val windowLines = p.linesIterator.map(_.trim)
      .filter(_.contains("Window [")).toList
    assert(windowLines.nonEmpty, p)
    windowLines.foreach { w =>
      assert(w.matches(""".*\], \[cohort_m#\d+L?\], \[age_m#.*"""),
        "LTV window lost its cohort partitioning:\n" + w)
    }
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q190: k-minimum selection is TakeOrdered; the only window runs over 128 rows") {
    val p = plan("q190_kmv_distinct_estimate")
    assert(p.contains("TakeOrderedAndProject"),
      "k smallest hashes must not global-sort:\n" + p)
    assert(p.split("Window \\[").length - 1 == 1,
      "exactly one (tiny) rank window:\n" + p)
  }

  test("q191: sketches are TakeOrdered; set ops never cartesian data") {
    val p = plan("q191_theta_set_ops")
    assert(p.contains("TakeOrderedAndProject"),
      "the two 64-row sketches must not global-sort:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), "no window anywhere in the algebra:\n" + p)
  }

  test("q192: the lag window is customer-partitioned; rollup expands") {
    val df = SparkEntry.queries("q192_purchase_intervals")(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    val windowLines = p.linesIterator.map(_.trim)
      .filter(_.contains("Window [")).toList
    assert(windowLines.nonEmpty, p)
    windowLines.foreach { w =>
      assert(w.matches(""".*\], \[k#\d+L?\], \[day#.*"""),
        "gap lag window lost its customer partitioning:\n" + w)
    }
    assert(p.contains("Expand") || p.contains("expand"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q193: novelty is aggregates + one shingle equi-join; no window") {
    val p = plan("q193_ngram_novelty")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "shingle join must stay equi:\n" + p)
  }

  test("q194: the shipdate year filter prunes the lineitem scan") {
    val p = plan("q194_price_index")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "year filter must reach the scan:\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("Window"), p)
  }

  test("q195: the Pareto window orders the per-part aggregate, never lineitem") {
    val df = SparkEntry.queries("q195_abc_classification")(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    val lines = p.linesIterator.toList
    val firstWin = lines.indexWhere(_.contains("Window ["))
    assert(firstWin >= 0, p)
    assert(lines.drop(firstWin).exists(_.contains("HashAggregate")),
      "no aggregate below the Pareto window - it sees raw lineitem:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q196: dimension joins broadcast; every window is nation-partitioned") {
    val df = SparkEntry.queries("q196_weighted_median_discount")(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"),
      "supplier/nation must broadcast:\n" + p)
    val windowLines = p.linesIterator.map(_.trim)
      .filter(_.contains("Window [")).toList
    assert(windowLines.nonEmpty, p)
    windowLines.foreach { w =>
      assert(w.contains("[nation#"),
        "weighted-median window lost its nation partitioning:\n" + w)
    }
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q197: confusion matrix is one aggregate + a broadcast row-total join") {
    val p = plan("q197_langid_confusion")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"),
      "the 16-cell row-total join must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q198: AUC is aggregate + one bounded window + 1-row fold; no join") {
    val p = plan("q198_feature_auc")
    assert(!p.contains("Join"), "single-pass AUC:\n" + p)
    assert(p.split("Window \\[").length - 1 == 1,
      "one cumulative window over the bounded value frame:\n" + p)
  }

  test("q199: lambda is one grid aggregate + 1-row folds; no window, no cartesian") {
    val p = plan("q199_gk_lambda")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q200: IPS is one per-action aggregate; scan pruned to (type, value)") {
    val p = plan("q200_ips_offpolicy")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("props"),
      "events scan must prune to event_type/value:\n" + p)
  }

  test("q202: rho windows run over the bounded marginals only") {
    val p = plan("q202_spearman_rho")
    // exactly two cumulative windows: the <=50-row qty marginal and
    // the <=11-row discount marginal — never the lineitem rows
    assert(p.split("Window \\[").length - 1 == 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      "rank frames must broadcast back onto the grid:\n" + p)
  }

  test("q203: no brand-wide row window — cumulative index is sharded") {
    val df = SparkEntry.queries("q203_trimmed_means")(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    val windowLines = p.linesIterator.map(_.trim)
      .filter(_.contains("Window [")).toList
    assert(windowLines.nonEmpty, p)
    // every window partitions by brand, and the in-shard cumulative one
    // also carries the shard key — no window sees a whole brand's rows
    windowLines.foreach { w =>
      assert(w.contains("brand#"),
        "window lost its brand partitioning:\n" + w)
    }
    assert(windowLines.exists(_.contains("shard#")),
      "in-shard cumulative window must partition by (brand, shard):\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "part dim and spine frames must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q204: FD profiling is independent aggregates unioned; no window, no cartesian") {
    val p = plan("q204_fd_profile")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Union"), p)
  }

  test("q205: candidates come from a shingle equi-join; rank window is per-query") {
    val df = SparkEntry.queries("q205_retrieval_eval")(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "retrieval candidates must stay shingle-blocked:\n" + p)
    val windowLines = p.linesIterator.map(_.trim)
      .filter(_.contains("Window [")).toList
    assert(windowLines.nonEmpty, p)
    windowLines.foreach { w =>
      assert(w.contains("q_id#"),
        "rank window lost its per-query partitioning:\n" + w)
    }
  }

  test("q206: calibration is a single 11-cell aggregate — no join, no window") {
    val p = plan("q206_calibration_bins")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q210: the as-of snapshot is a union + window carry — no join at all") {
    // The feature-store read must never plan a per-key range join or a
    // cross product: AsOf's union + last-value carry is the shape that
    // survives 100 TB, and a Join appearing here means the carry
    // degenerated (joinAsOf output feeds straight into the final select).
    val p = plan("q210_feature_snapshot")
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }

  test("q211: partials are bucket-partitioned windows; no data cartesian") {
    val df = SparkEntry.queries("q211_sketch_lifecycle")(spark, sf001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"), p)
    // the per-bucket sketch windows keep their g# partitioning (a global
    // unpartitioned window over the key stream would serialize at scale;
    // the only global ordering allowed is the TakeOrdered 64-row sketch)
    val windowLines = p.linesIterator.map(_.trim)
      .filter(_.contains("Window [")).toList
    assert(windowLines.nonEmpty, p)
    windowLines.foreach { w =>
      assert(w.contains("g#"), "sketch window lost bucket partitioning:\n" + w)
    }
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q214: scan pruned to the survival columns; grid joins only") {
    val p = plan("q214_logrank_test")
    // durations need (user_id, ts, event_type) only — value/event_id in
    // the scan mean pruning broke
    assert(!p.contains("event_id"), "scan reads event_id:\n" + p)
    assert(!p.contains("value#"), "scan reads value:\n" + p)
    // every window-free fold goes through sort_array aggregation; no
    // per-user pairwise structure may appear
    assert(!p.contains("Window"), p)
  }

  test("q215/q216: the B-way explode runs over the USER rollup, not events") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    for (name <- Seq("q215_permutation_test", "q216_bh_fdr")) {
      val df = SparkEntry.queries(name)(spark, sf001)
      // the Generate (explode) must sit ABOVE the per-user rollup
      // aggregate — exploding raw events would multiply the scan by B;
      // above the rollup the expansion is bounded by |users| x B and
      // map-side partial aggregation collapses it again
      val gens = df.queryExecution.optimizedPlan.collect {
        case g: Generate => g }
      assert(gens.nonEmpty, s"$name: no explode in plan")
      gens.foreach { g =>
        assert(g.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"$name: explode not above an aggregate (events x B expansion):\n"
            + g.treeString)
      }
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), p)
      // events scan for the metric needs (user_id[, event_type], value)
      assert(!p.contains("ts:timestamp"), s"$name scan reads ts:\n" + p)
    }
  }

  test("q217: the dirty test joins the BROADCAST group-sized MV; no cartesian") {
    val p = plan("q217_retractable_max_mv")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the refresh never windows — two-path algebra is pure aggregation
    assert(!p.contains("Window"), p)
  }

  test("q218: the encoder is ONE combinable aggregate chain — no window, no cartesian") {
    val p = plan("q218_target_encoding")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin")
      || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q219: the only data-sized pass is the user-partitioned lag window") {
    val p = plan("q219_markov_backtest")
    assert(!p.contains("CartesianProduct"), p)
    val windowLines = p.linesIterator.map(_.trim)
      .filter(_.contains("Window [")).toList
    assert(windowLines.nonEmpty, p)
    // the lag window must keep its user partitioning (a global window
    // over events would serialize); the election windows run on the
    // 25-cell grid and partition by prev_t
    windowLines.foreach { w =>
      assert(w.contains("user_id#") || w.contains("prev_t#"),
        "window lost its partitioning:\n" + w)
    }
  }

  test("q225: the B-way explode runs over the USER rollup; scan stays pruned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    val df = SparkEntry.queries("q225_poisson_bootstrap_ci")(spark, sf001)
    // same contract as q215/q216: exploding raw events would multiply
    // the scan by B; above the per-user rollup the expansion is
    // |users| x B and map-side partial aggregation collapses the wire
    // back to B rows per partition
    val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.nonEmpty, "no explode in plan")
    gens.foreach { g =>
      assert(g.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        "explode not above an aggregate (events x B expansion):\n"
          + g.treeString)
    }
    val p = plan("q225_poisson_bootstrap_ci")
    // the only joins are on the 199-row replicate/rank frames — never a
    // data-sized cartesian (the rank self-join is the B x B election)
    assert(!p.contains("ts:timestamp"), "scan reads ts:\n" + p)
    assert(!p.contains("event_type"), "scan reads event_type:\n" + p)
  }

  test("q235/q236/q238: agreement family is single-pass aggs, no data cartesian") {
    // every crossJoin in the family attaches a broadcast 1-row scalar
    // frame (the established audit shape) — a CartesianProduct would
    // mean a data-sized pair blowup
    Seq("q235_cohens_kappa", "q236_mcnemar_test",
        "q238_hamilton_apportionment").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
    // q236 is ONE combinable pass: a single physical aggregate pair
    // (partial+final), no join anywhere
    val p236 = plan("q236_mcnemar_test")
    assert(!p236.contains("Join"), "mcnemar should not join:\n" + p236)
  }

  test("q239/q240: set cover defers + persists the incidence; no cartesian") {
    Seq("q239_greedy_set_cover", "q240_fleiss_kappa").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
    // the catalog entry is a LazyStage (per-step winner checkpoints —
    // the q237 lesson) and the (source, shingle) incidence persists
    // once per session via SharedFrames, so every greedy step reads
    // the cached frame instead of re-running explode + distinct
    val p239 = plan("q239_greedy_set_cover")
    assert(p239.contains("ExistingRDD") || p239.contains("Scan"), p239)
    val df = SparkEntry.queries("q239_greedy_set_cover")(spark, sf001)
    df.collect() // materialize the stage so the shared frame exists
    val inner = AgreementQueries.greedySetCoverFromInc(
      graft.plans.SharedFrames(spark, sf001, "sc_inc") {
        AgreementQueries.scIncidence(graft.Tables.documents(spark, sf001))
      }, steps = 2)
    val pi = inner.queryExecution.executedPlan.toString()
    assert(pi.contains("InMemoryTableScan")
      || pi.contains("TableCacheQueryStage"),
      s"incidence not persisted across steps:\n$pi")
  }

  test("q241/q242: richness and MH are combinable agg chains, no cartesian") {
    Seq("q241_vocab_richness", "q242_mantel_haenszel").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("Window"), s"window-free by design — $q:\n$p")
    }
  }

  test("q243/q244: election joins on aggregates only; no cartesian, no corpus window") {
    Seq("q243_continuation_table", "q244_cochran_armitage").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
    // q243's only window is the 50-row rank; the election joins must
    // sit ABOVE the trigram aggregate (vocab^3-bounded), which the
    // no-cartesian pin plus the aggregate-below-join shape guarantees
    val p244 = plan("q244_cochran_armitage")
    assert(!p244.contains("Window"), "q244 is window-free:\n" + p244)
  }

  test("q245: seed frame broadcasts; assignment never shuffles the corpus") {
    val p = plan("q245_kmeans_assign_audit")
    assert(!p.contains("CartesianProduct"), p)
    // the k-seed cross join must be the BROADCAST nested-loop shape
    // (k rows against the corpus scan), never a shuffle-side pairing
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q237: catalog entry defers; inner iterations broadcast the strength frame") {
    // the catalog entry is a LazyStage (iterative fixpoint with
    // per-step localCheckpoint — the q65 pattern): plan construction
    // must be the deferred scan, not the eager iteration
    val p = plan("q237_bradley_terry")
    assert(p.contains("ExistingRDD") || p.contains("Scan"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the INNER result plan: the iterations ran eagerly behind the
    // checkpoint boundary (ExistingRDD scans are the evidence — a
    // lazy chain here re-executed 2^iters times, the 151 s failure
    // this shape replaced), and the ranking stage is TakeOrdered
    // over the checkpointed frame with no cartesian
    val pr = AgreementQueries.btPairs(
      graft.Tables.lineitem(spark, sf001))
    val inner = AgreementQueries.bradleyTerryFromPairs(pr, iters = 2,
      k = 20)
    val pi = inner.queryExecution.executedPlan.toString()
    assert(!pi.contains("CartesianProduct"), pi)
    assert(pi.contains("ExistingRDD"),
      "iterations must land behind a checkpoint boundary:\n" + pi)
    assert(pi.contains("TakeOrderedAndProject"), pi)
  }

  test("r12 curation battery: no cartesian anywhere; ranks stay partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical
    val battery = Seq("q248_speculative_acceptance", "q249_pass_at_k",
      "q250_curriculum_pacing", "q251_condorcet_copeland",
      "q252_draft_coverage_curve", "q253_loo_source_ablation",
      "q254_crosssource_redundancy", "q255_dsir_sign_score",
      "q256_prefix_cache_sharing", "q257_sax_symbols",
      "q258_decontamination_impact", "q259_novelty_attribution",
      "q260_context_length_sizing", "q261_simpson_reversal",
      "q262_chunk_overlap_provenance", "q263_wilson_intervals")
    for (q <- battery) {
      val df = SparkEntry.queries(q)(spark, sf001)
      val p = df.queryExecution.executedPlan.toString()
      assert(!p.contains("CartesianProduct"), q + ":\n" + p)
      // RangeRank consumers: the only windows are per-bucket (q250's
      // stage ntile, q252's type rank) or bounded top-k tails — no
      // unpartitioned window over a data-proportional frame. The
      // top-k rank windows run AFTER limit(k), so the frame a
      // single-partition window would sort is k rows, never data —
      // pin that every unpartitioned window sits above a Limit.
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: logical.Window if w.partitionSpec.isEmpty &&
          !w.collectFirst { case _: logical.GlobalLimit => () }.isDefined => w
      }
      assert(bad.isEmpty,
        s"$q has an unpartitioned window over an unbounded frame:\n" +
          df.queryExecution.optimizedPlan.toString())
    }
    // q258's benchmark shingle set must broadcast (eval suites are
    // small by nature — a shuffle here would shuffle the corpus side)
    val p258 = SparkEntry.queries("q258_decontamination_impact")(
      spark, sf001).queryExecution.executedPlan.toString()
    assert(p258.contains("BroadcastHashJoin"), p258)
    // q264's Hamilton remainder rank runs on the |strata|-row frame
    // (the q238 shape — domain-bounded, so its unpartitioned window
    // is exempt from the Limit rule above); only a cartesian is banned
    val p264 = SparkEntry.queries("q264_neyman_allocation")(
      spark, sf001).queryExecution.executedPlan.toString()
    assert(!p264.contains("CartesianProduct"), p264)
  }

  test("q106/q187/q195: global ranks plan NO unpartitioned window") {
    // VERDICT r11 finding 3: an unpartitioned Window.orderBy plans as
    // Exchange SinglePartition — ONE task sorting the whole
    // data-proportional frame. These three now rank via RangeRank
    // (literal boundary buckets + per-bucket windows + broadcast
    // offset prefix sums); the pin is that no Window with an empty
    // partition spec survives anywhere in the optimized plan, so the
    // claim "exact form holds to ~10^9 groups" matches the plan Spark
    // actually produces. (Scalar total aggregates — q195's
    // sum(rev) — still single-partition their <= #partitions partial
    // rows; that is partition-count-bounded, not data-proportional,
    // and stays allowed.)
    import org.apache.spark.sql.catalyst.plans.logical
    for (q <- Seq("q106_equifreq_binning", "q187_rfm_segmentation",
        "q195_abc_classification")) {
      val df = SparkEntry.queries(q)(spark, sf001)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: logical.Window if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$q still carries ${bad.size} unpartitioned window(s):\n" +
          df.queryExecution.optimizedPlan.toString())
      val p = df.queryExecution.executedPlan.toString()
      assert(p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastNestedLoopJoin"),
        q + " should broadcast the offsets frame:\n" + p)
    }
  }
}
