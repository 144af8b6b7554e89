package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.mapreduce.{MapReduceSpec, SpecIni}

/** Scale-mechanics gates: salted joins under skew, bucketed co-located
  * joins (no shuffle), and reference-format config parsing. */
class ScaleOpsSuite extends SparkSpec {

  test("saltedJoin returns exactly the plain equi-join result under skew") {
    import spark.implicits._
    // one hot key (90% of rows) + a uniform tail
    val left = spark.range(10000)
      .select(when(col("id") < 9000, 1L).otherwise(col("id")).as("k"),
        col("id").as("lv"))
    val right = spark.range(100)
      .select(col("id").as("k"), (col("id") * 10).as("rv"))
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
    val salted = SkewJoin.saltedJoin(left, right, "k", salt = 8)
      .select("k", "lv", "rv")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedJoin preserves left-outer semantics") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b"), (99L, "c")).toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    val out = SkewJoin.saltedJoin(left, right, "k", salt = 4, "left")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSet === Set((1L, "a", "x"), (2L, "b", "y"), (99L, "c", null)))
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = tmpDir("wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
      spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("a"))
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", wh.resolve("a").toString).saveAsTable("graft_bkt_a")
      spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("b"))
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", wh.resolve("b").toString).saveAsTable("graft_bkt_b")
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, plan:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("partitioned parquet: filters prune partitions at the scan") {
    import spark.implicits._
    val dir = tmpDir("part").resolve("events_bydate").toString
    graft.Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("day").parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-05"),
      s"partition filter must reach the scan:\n$scan")
    // only the matching partition's rows are read
    val expected = graft.Tables.events(spark, sfDir)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(filtered.count() === expected)
    assert(expected > 0)
  }

  test("SpecIni parses the reference config format and validates it") {
    val dir = tmpDir("ini")
    val in1 = dir.resolve("in1.txt")
    java.nio.file.Files.writeString(in1, "hello world\n")
    val ini = dir.resolve("config.ini")
    java.nio.file.Files.writeString(ini,
      s"""n_workers=2
         |worker_ipaddr_ports=localhost:5001,localhost:5002
         |input_files=$in1
         |output_dir=${dir.resolve("out")}
         |n_output_files=8
         |map_kilobytes=500
         |user_id=cs6210
         |""".stripMargin)
    val spec = SpecIni.fromIni(ini.toString)
    assert(spec === MapReduceSpec(Seq(in1.toString),
      dir.resolve("out").toString, 8, 500L, "cs6210"))
  }

  test("SpecIni rejects invalid configs with the reference's rules") {
    val dir = tmpDir("ini2")
    val in1 = dir.resolve("in.txt")
    java.nio.file.Files.writeString(in1, "x\n")
    def conf(overrides: (String, String)*): String = {
      val base = scala.collection.mutable.LinkedHashMap(
        "n_workers" -> "1",
        "worker_ipaddr_ports" -> "localhost:5001",
        "input_files" -> in1.toString,
        "output_dir" -> dir.resolve("out").toString,
        "n_output_files" -> "4",
        "map_kilobytes" -> "100",
        "user_id" -> "u")
      overrides.foreach { case (k, v) => base(k) = v }
      val p = java.nio.file.Files.createTempFile(dir, "c", ".ini")
      java.nio.file.Files.writeString(p,
        base.map { case (k, v) => s"$k=$v" }.mkString("\n"))
      p.toString
    }
    def rejects(overrides: (String, String)*): Unit = {
      val e = intercept[IllegalArgumentException](
        SpecIni.fromIni(conf(overrides: _*)))
      assert(e.getMessage.contains("invalid mapreduce config"))
    }
    rejects("n_workers" -> "0")
    rejects("n_workers" -> "3") // address count mismatch
    rejects("n_output_files" -> "0")
    rejects("map_kilobytes" -> "-5")
    rejects("input_files" -> dir.resolve("nope.txt").toString)
    rejects("output_dir" -> dir.toString) // already exists
  }

  test("hot paths run inside WholeStageCodegen (no interpreted scan-agg)") {
    // The flagship aggregate and the projection/filter query must keep
    // their scan→filter→project→partial-agg pipeline inside generated
    // code; losing the codegen span (e.g. by introducing a
    // CodegenFallback expression in the hot path) is a silent 5-10x.
    Seq("q01_pricing_summary", "q02_project_filter", "q42_scalar_math")
      .foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        // AQE only finalizes (and codegens) the plan on execution, and
        // only collect() runs THIS QueryExecution (df.write plans its own)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("*("), s"$name lost whole-stage codegen:\n$plan")
      }
  }

  test("battery sweep: no cartesian product outside bounded-by-design queries") {
    // A CartesianProduct/BroadcastNestedLoop node is only acceptable
    // where the operands are bounded by construction (tiny dims or an
    // explicitly capped candidate set); anywhere else it would explode
    // at scale. Sweep EVERY declared query's physical plan.
    val boundedByDesign = Set(
      "q16_join_cross",       // 5x25 region x nation, the cross-join demo
      "binseg_split",         // 1-row series-total broadcast onto the day prefix
      "huber_irls",           // three 1-row moment/scale broadcasts, two scans
      "mrl_truncation",       // 5 broadcast query vectors, theta join (x2 dims)
      "tukey_hsd",            // k(k-1)/2 group-pair cross + 1-row MSW broadcast
      "hamilton_apportion",   // k-source bounded pair cross + 1-row totals
      "q17_join_theta",       // non-equi range join, 25-row broadcast side
      "ngram_jaccard_pairs",  // doc_id < 50 capped pair set
      "containment_pairs",    // same doc_id < 50 capped pair set, both directions
      "cosine_pairs",         // 20-vector bounded pair set
      "cosine_topk",          // 5 broadcast query vectors, theta join
      "ndcg_retrieval",       // 20 broadcast query vectors, theta join
      "knn_classify",         // 40 broadcast query vectors x train corpus
      "pq_adc_topk",          // 5 broadcast query vectors vs PQ codes
      "q27_quartile_buckets", // 1-row broadcast of quartile bounds
      "q28_subqueries",       // 1-row broadcast of the scalar aggregate
      "q86_tpch_q22",         // 1-row broadcast of the avg-balance threshold
      "q91_tpch_q15",         // 1-row broadcast of the max-revenue scalar
      "q102_tpch_q11",        // 1-row broadcast of the (total, count) scalar
      "kmeans_embed",         // k=8 centroid-row broadcast per Lloyd iteration
      "cluster_topics",       // same k=8 centroid broadcast (shared Lloyd)
      "nb_langid",            // |langs|-row model-margin + 1-row V/prior broadcasts
      "drift_psi",            // 1-row totals broadcast
      "q95_mmr_rerank",       // 20-row shortlist: 20x20 sim matrix + 1-row argmaxes
      "q96_chi2_terms",       // 1-row corpus-total broadcast
      "q97_js_divergence",    // bounded source-pairs x vocabulary grid
      "curate_corpus",        // 1-row x 1-row report join
      "mixture_allocate",     // 1-row budget broadcast
      "tfidf_top_terms",      // 1-row broadcast of the corpus doc count
      "bm25_topdocs",         // 1-row broadcast of corpus N/avg-len stats
      "rrf_fusion",           // same 1-row corpus-stat broadcasts as bm25/ql
      "hits_scores",          // two 1-row max broadcasts for the norm report
      "kmv_distinct",         // 1-row sketch x 1-row exact report join
      "woe_iv",               // 1-row class-totals broadcast onto 10 bins
      "kaplan_meier",         // 1-row corpus-max-date broadcast
      "grid_spatial_join",    // 1-row pair-count broadcast onto top-15
      "forecast_backtest",    // two 1-row train-anchor broadcasts
      "seq_support",          // 1-row user-total broadcast onto <=25 rows
      "james_stein_shrink",   // 1-row grand-mean + shrink-factor broadcasts
      "conformal_interval",   // 1-row calibration-quantile broadcast
      "rocchio_classify",     // <=10 broadcast centroid rows
      "rich_club",            // 4 broadcast threshold rows
      "brand_modularity",     // 1-row edge-total broadcast onto 25 brands
      "morans_i",             // 1-row cell-totals broadcast + report join
      "tfidf_cosine_pairs",   // 1-row corpus doc-count broadcast
      "getis_ord",            // 1-row exact-moment broadcast onto cells
      "temperature_mix",      // 1-row token-total + normalizer broadcasts
      "dq_scorecard",         // 1-row base x 1-row FK audit join
      "simpson_check",        // 1-row pooled-sign broadcast onto 4 rows
      "fairness_parity",      // 1-row reference-rate broadcast
      "f1_report",            // <=10 broadcast centroid rows (rocchio)
      "dedup_exact_stats", "cosine_dedup_stats",
      "minhash_keepfirst",    // 1-row x 1-row count report
      "lm_perplexity",        // 1-row vocab-size broadcast joined to docs
      "lm_backoff_score",     // 1-row (N, V) model-stats broadcast
      "kneser_ney",           // 1-row bigram-type + vocab-size broadcasts
      "pmi_collocations",     // 1-row corpus-token-total broadcast
      "heavy_hitters",        // 1-row corpus-total broadcast for the share
      "q70_fuzzy_match",      // custkey <= 200 capped length-blocked pairs
      "embed_stats",          // bounded label-centroid stats
      "heaps_law",            // 10x10 theta join on fixed checkpoint buckets
      "q109_acf",             // 5-row literal lag range + 1-row totals broadcast
      "q116_join_cardinality", // 1-row estimate x 1-row actual report join
      "benford_law",          // 1-row grand-total broadcast onto 9 digit rows
      "semdedup",             // k=8 centroid broadcast (shared Lloyd machinery)
      "dsir_weights",         // two 1-row totals broadcasts onto the bucket join
      "ab_srm_check",         // 1-row total broadcast onto 3 split rows
      "dow_seasonality",      // 1-row global-mean broadcast onto 7 dow rows
      "q119_assoc_rules",     // 1-row order-count broadcast onto the rule set
      "neyman_allocation",    // 1-row grid-exact total broadcast onto 5 strata
      "cramers_v",            // 1-row (N, nr, nc) total broadcast onto <=125 cells
      "cusum_drift",          // 1-row (N_days, T) totals broadcast onto the daily series
      "ql_dirichlet",         // 1-row corpus-total + 1-row query-constant broadcasts
      "kendall_tau",          // calendar-bounded ~365-row daily series self-pair join
      "theil_sen",            // same bounded daily pair set + 1-row medians
      "runs_test",            // 1-row median + 1-row x 1-row report join
      "ams_f2",               // 1-row exact x 1-row sketch report join
      "pca_power",            // 1-row infinity-norm broadcast per iteration
      "kcore_peel",           // 1-row x 1-row per-round (nodes, edges) report
      "poisson_bootstrap",    // 1-row point estimate x 1-row CI report join
      "good_turing",          // 1-row corpus-totals broadcast onto <=5 rows
      "term_burstiness",      // 1-row doc-count broadcast onto the vocab relation
      "markov_stationary",    // 1-row state-count broadcast onto <=5 states
      "entropy_rate",         // 1-row state-count + 1-row fold-result report
      "t_closeness",          // <=11 domain-bounded band rows + 1-row totals
      "bh_fdr",               // 3-flag domain grid + 1-row corpus total
      "tree_depth2",          // 1-row root-threshold broadcast onto pass 2
      "er_block_metrics",     // <=200-entity capped audit pair space
      "graph_diameter",       // 1-row literal BFS-seed relations (collapsed
                              // to constants, so Catalyst plans them as
                              // 1-row nested loops by construction)
      "ransac_fit",           // capped sample pair space + <=200-hypothesis
                              // broadcast + 1-row consensus winner
      "sprt_monitor",         // 1-row first-crossing-day broadcast
      "bcubed_eval",          // <80-doc capped audit pair space
      "skipgram_pairs",       // 1-row vocabulary broadcast
      "davies_bouldin",       // 8x8 centroid grid + 1-row index
      "max_drawdown",         // 1-row trough/peak-value broadcast
      "rocchio_expand",       // 1-row corpus-stat broadcasts (bm25's)
      "embed_isotropy",       // 40-vector capped sample pair space
      "grubbs_test",          // 1-row moments broadcast onto the scan
      "ljung_box",            // q109's 5-row literal lag range + 1-row totals
      "capture_recapture",    // three 1-row capture-count broadcasts
      "retention_curve",      // 7-row horizon axis + 1-row cohort size
      "log_rank",             // 2-row group axis + 1-row max/cohort rows
      "mann_kendall",         // calendar-bounded daily pair space + 1-rows
      // round-8 continuation (batches 63-70): every entry below is a
      // 1-row stats broadcast, a literal axis, a <=50-value value-count
      // cross, a calendar-bounded next/prev-day pair space, or an
      // explicitly capped sample panel
      "kruskal_wallis",       // <=50-value cumulative self-join + 1-row H
      "cliffs_delta",         // <=50x50 value-count dominance cross + 1-rows
      "wasserstein_1d",       // <=50-value merged-support joins per flag pair
      "durbin_watson",        // calendar-bounded next-day self-join + 1-rows
      "kendalls_w",           // 1-row (n, m) totals broadcast onto 25 brands
      "friedman_test",        // 1-row chi2/blocks broadcasts onto 7 dow rows
      "var_cvar",             // 2-row alpha axis x distinct-change cum table
      "ccf_leadlag",          // 15-row literal lag axis + 1-row peak broadcast
      "pacf_lags",            // 3-row literal lag axis + 1-row totals
      "hurst_rs",             // calendar-bounded day-index self-join + 4-row
                              // scale axis + 1-row log-log fit broadcast
      "theil_u",              // calendar-bounded consecutive-day triples
      "mase_eval",            // same calendar-bounded triple space
      "quantize_recall",      // 5 broadcast probe vectors, theta join (x2)
      "brier_decomposition",  // 1-row (N, P) totals broadcast onto 10 bins
      "youden_mcc",           // 9-row literal threshold axis x 10 bins
      "lift_gain",            // 10-bin suffix-sum cross + 1-row totals
      "lsh_recall",           // three 1-row count relations in the report join
      "xbar_chart",           // 1-row control-limit broadcast onto weeks
      "ivf_probe_sweep",      // 5 broadcast probe vectors (ground-truth leg)
      "mmd_embeddings",       // stratum-capped (vec_id < 4096) pair space
      "topic_coherence",      // 1-row source-count broadcast + <=200-row
                              // pair panel broadcast
      "boxcox_grid",          // 5-row literal lambda axis x daily series
      "median_polish",        // 25x25 / 3-cell bounded rank joins + 1-rows
      "cvm_test",             // <=50-value cumulative self-join + 1-row
      // round 10
      "kmv_set_ops",          // four 1-row relations in the report join
      "basket_rules",         // 1-row basket-total broadcast onto <=C(25,2)
      "revenue_gini",         // 1-row (n, tot) totals onto ranks + 1-row report
      "cascade_delete_audit", // three 1-row cascade-count × 1-row total crosses
      // round 12
      "hard_negatives")       // <=50-anchor capped broadcast panel, theta join
                              // (qid <> vec_id; the label partition is applied
                              // as a filter on the panel pairs)
    // slo_burn_rate left the list in round 11: its 7-day window is now
    // the bounded ×7 day-key fan-out equi-join (no nested loop).
    // Dead whitelist entries hide rot: every name must still be declared.
    val undeclared = boundedByDesign -- graft.SparkEntry.queries.keySet
    assert(undeclared.isEmpty,
      s"boundedByDesign lists queries that no longer exist: ${undeclared.mkString(", ")}")
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hasCartesian = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (hasCartesian && !boundedByDesign.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded cartesian/nested-loop in: ${offenders.mkString(", ")}")
  }

  test("battery sweep: no partition-less Window in any query plan") {
    // A Window with an empty partition spec funnels every row through
    // ONE task — the q23 scale-killer eliminated in round 4. Assert it
    // never reappears anywhere in the declared battery. (Checked on the
    // optimized logical plan: Window survives optimization and the
    // check needs no AQE finalization.)
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"partition-less (single-task) Window in: ${offenders.mkString(", ")}")
  }
}
