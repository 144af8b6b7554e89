package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mechanism pins for the round-13 operators, at sf0.001 — the spec
  * leg of the oracle+spec+plan discipline. The three new rows are the
  * AvailableNow backfill trigger, the query-evolution restart (plus
  * its pinned UNSUPPORTED state-schema change), and the SQL-text API
  * parity; each spec proves the mechanism actually FIRED
  * (anti-vacuity), not just that the result matched.
  */
class Round13OpsSuite extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  private def eventCount(): Long =
    graft.Tables.events(spark, sfDir).count()

  // -------------------------------------- stream_available_now_parity ---

  test("stream_available_now_parity: the backfill is rate-limited " +
    "(>= 4 data batches), SELF-terminates, and a second AvailableNow " +
    "run from the same checkpoint is a zero-input no-op") {
    val r = StreamingOps.runAvailableNow(spark, sfDir)
    // rate limit honored: 4 chunk files under maxFilesPerTrigger=1 can
    // never fold into one giant batch
    assert(r.run1BatchIds.size >= 4,
      s"expected >= 4 rate-limited data batches, got ${r.run1BatchIds}")
    // the trigger's defining contract: the query stopped ITSELF after
    // draining the snapshot (awaitTermination returned true, no stop()
    // from the harness) — both runs
    assert(r.run1SelfTerminated, "run 1 hit the 120s safety timeout " +
      "instead of terminating itself")
    assert(r.run2SelfTerminated, "run 2 hit the 120s safety timeout " +
      "instead of terminating itself")
    // run 1 consumed the whole fixture, exactly once
    assert(r.run1Rows == eventCount(),
      s"run 1 read ${r.run1Rows} rows, fixture has ${eventCount()}")
    // idempotent catch-up: run 2 found the checkpoint current and read
    // NOTHING (a from-scratch rerun would re-read all 4 chunks and
    // double-emit into the sink)
    assert(r.run2DataBatches == 0 && r.run2Rows == 0,
      s"second AvailableNow run was not a no-op: " +
        s"${r.run2DataBatches} data batches / ${r.run2Rows} rows")
  }

  // --------------------------------------------- stream_evolve_parity ---

  test("stream_evolve_parity: the evolved restart RESUMES (batch ids " +
    "advance, tail chunks only) and emissions carry phase-1 state") {
    val r = StreamingOps.runEvolve(spark, sfDir)
    // phase 1 really ran and emitted
    assert(r.preBatchIds.nonEmpty && r.preEmits > 0)
    // the restart resumed the checkpoint: batch ids continue past the
    // stop point (a silent from-scratch rerun would reset to 0)
    assert(r.postBatchIds.nonEmpty &&
      r.postBatchIds.min > r.preBatchIds.max,
      s"post-restart batch ids ${r.postBatchIds} did not advance past " +
        s"pre-stop ids ${r.preBatchIds}")
    // offsets restored: the two phases read the fixture exactly once
    // between them (phase 2 never re-read chunks 0-1)
    assert(r.preRows + r.postRows == eventCount(),
      s"phases read ${r.preRows} + ${r.postRows} rows, " +
        s"fixture has ${eventCount()}")
    val rows = r.result.collect()
    // the evolved output column is the derived integer mean
    rows.foreach { row =>
      assert(row.getLong(3) == row.getLong(2) / row.getLong(1),
        s"cents_per_event mismatch on $row")
    }
    // STATE RESUME IS LOAD-BEARING: some user's final n_events exceeds
    // what the tail chunks alone contain — phase-1 state flowed into
    // phase-2 emissions (a state-less restart would equal the
    // tail-only counts and also fail the oracle gate)
    val chunks = StreamingOps.timeChunkDir(spark, sfDir)
    val raw = spark.read.option("pathGlobFilter", "chunk_0[23].parquet")
      .parquet(chunks)
    val tailOnly = raw.groupBy("user_id")
      .agg(count(lit(1)).as("tail_n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val carried = rows.count(row =>
      row.getLong(1) > tailOnly.getOrElse(row.getLong(0), 0L))
    assert(carried > 0, "no emission carried phase-1 state — the " +
      "restart was equivalent to a state-less rerun")
    // and the emitted user set is exactly the tail-active users
    assert(rows.map(_.getLong(0)).toSet == tailOnly.keySet)
  }

  test("stream_evolve_parity: the UNSUPPORTED evolution (widened STATE " +
    "encoder under the same state name) fails LOUDLY at the " +
    "state-schema compatibility check") {
    val msg = StreamingOps.runEvolveBadRestart(spark, sfDir)
    assert(msg.nonEmpty, "the incompatible restart did not fail at all")
    assert(msg.contains("STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE"),
      s"expected the state-schema error class, got:\n${msg.take(500)}")
    // the error names both schemas — the operator tells the user WHAT
    // changed, not just that something did
    assert(msg.contains("_3,LongType") || msg.contains("_3"),
      s"error does not name the widened field:\n${msg.take(500)}")
  }

  // --------------------------------------------- minhash_incremental ---

  test("minhash_incremental: batch-vs-corpus only (parity split " +
    "respected), and the banded candidate path recalls EXACTLY the " +
    "brute-force cross-parity pair set") {
    val out = run("minhash_incremental").collect()
    assert(out.nonEmpty, "no batch document matched the corpus — " +
      "fixture has no cross-parity near-dups, gate is vacuous")
    // incremental contract: flagged ids are batch (odd), matches are
    // corpus (even) — no corpus x corpus or batch x batch pair leaks
    out.foreach { r =>
      assert(r.getLong(0) % 2 == 1, s"batch_id ${r.getLong(0)} not odd")
      assert(r.getLong(1) % 2 == 0, s"corpus_id ${r.getLong(1)} not even")
    }
    // recall replay: the full banded+verified pair set equals the
    // exact >= 0.8 cross-parity Jaccard join computed brute-force
    val docs = graft.Tables.documents(spark, sfDir)
    val p = graft.dedup.MinHashLSH.Params(
      numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.8)
    val banded = graft.dedup.MinHashLSH.dedupPairsAgainst(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", p)
      .select("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"),
      graft.dedup.MinHashLSH.shingleSet(col("text"), 3).as("grams"))
    val exact = sh.as("b").filter(col("b.doc_id") % 2 === 1)
      .crossJoin(sh.as("c").filter(col("c.doc_id") % 2 === 0))
      .select(col("b.doc_id").as("batch_id"), col("c.doc_id").as("corpus_id"),
        (size(array_intersect(col("b.grams"), col("c.grams"))).cast("double") /
          size(array_union(col("b.grams"), col("c.grams")))).as("j"))
      .filter(col("j") >= 0.8)
      .select("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact,
      s"banded pair set diverges from brute force: " +
        s"missing=${(exact -- banded).take(5)} " +
        s"extra=${(banded -- exact).take(5)}")
    // NOTE: the crossJoin above is the TEST's brute-force ground truth
    // at sf0.001 (250 x 250 docs), never the operator's plan
  }

  // -------------------------------------------- stream_conf_pin_parity ---

  test("stream_conf_pin_parity: the checkpoint pins 8 state " +
    "partitions against a restart under conf 32, and the resume is " +
    "real") {
    val r = StreamingOps.runConfPin(spark, sfDir)
    assert(r.preStateParts == 8,
      s"phase 1 should run 8 state partitions, got ${r.preStateParts}")
    // THE contract: the session said 32, the checkpoint must win
    assert(r.postStateParts == 8,
      s"restart re-partitioned state to ${r.postStateParts} — the " +
        "checkpoint's layout must override the session conf")
    assert(r.postBatchIds.nonEmpty &&
      r.postBatchIds.min > r.preBatchIds.max,
      s"post-restart batch ids ${r.postBatchIds} did not advance past " +
        s"${r.preBatchIds}")
    assert(r.preRows + r.postRows == eventCount(),
      s"phases read ${r.preRows} + ${r.postRows} rows, " +
        s"fixture has ${eventCount()}")
  }

  // ------------------------------------------ dynamic_overwrite_audit ---

  test("dynamic_overwrite_audit: dynamic mode replaces ONLY the " +
    "touched partition; static mode would drop every other partition") {
    import scala.jdk.CollectionConverters._
    def listing(dir: java.nio.file.Path): Map[String, Seq[String]] =
      scala.util.Using.resource(java.nio.file.Files.list(dir)) { st =>
        st.iterator().asScala
          .filter(p => java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("month="))
          .map { p =>
            val files = scala.util.Using.resource(
              java.nio.file.Files.list(p)) { fs =>
              fs.iterator().asScala.map(f =>
                s"${f.getFileName}:${java.nio.file.Files.size(f)}")
                .toSeq.sorted
            }
            p.getFileName.toString -> files
          }.toMap
      }
    val ord = graft.Tables.orders(spark, sfDir)
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
    val minMonth = ord.agg(min("month")).head.getString(0)
    val upd = ord.filter(col("month") === minMonth)
      .withColumn("o_orderkey", -col("o_orderkey"))
    // dynamic: only the min-month partition may change
    val dynDir = tmpDir("dynover_dyn_")
    ord.write.mode("overwrite").partitionBy("month").parquet(dynDir.toString)
    val before = listing(dynDir)
    assert(before.size > 1, s"fixture spans ${before.size} months — " +
      "the audit needs untouched partitions to exist")
    upd.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("month").parquet(dynDir.toString)
    val after = listing(dynDir)
    assert(after.keySet == before.keySet,
      "dynamic overwrite changed the partition set")
    val untouched = before.keySet - s"month=$minMonth"
    untouched.foreach { m =>
      assert(after(m) == before(m),
        s"dynamic overwrite touched unrelated partition $m")
    }
    assert(after(s"month=$minMonth") != before(s"month=$minMonth"),
      "the corrected partition was not rewritten")
    // static counterfactual (Spark's default): the same write nukes
    // every other partition — the failure mode dynamic mode exists
    // to prevent
    val statDir = tmpDir("dynover_static_")
    ord.write.mode("overwrite").partitionBy("month")
      .parquet(statDir.toString)
    upd.write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("month").parquet(statDir.toString)
    val statAfter = listing(statDir)
    assert(statAfter.keySet == Set(s"month=$minMonth"),
      s"static overwrite should leave ONLY month=$minMonth, " +
        s"got ${statAfter.keySet}")
  }

  // ---------------------------------------------- cosine_incremental ---

  test("cosine_incremental: every re-crawled batch vector is flagged " +
    "and ranks its OWN source first at cosine >= 0.99") {
    val out = run("cosine_incremental").collect()
    val n = graft.Tables.embeddings(spark, sfDir).count()
    // recall is total: the +0.01 drift keeps every pair inside 4.6
    // degrees, so a single missing batch vector is an LSH recall bug
    assert(out.length == n,
      s"flagged ${out.length} of $n batch vectors — recall miss")
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 1000000L,
        s"batch ${r.getLong(0)} matched ${r.getLong(1)}, not its source")
      assert(r.getDouble(2) >= 0.99,
        s"self-match cosine ${r.getDouble(2)} below the drift bound")
    }
  }

  // ---------------------------------------- stream_chained_agg_parity ---

  test("stream_chained_agg_parity: TWO stateful operators ran in one " +
    "streaming query across >= 4 micro-batches") {
    val out = run("stream_chained_agg_parity").collect()
    assert(out.nonEmpty)
    val prog = StreamingOps.lastChainedPlan.get()
    assert(prog != null, "no progress captured")
    // the anti-vacuity: the hourly agg and the daily rollup must BOTH
    // be stateful operators in the same query (a collapsed single
    // aggregate would report one)
    assert(prog.stateOperators.length == 2,
      s"expected 2 stateful operators, got " +
        s"${prog.stateOperators.length}: " +
        prog.stateOperators.map(_.operatorName).mkString(", "))
    // and the run was genuinely multi-batch (4 chunk files,
    // maxFilesPerTrigger = 1)
    assert(prog.batchId >= 3,
      s"expected >= 4 micro-batches, last batchId ${prog.batchId}")
    // every emitted day aggregates a full day of hours: n_hours is
    // bounded by 24 and every n_events >= n_hours
    out.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 24, s"bad n_hours: $r")
      assert(r.getLong(2) >= r.getLong(3), s"n_events < n_hours: $r")
    }
  }

  // ------------------------------------------------------- pass_at_k ---

  test("pass_at_k: the product-form estimator equals the exact " +
    "combinatorial definition 1 - C(n-c,k)/C(n,k) (BigInt replay)") {
    val out = run("pass_at_k").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 5L, 10L))
    val stats = graft.Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def choose(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (0L until k).foldLeft(BigInt(1))((a, i) => a * (n - i) / (i + 1))
    Seq(1L, 5L, 10L).foreach { k =>
      val eligible = stats.filter(_._1 >= k)
      val exact = eligible.map { case (n, c) =>
        1.0 - (BigDecimal(choose(n - c, k)) / BigDecimal(choose(n, k)))
          .toDouble
      }
      val mean = math.floor(exact.sum / exact.length * 1e6 + 0.5) / 1e6
      val (nProblems, got) = out(k)
      assert(nProblems == eligible.length,
        s"k=$k: ${nProblems} problems declared, ${eligible.length} eligible")
      assert(math.abs(got - mean) < 2e-6,
        s"k=$k: estimator $got vs exact combinatorial $mean")
      // anti-vacuity: the estimator must not be degenerate at either end
      assert(got > 0.0 && got < 1.0, s"k=$k: degenerate pass@k $got")
    }
  }

  // ------------------------------------------------- sql_text_window ---

  test("sql_text_window: the text form runs Spark's Window exec and " +
    "matches the DSL twin exactly") {
    val sqlForm = run("sql_text_window")
    assert(sqlForm.queryExecution.executedPlan.toString.contains("Window"),
      "no Window exec in the SQL-text plan")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val dsl = graft.Tables.orders(spark, sfDir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cume_cents",
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "rnk", "cume_cents")
    assert(sqlForm.exceptAll(dsl).isEmpty && dsl.exceptAll(sqlForm).isEmpty,
      "SQL-text window form and DSL twin disagree")
  }

  // ------------------------------------- stream_sink_metadata_audit ---

  test("stream_sink_metadata_audit: the smuggled file is physically " +
    "present (glob sees it) but invisible to the metadata-aware read") {
    val r = StreamingOps.runSinkMetadata(spark, sfDir)
    assert(r.strangerRows > 0, "stranger file is empty — vacuous")
    // physically there: the raw glob read counts it
    assert(r.globRows == r.metadataRows + r.strangerRows,
      s"glob ${r.globRows} != metadata ${r.metadataRows} + " +
        s"stranger ${r.strangerRows}")
    // and the metadata-aware read equals the committed output alone —
    // the gate re-checks this against the oracle; here we pin the
    // MECHANISM (same dir, two different row counts)
    assert(r.globRows > r.metadataRows,
      "metadata-aware and glob reads agree — the commit log was not " +
        "consulted, the audit is vacuous")
  }

  // ------------------------------------------------- observe_metrics ---

  test("observe_metrics: the piggybacked observation equals a " +
    "dedicated scan, and the metrics rode the REAL query's execution") {
    val out = run("observe_metrics").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.Tables.events(spark, sfDir)
    val dedicated = ev.agg(
      count(lit(1)), sum(when(col("props").isNull, 1).otherwise(0)),
      sum(when(col("value") >= 100, 1).otherwise(0)),
      min("event_id"), max("event_id")).head
    assert(out("n_rows") == dedicated.getLong(0))
    assert(out("n_null_props") == dedicated.getLong(1))
    assert(out("n_big_value") == dedicated.getLong(2))
    assert(out("min_id") == dedicated.getLong(3))
    assert(out("max_id") == dedicated.getLong(4))
    // anti-vacuity: the thresholded metric must split the corpus (a
    // metric that is 0 or n_rows proves nothing about the predicate)
    assert(out("n_big_value") > 0 && out("n_big_value") < out("n_rows"),
      s"n_big_value ${out("n_big_value")} degenerate vs ${out("n_rows")}")
  }

  // ----------------------------------------------------- variant_agg ---

  test("variant_agg: the VARIANT path (parse_json + variant_get) is " +
    "really in the plan and agrees with the string path row-for-row") {
    val plan = graft.Tables.events(spark, sfDir)
      .select(variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("variant_get") || plan.contains("VariantGet"),
      s"no VariantGet in plan:\n${plan.take(300)}")
    val viaVariant = graft.Tables.events(spark, sfDir)
      .select(col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"))
    val viaString = graft.Tables.events(spark, sfDir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    assert(viaVariant.exceptAll(viaString).isEmpty &&
      viaString.exceptAll(viaVariant).isEmpty,
      "variant extraction disagrees with string extraction")
    // sanity on the gated aggregate shape
    val out = run("variant_agg").collect()
    assert(out.length == 5 && out.forall(r => r.getLong(1) > 0))
  }

  // ------------------------------------------------ sql_param_parity ---

  test("sql_param_parity: named-parameter binding constant-folds like " +
    "inline literals (pushed to the scan) and resists injection") {
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    val bound = spark.sql(Relational.SqlParamSql,
      Map("min_price" -> 50000.0, "status" -> "O"))
    val inline = spark.sql(Relational.SqlParamSql
      .replace(":min_price", "50000.0").replace(":status", "'O'"))
    assert(bound.exceptAll(inline).isEmpty &&
      inline.exceptAll(bound).isEmpty,
      "bound form and inline-literal form disagree")
    // the bound predicate still reaches the parquet scan
    val plan = bound.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(o_totalprice"),
      "bound parameter predicate not pushed to the scan")
    // the injection-safety contract: a hostile value binds as ONE
    // string literal, never as SQL text
    val hostile = spark.sql(Relational.SqlParamSql,
      Map("min_price" -> 50000.0,
        "status" -> "O' OR '1'='1"))
    assert(hostile.collect().isEmpty,
      "hostile parameter value was interpreted as SQL text — injection")
  }

  // -------------------------------------------------- sql_hint_audit ---

  test("sql_hint_audit: the hint steers the physical join — BHJ under " +
    "BROADCAST, SMJ under SHUFFLE_MERGE — with identical results") {
    graft.Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    graft.Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    // pin the static threshold to -1 so the PLANNER would not
    // broadcast on its own: the hint must be the only reason
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val bhj = spark.sql(Relational.sqlHintSql("BROADCAST(nation)"))
      val smj = spark.sql(Relational.sqlHintSql("SHUFFLE_MERGE(nation)"))
      val bhjPlan = bhj.queryExecution.executedPlan.toString
      val smjPlan = smj.queryExecution.executedPlan.toString
      assert(bhjPlan.contains("BroadcastHashJoin"),
        s"BROADCAST hint did not produce a BHJ:\n${bhjPlan.take(400)}")
      assert(!smjPlan.contains("BroadcastHashJoin") &&
        smjPlan.contains("SortMergeJoin"),
        s"SHUFFLE_MERGE hint did not produce an SMJ:\n${smjPlan.take(400)}")
      // hints may never change semantics
      assert(bhj.exceptAll(smj).isEmpty && smj.exceptAll(bhj).isEmpty,
        "hinted plans disagree on results")
    } finally spark.conf.set(key, prev)
  }

  // ------------------------------------------------- sql_text_parity ---

  test("sql_text_parity: the SQL text and the DataFrame DSL produce " +
    "identical results, and the text path still reaches the parquet " +
    "scan with pushed filters") {
    val sqlForm = run("sql_text_parity")
    // DSL twin of Relational.SqlTextParitySql — same front-end
    // semantics, built through the typed API
    val li = graft.Tables.lineitem(spark, sfDir)
    val ord = graft.Tables.orders(spark, sfDir)
    val dsl = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") =!= "F" && col("l_quantity") < 45)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100 + lit(0.5)).cast("long")).as("revenue_cents"))
      .orderBy("l_returnflag", "l_linestatus")
    assert(sqlForm.exceptAll(dsl).isEmpty && dsl.exceptAll(sqlForm).isEmpty,
      "SQL-text and DSL forms disagree")
    // the SQL front-end must not cost pushdown: the quantity predicate
    // reaches the lineitem scan
    val explained = sqlForm.queryExecution.executedPlan.toString
    assert(explained.contains("PushedFilters") &&
      explained.contains("LessThan(l_quantity"),
      s"l_quantity filter not pushed to the scan:\n" +
        explained.linesIterator.filter(_.contains("PushedFilters"))
          .mkString("\n"))
  }
}
