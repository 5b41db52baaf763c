package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Global plan law: no registered batch query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only where a
  * documented construction bounds the broadcast side to a constant —
  * anything else is an all-pairs join waiting to detonate at 100 TB.
  *
  * Per-operator specs already assert this for the operators that earned
  * the scrutiny (embedding dedup, LSH joins); this suite sweeps the WHOLE
  * `SparkEntry.queries` inventory so a future query — or a Catalyst
  * re-plan of an existing one after a refactor — can't reintroduce an
  * unbounded nested-loop shape without failing a test by name.
  *
  * Streaming gate queries have no standing batch plan (they execute
  * micro-batch harnesses on call and return materialized results), so
  * each harness records its last micro-batch executed plan in
  * [[graft.queries.StreamPlans]] and the sweep runs the same laws over
  * those — plus the streaming-specific law that the one stream-stream
  * join keeps the watermark-bounded symmetric-hash shape.
  */
class PlanLawSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.codegen.maxFields", "256")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is sound BY CONSTRUCTION: the
    * broadcast side is a constant-size frame whatever the corpus size.
    * Each entry documents the bound; a query not listed here that plans
    * a BNLJ fails the sweep. */
  private val justifiedBnlj: Map[String, String] = Map(
    "ann_topk_brute" -> "broadcast probe set is NProbes=64 rows by construction",
    "ann_recall" -> "composes ann_topk_brute + ann_topk_ivf; every broadcast is their NProbes=64 / k=16 bounded frames",
    "ann_ndcg" -> "composes ann_topk_brute + ann_topk_ivf; every broadcast is their NProbes=64 / k=16 bounded frames",
    "ann_lsh_recall" -> "composes ann_topk_brute + ann_topk_lsh; every broadcast is their NProbes=64 bounded probe frames",
    "ann_hard_negatives" -> "broadcast probe set is NProbes=64 rows by construction",
    "source_overlap_kmv" -> "broadcast side is the distinct-source dimension (corpus-size-independent); pair stage input is <= K rows per source by construction",
    "ann_topk_ivf" -> "broadcast coarse-centroid table is k=16 rows by construction",
    "ann_ivf_append" -> "broadcast standing-centroid table is k=16 rows by construction",
    "q62_ivf_layout" -> "probe assignment broadcasts the k=16 centroid table by construction",
    "ann_topk_pq" -> "broadcast probe set is NProbes=64 rows (with M*K-double tables) by construction",
    "dsir_resample" -> "broadcast ratio table is 1024 hash buckets by construction",
    "decontaminate_emb" -> "broadcast eval slice is <= 100 rows by construction (vec_id % 10 == 7 AND vec_id < 1000)",
    "q24_theta_join" -> "genuinely non-equi theta predicate; broadcast side is the 5-row region-band frame",
    "q57_reuse_exchange" -> "broadcast side is the ONE-row grand-total aggregate by construction",
    "forget_users" -> "per-table report rows are crossJoins of two ONE-row count aggregates by construction",
    "skew_report" -> "broadcast side is the ONE-row total/max aggregate by construction",
    "emb_pca_project" -> "broadcast side is the ONE-row variance-explained aggregate by construction",
    "dedup_cluster_stats" -> "singleton row crossJoins two ONE-row count aggregates by construction",
    "diversity_sample" -> "cell assignment broadcasts the k=16 IVF centroid table by construction",
    "vocab_growth_curve" -> "broadcast side is the ONE-row doc-count aggregate by construction",
    "q71_fk_integrity" -> "each edge row crossJoins two ONE-row count aggregates by construction",
  )

  private lazy val batchPlans: Seq[(String, org.apache.spark.sql.execution.SparkPlan)] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("stream_"))
      .map { case (name, fn) =>
        name -> fn(spark, sf).queryExecution.executedPlan
      }

  private lazy val batchQueries: Seq[(String, String)] =
    batchPlans.map { case (name, plan) => name -> plan.toString }

  test("no registered batch query plans a CartesianProduct") {
    val offenders = batchQueries.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty,
      s"cartesian product planned by: ${offenders.mkString(", ")}")
  }

  test("BroadcastNestedLoopJoin appears only with a documented constant-size bound") {
    val offenders = batchQueries.collect {
      case (name, plan)
        if plan.contains("BroadcastNestedLoopJoin") && !justifiedBnlj.contains(name) => name
    }
    assert(offenders.isEmpty,
      s"unjustified nested-loop join planned by: ${offenders.mkString(", ")} — " +
        "either bound the broadcast side by construction and whitelist it " +
        "with the reason, or re-shape the join to an equi-join")
  }

  test("the BNLJ whitelist stays tight: every entry still plans one") {
    val plans = batchQueries.toMap
    val stale = justifiedBnlj.keys.filter { name =>
      !plans.get(name).exists(_.contains("BroadcastNestedLoopJoin"))
    }
    assert(stale.isEmpty,
      s"whitelist entries no longer needed (remove them): ${stale.mkString(", ")}")
  }

  /** Per-query plan laws promoted from ad-hoc operator specs, keyed by
    * query name: each row is a plan property that IS the query's scale
    * claim, so a refactor that loses it fails this sweep by name even if
    * values stay oracle-green. Deep assertions (runtime metrics, negative
    * controls) remain in the operator specs; these pin the static shape. */
  private val namedPlanLaws: Seq[(String, String, String => Boolean)] = Seq(
    ("q51_approx_quantiles", "single-pass GK: map-side partial percentile_approx",
      _.contains("partial_percentile_approx")),
    ("q51_approx_quantiles", "single-pass GK: no per-group window sort",
      !_.contains("Window")),
    ("q52_dpp_prune", "fact scan partition-pruned at RUNTIME (DynamicPruningExpression)",
      _.toLowerCase.contains("dynamicpruning")),
    ("q62_ivf_layout", "probe scan prunes cluster-partition dirs (PartitionFilters on cid)",
      p => "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p).isDefined),
    ("q39_bloom_semi", "fact pre-filtered by a codegen might_contain probe, not a per-row UDF",
      p => p.contains("might_contain") && !p.contains("UDF(")),
    ("chunk_documents", "chunking is a narrow map: no hash exchange anywhere",
      !_.contains("Exchange hashpartitioning")),
    ("stratified_sample", "salted two-phase top-N: exactly two Window nodes, salt present",
      p => "Window ".r.findAllIn(p).size == 2 && p.contains("pmod")),
    ("decontaminate_bloom", "corpus pre-filtered by codegen might_contain, not a per-row UDF",
      p => p.contains("might_contain") && !p.contains("UDF(")),
    ("q53_bloom_join", "bloom built DISTRIBUTED: partial+final bloom_filter_agg, no driver collect",
      p => p.contains("partial_bloom_filter_agg") && p.contains("bloom_filter_agg")),
    ("q54_bucketed_agg", "aggregation rides the bucketed layout: no hash exchange anywhere",
      !_.contains("Exchange hashpartitioning")),
    ("q54_bucketed_agg", "scan is bucket-aware",
      _.contains("Bucketed: true")),
    ("q55_bucketed_window", "window rides the bucketed layout: no hash exchange anywhere",
      p => !p.contains("Exchange hashpartitioning") && p.contains("Window")),
    ("q55_bucketed_window", "scan is bucket-aware",
      _.contains("Bucketed: true")),
    ("top_ngrams", "heavy hitters run as TakeOrdered, never a global sort of the vocabulary",
      _.contains("TakeOrderedAndProject")),
    ("emb_outlier", "centroid stats rejoin the exploded stream via broadcast hash, never a shuffled join",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")),
    ("emb_outlier", "per-vector distance sum is partially aggregated (map-side combine on the exploded rows)",
      _.contains("partial_sum")),
    ("diversity_sample", "per-cell ranking is the bounded topk_min_agg aggregate, not a window over 16 skewed cell partitions",
      p => p.contains("topk_min_agg") && "Window ".r.findAllIn(p).size == 1),
    ("diversity_sample", "round-robin limit plans as TakeOrderedAndProject, never a global sort",
      _.contains("TakeOrderedAndProject")),
    ("text_bigram_kn", "all three LM joins broadcast under the counted guard at gate scale, never a sort-merge of the scoring stream",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")),
    ("text_pmi_top", "marginal joins broadcast under the counted guard, ranking is TakeOrdered — never a global sort of the vocabulary",
      p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
        p.contains("TakeOrderedAndProject")),
    ("graph_pagerank", "K-bounded ranking over the materialized node frame (TakeOrderedAndProject), never a corpus-sized global sort",
      _.contains("TakeOrderedAndProject")),
    ("dedup_keep_central", "node-bounded rank frame broadcasts into the cluster-map join at gate scale; exactly one per-cluster window",
      p => p.contains("BroadcastHashJoin") && "Window ".r.findAllIn(p).size == 1),
    ("text_repetition", "respelled as a shuffle-free projection: no hash exchange anywhere (the one range exchange is the output-contract sort)",
      p => !p.contains("Exchange hashpartitioning") && p.contains("array_top_count")),
    ("q53_bloom_join", "might_contain probe sits BELOW the fact-side exchange",
      p => {
        val ex = p.linesIterator.indexWhere(_.contains("Exchange hashpartitioning(l_orderkey"))
        val probe = p.linesIterator.indexWhere(_.contains("might_contain"))
        ex >= 0 && probe > ex
      }),
  )

  test("named per-query plan laws hold across the inventory") {
    val plans = batchQueries.toMap
    val missing = namedPlanLaws.map(_._1).distinct.filterNot(plans.contains)
    assert(missing.isEmpty,
      s"law-keyed queries gone from the inventory (delete their rows?): ${missing.mkString(", ")}")
    val broken = namedPlanLaws.collect {
      case (name, law, pred) if !pred(plans(name)) => s"$name: $law"
    }
    assert(broken.isEmpty, s"plan laws broken:\n${broken.mkString("\n")}")
  }

  test("q57: the grand total reuses the group-by shuffle (ReusedExchange in the executed plan)") {
    // exchange reuse materializes during adaptive execution, so this law
    // needs an EXECUTED plan — it cannot ride the unexecuted named sweep
    val df = graft.queries.Relational2.q57ReuseExchange(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"grand total re-shuffled the fact table instead of reusing the group-by exchange:\n$plan")
  }

  test("every scan of a wide table prunes columns (no full-schema reads)") {
    // full widths of the tables wide enough for pruning to matter; a scan
    // that reads every column for a narrower projection wastes IO that
    // multiplies by 10^3 at 100 TB
    val fullWidth = Map(
      "lineitem" -> spark.read.parquet(s"$sf/lineitem.parquet").columns.length,
      "documents" -> spark.read.parquet(s"$sf/documents.parquet").columns.length,
      "orders" -> spark.read.parquet(s"$sf/orders.parquet").columns.length,
      "events" -> spark.read.parquet(s"$sf/events.parquet").columns.length)
    // AdaptiveSparkPlanExec is a LEAF node: plan.collect never descends
    // into it, so a query whose plan went adaptive (any query with a
    // shuffle) would silently contribute zero scans and pass vacuously —
    // unwrap to the adaptive plan's current physical plan first.
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val cur = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      cur.collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    }
    // Queries whose full-width read IS the semantics, not an oversight.
    val justifiedFullRead = Set(
      "profile_columns" // a table profiler reports on every column by definition
    )
    val offenders = batchPlans.flatMap { case (name, plan) =>
      scansOf(plan)
        .flatMap { scan =>
          val table = scan.relation.location.rootPaths.headOption
            .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
          fullWidth.get(table).collect {
            case w if scan.requiredSchema.size >= w && !justifiedFullRead(name) =>
              s"$name reads all $w cols of $table"
          }
        }
    }
    assert(offenders.isEmpty, s"unpruned wide-table scans:\n${offenders.mkString("\n")}")
  }

  test("embedding/ANN kernels: every codegen-able row stage is inside a codegen span") {
    // These queries' cost is a tight numeric kernel over Array[Float]
    // columns evaluated millions of times. The kernels themselves use
    // higher-order functions (aggregate/zip_with), which are
    // CodegenFallback by design — those projections CANNOT be fused and
    // are exempt. The law protects everything else: a Project/Filter
    // with no HOF that sits outside a WholeStageCodegen span means some
    // expression silently lost codegen support in a refactor — a multi-x
    // interpreted-eval slowdown invisible to the oracle gate.
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // execute rather than reuse batchPlans: AQE only inserts the
    // WholeStageCodegen wrappers as each stage materializes, so an
    // unexecuted adaptive plan would fail this law vacuously
    val kernelQueries = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        name.startsWith("ann_") || name.startsWith("emb_") ||
          name.contains("embedding") || name == "semdedup"
      }
      .map { case (name, fn) =>
        val df = fn(spark, sf)
        // collect(), not count(): count() builds a DERIVED query with its
        // own execution — this df's adaptive plan would stay
        // isFinalPlan=false with no codegen wrappers anywhere
        df.collect()
        name -> df.queryExecution.executedPlan
      }
    assert(kernelQueries.size >= 8, s"kernel-query sweep shrank: ${kernelQueries.map(_._1)}")
    def hasHof(p: SparkPlan): Boolean =
      p.expressions.exists(_.exists(_.isInstanceOf[HigherOrderFunction]))
    def uncodegened(p: SparkPlan, inside: Boolean): Seq[String] = {
      val here = p match {
        case (_: ProjectExec | _: FilterExec) if !inside && !hasHof(p) => Seq(p.nodeName)
        case _ => Nil
      }
      // WholeStageCodegen opens a fused span; InputAdapter closes it for
      // the subtree it feeds in; AQE wrappers are leaves that must be
      // expanded by hand (same trap as the scan-pruning law above)
      p match {
        case a: AdaptiveSparkPlanExec => here ++ uncodegened(a.executedPlan, inside = false)
        case q: QueryStageExec => here ++ uncodegened(q.plan, inside = false)
        case w: WholeStageCodegenExec => here ++ w.children.flatMap(uncodegened(_, inside = true))
        case i: InputAdapter => here ++ i.children.flatMap(uncodegened(_, inside = false))
        case other => here ++ other.children.flatMap(uncodegened(_, inside))
      }
    }
    val offenders = kernelQueries.flatMap { case (name, plan) =>
      val nodes = uncodegened(plan, inside = false)
      if (nodes.nonEmpty) Some(s"$name: ${nodes.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      s"row-processing nodes outside whole-stage codegen:\n${offenders.mkString("\n")}")
  }

  // ------------------------------------------------- streaming micro-batch plans

  /** Run every stream_* gate end-to-end (cheap at sf0.001) and collect the
    * micro-batch plan each harness captured. A query that captured nothing
    * fails the first test by name — the capture hook itself is under test. */
  private lazy val streamPlans: Seq[(String, Option[String])] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith("stream_"))
      .map { case (name, fn) =>
        fn(spark, sf).count()
        name -> graft.queries.StreamPlans.get(name)
      }

  test("every streaming gate query captures its last micro-batch plan") {
    val missing = streamPlans.collect { case (name, None) => name }
    assert(missing.isEmpty,
      s"no micro-batch plan captured for: ${missing.mkString(", ")} — " +
        "did a harness lose its StreamPlans.capture hook?")
  }

  test("no streaming query plans a CartesianProduct in any micro-batch") {
    val offenders = streamPlans.collect {
      case (name, Some(plan)) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty,
      s"cartesian product in micro-batch plan of: ${offenders.mkString(", ")}")
  }

  test("no streaming query plans a BroadcastNestedLoopJoin (no whitelist for streams)") {
    // the only streaming joins are equi-keyed (stream-static broadcast hash,
    // stream-stream symmetric hash); per-batch state makes an unbounded
    // nested loop strictly worse here than in batch
    val offenders = streamPlans.collect {
      case (name, Some(plan)) if plan.contains("BroadcastNestedLoopJoin") => name
    }
    assert(offenders.isEmpty,
      s"nested-loop join in micro-batch plan of: ${offenders.mkString(", ")}")
  }

  test("stream_stream_join keeps the watermark-bounded symmetric hash join shape") {
    val plan = streamPlans.toMap.apply("stream_stream_join")
      .getOrElse(fail("stream_stream_join captured no plan"))
    assert(plan.contains("StreamingSymmetricHashJoin"),
      "stream-stream join no longer plans StreamingSymmetricHashJoin — " +
        "state would not expire past the watermark; plan:\n" + plan)
  }
}
