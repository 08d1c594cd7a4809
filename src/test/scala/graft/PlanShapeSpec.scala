package graft

/** Plan-shape assertions (SURVEY §5): the scale-critical optimizations
  * must be visible in the physical plan, so a regression in hints,
  * pushdown, or pruning fails loudly rather than silently costing a
  * full-table scan at 100 TB.
  */
class PlanShapeSpec extends GraftSpec {

  private def planOf(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("scan_filtered pushes the shipdate predicate into the parquet scan") {
    val plan = planOf("scan_filtered")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("l_shipdate"), "pushed filter must mention l_shipdate")
  }

  test("scan_pruned reads only the 2 projected columns") {
    val plan = planOf("scan_pruned")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"column pruning regressed: $readSchema")
  }

  test("join_broadcast compiles to a BroadcastHashJoin") {
    assert(planOf("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_sort_merge compiles to a SortMergeJoin") {
    assert(planOf("join_sort_merge").contains("SortMergeJoin"))
  }

  test("join_inner_hash compiles to a ShuffledHashJoin") {
    assert(planOf("join_inner_hash").contains("ShuffledHashJoin"))
  }

  test("join_left_semi/anti stay semi/anti (no materialized join)") {
    assert(planOf("join_left_semi").contains("LeftSemi"))
    assert(planOf("join_left_anti").contains("LeftAnti"))
  }

  test("topk_limit collapses to TakeOrderedAndProject (per-partition top-k)") {
    assert(planOf("topk_limit").contains("TakeOrderedAndProject"))
  }

  test("expr_custom participates in whole-stage codegen") {
    // AQE prints placeholders until the plan is finalized — execute
    // first, then read the final plan (codegen stages marked "*(n)").
    val df = q("expr_custom")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("null_safe_div"), plan.take(1500))
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"custom expression fell out of codegen:\n${plan.take(1500)}")
  }

  test("text_entropy and quality_lr_score are map-only (no hash exchange)") {
    // the only exchange either is allowed is the presentation sort's
    // range partitioning — a hash exchange means a shuffle crept into
    // what must stay a pure scan-throughput job at 100 TB.
    Seq("text_entropy", "quality_lr_score").foreach { n =>
      val plan = planOf(n)
      assert(!plan.contains("hashpartitioning"),
        s"$n grew a hash shuffle:\n${plan.take(1500)}")
    }
  }

  test("embed_knn_block_unscaled drops the vectors before the ranking window") {
    val plan = q("embed_knn_block_unscaled").queryExecution.optimizedPlan
    val wins = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, "expected a ranking Window node")
    wins.foreach { w =>
      assert(!w.child.output.exists(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
        s"ranking exchange must carry scalars, not vectors: ${w.child.output}")
    }
  }

  test("text_decontaminate_bloom prescreens map-side with might_contain") {
    val plan = planOf("text_decontaminate_bloom")
    assert(plan.contains("might_contain"),
      s"bloom prescreen fell out of the plan:\n${plan.take(1500)}")
  }

  test("centroid assignment is map-only: no window, no per-vector exchange") {
    // the E-step folds a one-row broadcast centroid list per row; a
    // Window in the plan means the row×centroid crossJoin rank crept
    // back (corpus × k vectors through the wire at 100 TB).
    Seq("cluster_assign", "cluster_kmeans_step").foreach { n =>
      val plan = planOf(n)
      assert(!plan.contains("Window"),
        s"$n assignment regressed to a window rank:\n${plan.take(1500)}")
      assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
        s"$n must broadcast the packed centroid row")
    }
  }

  test("agg queries use hash aggregation with partial (map-side) phase") {
    val plan = planOf("agg_groupby")
    assert(plan.contains("HashAggregate"))
    // partial + final pair = map-side combine before the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("sim_project: shortlist window is group-limited and no unbounded cartesian appears") {
    // The JL tier's 100 TB contract (SURVEY §2 K4b): the probe×corpus
    // scan is a broadcast nested-loop against the TINY probe side
    // (never a CartesianProduct of two big relations), and both
    // ranking windows carry a WindowGroupLimit so the per-partition
    // shortlist/top-k filter runs BEFORE the ranking exchange.
    val plan = planOf("sim_project")
    assert(!plan.contains("CartesianProduct"),
      "sim_project must broadcast the probe side, not cross-join two big relations")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "probe side must broadcast")
    assert(plan.contains("WindowGroupLimit"),
      "rank<=k filters must push a per-partition group limit below the window")
  }

  test("DotProductFusion fuses the HOF dot product into array_dot") {
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations = Seq(graft.plans.DotProductFusion)
    try {
      val hof = Tables.load(spark, sf, "embeddings")
        .select(col("vec_id"), col("embedding").as("q"), col("embedding").as("c"))
        .selectExpr("vec_id",
          "aggregate(zip_with(q, c, (x, y) -> double(x) * double(y)), 0D, (acc, v) -> acc + v) AS dot")
        .orderBy("vec_id")
      assert(hof.queryExecution.optimizedPlan.toString.contains("array_dot"),
        s"HOF not fused:\n${hof.queryExecution.optimizedPlan.toString.take(1500)}")
      graft.functions.GraftFunctions.register(spark)
      val direct = Tables.load(spark, sf, "embeddings")
        .selectExpr("vec_id", "array_dot(embedding, embedding) AS dot")
        .orderBy("vec_id")
      assert(hof.collect().toSeq === direct.collect().toSeq)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("AbsRangePushdown turns abs(x) <= k into pushed range filters") {
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations = Seq(graft.plans.AbsRangePushdown)
    try {
      val banded = Tables.load(spark, sf, "supplier")
        .filter("abs(s_acctbal) <= 500.0")
        .select("s_suppkey", "s_acctbal").orderBy("s_suppkey")
      val physical = banded.queryExecution.executedPlan.toString
      assert(physical.contains("GreaterThanOrEqual(s_acctbal,-500.0)")
        && physical.contains("LessThanOrEqual(s_acctbal,500.0)"),
        s"range not pushed to the scan:\n${physical.take(1200)}")
      // value equality with the un-rewritten form
      spark.experimental.extraOptimizations = Nil
      val direct = Tables.load(spark, sf, "supplier")
        .filter("abs(s_acctbal) <= 500.0")
        .select("s_suppkey", "s_acctbal").orderBy("s_suppkey")
      assert(banded.collect().toSeq === direct.collect().toSeq)
      // and NULL/NaN parity on a crafted frame
      spark.experimental.extraOptimizations = Seq(graft.plans.AbsRangePushdown)
      import spark.implicits._
      val df = Seq(Some(1.0), Some(-501.0), None, Some(Double.NaN), Some(-0.0))
        .toDF("x")
      val got = df.filter("abs(x) < 2.0").collect().map(_.getDouble(0)).sorted
      assert(got.toSeq == Seq(-0.0, 1.0))
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("array_dot null semantics mirror the HOF (length mismatch / null element)") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        | array_dot(array(cast(1 as float), cast(2 as float)), array(cast(3 as float))) AS mismatch,
        | array_dot(array(cast(1 as float), cast(null as float)), array(cast(3 as float), cast(4 as float))) AS withnull,
        | array_dot(array(cast(2 as float)), array(cast(3 as float))) AS ok
        |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) === 6.0)
  }

  test("tpch_q3 broadcasts the filtered dims and top-10 is TakeOrderedAndProject") {
    val df = q("tpch_q3")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("text_redact_pii and text_repetition are shuffle-free map plans") {
    // Family M's per-document stages must stay map-only: the single
    // allowed exchange is the final ORDER BY range partitioning.
    Seq("text_redact_pii", "text_repetition").foreach { name =>
      val df = q(name)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"$name gained a shuffle:\n${plan.take(1500)}")
    }
  }

  test("text_decontaminate probes the eval shingle set via broadcast join") {
    val df = q("text_decontaminate")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-set probe must broadcast, not shuffle the corpus:\n${plan.take(1500)}")
  }

  test("sample_weighted broadcasts the per-language targets") {
    val df = q("sample_weighted")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("sample_temperature is window-free: broadcast thresholds + map-only filter") {
    // The point of the rate-based variant (vs sample_weighted's
    // row_number) is that NO per-domain sort exists anywhere in the
    // plan — the only sort allowed is the final presentation orderBy.
    val df = q("sample_temperature")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("Window"), s"unexpected window sort:\n${plan.take(1500)}")
    val sorts = plan.linesIterator.count(_.trim.startsWith("+- Sort"))
    assert(sorts <= 1, s"expected at most the presentation sort, found $sorts")
  }

  test("dedup_exact is a digest-keyed partial-agg groupBy, not a text-keyed window") {
    // Round-8 flood-proofing (VERDICT r7 #1/#2): the dedup exchange
    // must carry the 16-byte md5 digest, with map-side partial
    // aggregation collapsing duplicate floods before the shuffle. A
    // window formulation (no partial agg, full-text key) regressing
    // back in would pass the oracle but die on a boilerplate-page
    // flood at scale.
    val df = q("dedup_exact")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window crept into dedup_exact:\n${plan.take(1500)}")
    assert(plan.contains("md5"), "dedup group key must be the md5 digest")
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"map-side partial aggregation missing:\n${plan.take(1500)}")
  }

  test("text_bm25_postings probe pushes the term filter and broadcasts df + corpus stats") {
    val plan = planOf("text_bm25_postings")
    // the term IN (...) predicate must reach the postings parquet scan
    // (the probe already opened only the wanted bucket units; inside
    // them row-group stats on term still prune)
    assert(plan.contains("PushedFilters") && plan.contains("term"),
      plan.take(3000))
    // df (5 rows) joins as a broadcast hash join and the 1-row corpus
    // stats as a broadcast nested-loop cross — the only exchange left
    // is the doc_id-keyed pivot aggregation
    assert(plan.contains("BroadcastHashJoin"), "df must broadcast-hash-join")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "corpus stats must ride a broadcast cross join")
  }

  test("pipeline_end2end dedup stage is window-free with a semi-join keep-set") {
    val df = q("pipeline_end2end")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"pipeline dedup regressed to a window:\n${plan.take(1500)}")
    assert(plan.contains("LeftSemi"), "digest keep-set must semi-join back")
    assert(plan.contains("BroadcastHashJoin"),
      "decontamination eval-set probe must stay broadcast")
  }

  test("ranking-metric trio broadcasts probes, never a cartesian product") {
    Seq("eval_ndcg", "eval_mrr", "eval_recall_k").foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name planned a cartesian product:\n${plan.take(1500)}")
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastHashJoin"),
        s"$name: the probe side must ride a broadcast")
    }
  }

  test("sample_negative blocks on an equi-join, never all-pairs") {
    val plan = planOf("sample_negative")
    assert(!plan.contains("CartesianProduct"),
      s"bucket blocking regressed to all-pairs:\n${plan.take(1500)}")
    // the candidate pairing must be a bucket EQUI-join; the only
    // nested-loop join in the plan is the broadcast 1-ROW bucket-count
    // frame (nb derives from the corpus since round 12), which is a
    // scalar attach, not a pairing
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"candidate pairing must be a bucket equi-join:\n${plan.take(1500)}")
  }

  test("eval_ngram_overlap pairs grams through equi-joins, never a cartesian") {
    val plan = planOf("eval_ngram_overlap")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"gram pairing regressed to all-pairs:\n${plan.take(1500)}")
  }

  test("encode_hashing_trick is one combinable aggregation, no join") {
    val plan = planOf("encode_hashing_trick")
    assert(!plan.contains("Join"), "the hash encoder must be stateless")
    assert(plan.contains("partial"),
      "the (doc, bucket) count must partial-aggregate map-side")
  }

  test("eval_forecast shares one (type, hour) exchange family") {
    val plan = planOf("eval_forecast")
    assert(!plan.contains("CartesianProduct"))
    // the corpus collapses before any window: the lag window's input
    // is the aggregated hourly table, so a second full-corpus
    // hashpartitioning of raw events would show as >2 exchanges
    val exchanges = plan.split("Exchange hashpartitioning").length - 1
    assert(exchanges <= 2, s"expected <= 2 hash exchanges, got $exchanges")
  }
}
