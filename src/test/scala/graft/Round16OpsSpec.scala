package graft

import org.apache.spark.sql.functions._

/** Round-16 pins: the representative collapse in front of the
  * near-dup tiers (VERDICT r15 #1) is EXACTLY loss-free — the
  * collapsed-then-expanded pair set / clustering equals the direct
  * formulation's on a replica-heavy corpus — and its NULL-text and
  * id-interleaving edge cases hold.
  */
class Round16OpsSpec extends GraftSpec {

  // Replica-heavy corpus with every case the expansion must get
  // right: group A replicated under INTERLEAVED ids (1, 9, 50 — a
  // cross pair's ordered ids are NOT rep-ordered), group B (10, 11)
  // near-dup to A (one word differs → high shingle overlap), group C
  // a distinct singleton, group D two replicas of an unrelated text,
  // plus two NULL-text docs (must stay singletons, never one group).
  private lazy val corpus = {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tonight"
    val dTx = "completely unrelated body of text about winter mountain weather"
    Seq(
      (1L, a), (9L, a), (50L, a),
      (10L, b), (11L, b),
      (20L, "nothing in common with anything else whatsoever here at all"),
      (30L, dTx), (31L, dTx),
      (40L, null.asInstanceOf[String]), (41L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("collapseReplicas: membership maps every doc to its group-min; NULL texts stay singletons") {
    val (reps, members) = graft.api.GraftOps.collapseReplicas(corpus, "doc_id", "text")
    val m = members.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 9L -> 1L, 50L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 30L -> 30L, 31L -> 30L, 40L -> 40L, 41L -> 41L), m.toString)
    val repIds = reps.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repIds == Set(1L, 10L, 20L, 30L, 40L, 41L), repIds.toString)
  }

  test("expandRepPairs == direct minHashNearDupPairs (LSH tier is text-pure)") {
    val direct = pairSet(graft.api.GraftOps.minHashNearDupPairs(
      corpus, "doc_id", "text", maxJaccardDist = 0.5))
    val (reps, members) = graft.api.GraftOps.collapseReplicas(corpus, "doc_id", "text")
    val expanded = pairSet(graft.api.GraftOps.expandRepPairs(
      graft.api.GraftOps.minHashNearDupPairs(reps, "doc_id", "text",
        maxJaccardDist = 0.5),
      members, "doc_id"))
    assert(direct == expanded,
      s"only-direct=${(direct -- expanded).take(5)} only-expanded=${(expanded -- direct).take(5)}")
    // the corpus plants both expansion legs: within-group (1,9) and a
    // cross pair whose ordering interleaves the groups (9,10 & 10,50)
    assert(expanded.contains((1L, 9L)) && expanded.contains((9L, 10L))
      && expanded.contains((10L, 50L)), expanded.toString)
  }

  test("expandRepPairs == direct simhashPairs, hamming carried exactly") {
    graft.functions.GraftFunctions.register(spark)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val direct = asMap(graft.api.GraftOps.simhashPairs(corpus, "doc_id", "text"))
    val (reps, members) = graft.api.GraftOps.collapseReplicas(corpus, "doc_id", "text")
    val expanded = asMap(graft.api.GraftOps.expandRepPairs(
      graft.api.GraftOps.simhashPairs(reps, "doc_id", "text"),
      members, "doc_id", passCols = Seq("hamming"),
      withinExtras = Seq(lit(0).cast("int").as("hamming"))))
    assert(direct == expanded,
      s"only-direct=${(direct.toSet -- expanded.toSet).take(5)} " +
        s"only-expanded=${(expanded.toSet -- direct.toSet).take(5)}")
    assert(expanded((1L, 9L)) == 0)
  }

  test("collapsed dedup_cluster == direct connectedComponents clustering") {
    val direct = graft.api.GraftOps.connectedComponents(corpus, "doc_id",
        graft.api.GraftOps.ngramJaccardPairs(corpus, "doc_id", "text",
          minJaccard = 0.8), "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (reps, members) = graft.api.GraftOps.collapseReplicas(corpus, "doc_id", "text")
    val viaReps = members.join(
        graft.api.GraftOps.connectedComponents(reps, "doc_id",
          graft.api.GraftOps.ngramJaccardPairs(reps, "doc_id", "text",
            minJaccard = 0.8), "a_id", "b_id")
          .withColumnRenamed("id", "__rep"), "__rep")
      .select("doc_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct == viaReps, s"direct=$direct viaReps=$viaReps")
    // NULL-text docs: the TIER itself renders NULL as '' (concat_ws
    // skips nulls → block '' and shingles ['']) and therefore pairs
    // them — in BOTH formulations. The collapse must not pre-merge
    // them (only byte-identical texts are provably interchangeable);
    // it keeps each NULL doc a singleton rep and the rep-level tier
    // reproduces the merge, which is exactly what the equality above
    // pins. The cluster label is the min NULL doc id.
    assert(viaReps(40L) == 40L && viaReps(41L) == 40L, viaReps.toString)
    // replica group A and near-dup group B share one component
    // labeled by the global min id
    assert(Seq(1L, 9L, 50L, 10L, 11L).forall(viaReps(_) == 1L), viaReps.toString)
  }

  // ---- MV union rollup (VERDICT r15 #4) ------------------------------

  private def unionQuery(): org.apache.spark.sql.DataFrame = {
    import graft.sources.CommitLog
    val root = graft.queries.LakehouseQueries.cdcTable(spark, sf)
    val arch = graft.queries.LakehouseQueries.archTable(spark, sf)
    CommitLog.snapshot(spark, root, CommitLog.versions(root).last)
      .select(col("k"), col("p"))
      .unionAll(CommitLog.snapshot(spark, arch, 0L).select(col("k"), col("p")))
      .groupBy((col("k") % 10).as("g"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sum_p"))
      .select(col("g"), col("n"), col("sum_p")
        .cast(org.apache.spark.sql.types.DecimalType(38, 2)).as("total"))
      .orderBy("g")
  }

  test("MV union rewrite: archive ∪ current aggregate reads both states, neither table") {
    val df = SparkEntry.queries("view_rewrite_union")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_aggview") && plan.contains("graft_archstate"),
      "union rewrite did not fire on both states:\n" + plan.take(3000))
    assert(!plan.contains("graft_cdc") && !plan.contains("graft_archtab"),
      "union rewrite still scans a table:\n" + plan.take(3000))
    // values equal the real direct union aggregate with both views
    // dropped (the entry would re-register, so the unrewritten twin is
    // built by hand on the same snapshots)
    graft.plans.MvCatalog.drop("orders_by_g")
    graft.plans.MvCatalog.drop("orders_arch_by_g")
    try {
      val off = unionQuery()
      val offPlan = off.queryExecution.executedPlan.toString
      assert(!offPlan.contains("graft_aggview") &&
        !offPlan.contains("graft_archstate"))
      assert(off.collect().map(_.toSeq).toSeq ==
        df.collect().map(_.toSeq).toSeq,
        "rewritten union diverges from the direct aggregate")
    } finally SparkEntry.queries("view_rewrite_union")(spark, sf).count()
  }

  test("MV union rewrite declines when one branch is unregistered") {
    SparkEntry.queries("view_rewrite_union")(spark, sf).count()
    graft.plans.MvCatalog.drop("orders_arch_by_g")
    try {
      val plan = unionQuery().queryExecution.executedPlan.toString
      // fail-safe: the whole union declines — the archive branch
      // scans its table and the current branch must NOT be served
      // from state either (a half-rewritten union would double-count
      // nothing but read state + table inconsistently on a later
      // registration race)
      assert(!plan.contains("graft_archstate") && !plan.contains("graft_aggview"),
        "union half-rewrote with an unregistered branch:\n" + plan.take(3000))
      assert(plan.contains("graft_archtab"),
        "archive branch not scanned directly:\n" + plan.take(3000))
    } finally SparkEntry.queries("view_rewrite_union")(spark, sf).count()
  }

  test("MV union rewrite: coarser rollup over the union re-aggregates the refold") {
    SparkEntry.queries("view_rewrite_union")(spark, sf).count()
    import graft.sources.CommitLog
    val root = graft.queries.LakehouseQueries.cdcTable(spark, sf)
    val arch = graft.queries.LakehouseQueries.archTable(spark, sf)
    val df = CommitLog.snapshot(spark, root, CommitLog.versions(root).last)
      .select(col("k"), col("p"))
      .unionAll(CommitLog.snapshot(spark, arch, 0L).select(col("k"), col("p")))
      .groupBy(((col("k") % 10) % 3).as("g3"))
      .agg(count(lit(1)).as("n"))
      .orderBy("g3")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_aggview") && plan.contains("graft_archstate"),
      "union rollup did not fire:\n" + plan.take(3000))
    assert(!plan.contains("graft_cdc") && !plan.contains("graft_archtab"))
    // n per g3 bucket = direct count over the union
    graft.plans.MvCatalog.drop("orders_by_g")
    graft.plans.MvCatalog.drop("orders_arch_by_g")
    try {
      val direct = unionQuery()
        .groupBy((col("g") % 3).as("g3"))
        .agg(sum(col("n")).as("n")).orderBy("g3")
      assert(df.collect().map(_.toSeq).toSeq ==
        direct.collect().map(_.toSeq).toSeq)
    } finally SparkEntry.queries("view_rewrite_union")(spark, sf).count()
  }
}
