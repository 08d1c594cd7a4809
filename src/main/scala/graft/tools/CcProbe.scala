package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-round timing + plan shape of the HashMin loop
  * with/without a pointer-jump step, on the graph_components slice.
  * Usage: dev/run.sh graft.tools.CcProbe [sfDir] [jump|plain] [mod] [capRounds]
  *   e.g. dev/run.sh graft.tools.CcProbe /root/testdata/sf0.1 jump 40 6
  * (positional: args 0..3 = sfDir, mode, l_orderkey modulus, round cap;
  * the path-convergence probe is `CcProbe path [n]`.)
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val mode = args.lift(1).getOrElse("jump")
    // Round-13 probe: the VERDICT r12 #3 done-criterion — a 10⁷-node
    // PATH (diameter 10⁷, the adversarial shape for min-label) must
    // converge EXACTLY through the production operator without raising
    // maxIter. Usage: dev/run.sh graft.tools.CcProbe path [n]
    if (mode == "path" || args.lift(0).contains("path")) {
      val n = args.lift(1).filter(_.forall(_.isDigit)).map(_.toLong)
        .getOrElse(10000000L)
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val t0 = System.nanoTime()
      val vs = spark.range(n).toDF("node")
      val es = spark.range(n - 1).selectExpr("id AS u", "id + 1 AS v")
      val out = graft.api.GraftOps.connectedComponents(vs, "node", es, "u", "v")
      val bad = out.filter(col("cluster") =!= 0L).count()
      val total = out.count()
      println(f"path n=$n rows=$total mislabeled=$bad " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      spark.stop()
      return
    }
    val mod = args.lift(2).getOrElse("40").toInt
    // round 17: cap the loop at N rounds and report the residual
    // inter-label pair count — sizes the driver union-find finish for
    // a given maxIter (the graph_components 12→6 re-tune evidence)
    val capRounds = args.lift(3).map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") % mod === 0)
      .select((col("l_orderkey") * 2).as("a"), (col("l_partkey") * 2 + 1).as("b"))
      .distinct()
    val verts = li.select(col("a").as("id"))
      .unionAll(li.select(col("b").as("id"))).distinct()
    val sym = li.select(explode(array(
        struct(col("a").as("__src"), col("b").as("__dst")),
        struct(col("b").as("__src"), col("a").as("__dst")))).as("__e"))
      .select(col("__e.__src").as("__src"), col("__e.__dst").as("__dst"))
      .localCheckpoint(true)
    var labels = verts.select(col("id"), col("id").as("cluster"))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < capRounds) {
      val t0 = System.nanoTime()
      val nbrMin = sym.join(labels, col("__dst") === col("id"))
        .groupBy("__src").agg(min(col("cluster")).as("__nlbl"))
      val newLbl = least(col("cluster"), coalesce(col("__nlbl"), col("cluster")))
      val next =
        if (mode == "plain") {
          labels.join(nbrMin, labels("id") === nbrMin("__src"), "left")
            .select(labels("id"), newLbl.as("cluster"),
              (newLbl =!= col("cluster")).as("__chg"))
            .localCheckpoint(false)
        } else {
          val stepped = labels.join(nbrMin, labels("id") === nbrMin("__src"), "left")
            .select(labels("id"), newLbl.as("__c1"), col("cluster").as("__c0"))
          val jumped = stepped.join(
            labels.select(col("id").as("__lid"), col("cluster").as("__lc")),
            stepped("__c1") === col("__lid"), "left")
          val jLbl = least(col("__c1"), coalesce(col("__lc"), col("__c1")))
          jumped.select(stepped("id"), jLbl.as("cluster"),
            (jLbl =!= col("__c0")).as("__chg"))
            .localCheckpoint(false)
        }
      println(s"[probe] built round ${i + 1} plan"); Console.flush()
      if (i == 0) { next.explain(); Console.flush() }
      println(s"[probe] counting round ${i + 1}"); Console.flush()
      changed = next.filter(col("__chg")).count()
      labels = next.select("id", "cluster")
      i += 1
      println(f"round $i%2d changed=$changed%6d  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(s"mode=$mode rounds=$i components=" +
      labels.select("cluster").distinct().count())
    if (changed > 0) {
      // capped before fixpoint: the residual the production finish
      // would hand to the driver union-find
      val half = sym.join(labels, col("__src") === col("id"))
        .select(col("__dst"), col("cluster").as("__ca"))
      val resid = half.join(labels, col("__dst") === col("id"))
        .select(col("__ca").as("ca"), col("cluster").as("cb"))
        .filter(col("ca") =!= col("cb")).distinct().count()
      println(s"residual inter-label pairs at round $i: $resid")
    }
    spark.stop()
  }
}
