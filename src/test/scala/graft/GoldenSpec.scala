package graft

import org.apache.spark.sql.Row

/** Golden-value checks at sf0.001 (literals computed once with
  * DuckDB 1.0.0 — the same engine the driver's t2 gate uses).
  */
class GoldenSpec extends GraftSpec {

  test("agg_groupby (Q1) matches DuckDB goldens") {
    val rows = q("agg_groupby")
      .selectExpr("l_returnflag", "l_linestatus", "CAST(sum_qty AS STRING)", "count_order")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val expected = Seq(
      ("A", "F", "13096.00", 510L), ("A", "O", "13173.00", 534L),
      ("N", "F", "15619.00", 594L), ("N", "O", "13130.00", 528L),
      ("R", "F", "13038.00", 531L), ("R", "O", "13188.00", 528L))
    assert(rows.toSeq === expected)
  }

  test("agg_distinct matches exact distinct-part counts") {
    val rows = q("agg_distinct").select("l_returnflag", "n_parts")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("A", 200L), ("N", 200L), ("R", 200L)))
  }

  test("agg_approx_distinct is within 5% of exact and deterministic") {
    // Default rsd = 0.05; at 200 distinct values HLL++ is still in its
    // sparse (exact) regime, so 5% is a conservative bound — and the
    // sketch is seedless, so two runs must agree bit-for-bit.
    val approx = q("agg_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (flag, est) =>
      assert(math.abs(est - 200L) <= 10, s"$flag: HLL estimate $est vs exact 200")
    }
    val again = q("agg_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === approx, "HLL estimate is not deterministic across runs")
  }

  test("scan_events_ns reads all 1000 ns-timestamp rows with 30 distinct days") {
    val df = q("scan_events_ns")
    assert(df.count() === 1000L)
    assert(df.selectExpr("count(distinct date_trunc('day', ts))").head().getLong(0) === 30L)
  }

  test("null_safe_div: zero divisor yields NULL, not Inf") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT null_safe_div(10.0, 0.0) AS z, null_safe_div(10.0, 4.0) AS v, null_safe_div(CAST(NULL AS DOUBLE), 2.0) AS n")
      .head()
    assert(r.isNullAt(0) && r.getDouble(1) === 2.5 && r.isNullAt(2))
  }

  test("typed aggregators agree with SQL formulations") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sf, "lineitem")
    val wavg = udaf(functions.Aggregators.WeightedAvg)
    val got = li.agg(wavg(col("l_extendedprice"), col("l_quantity"))).head().getDouble(0)
    val exp = li.selectExpr(
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)" +
        " / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").head().getDouble(0)
    assert(got === exp)
  }

  test("array_dot (codegen) is bit-identical to the HOF formulation") {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, sf, "embeddings")
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("q"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("c")))
      .filter(col("a") < 50 && col("b") < 50)
      .withColumn("fast", expr("array_dot(q, c)"))
      .withColumn("hof",
        expr("aggregate(zip_with(q, c, (x, y) -> double(x) * double(y)), 0D, (acc, v) -> acc + v)"))
    assert(pairs.filter(col("fast") =!= col("hof")).count() === 0L)
  }

  test("simhash64 (native) is bit-identical to the HOF formulation") {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val hof =
      "aggregate(zip_with(aggregate(words, array_repeat(CAST(0 AS BIGINT), 64), (acc, w) -> " +
        "zip_with(acc, sequence(0, 63), (a, i) -> a + if((shiftright(xxhash64(w), cast(i AS int)) & 1) = 1, " +
        "CAST(1 AS BIGINT), CAST(-1 AS BIGINT)))), sequence(0, 63), (c, i) -> " +
        "if(c >= 0, shiftleft(CAST(1 AS BIGINT), cast(i AS int)), CAST(0 AS BIGINT))), " +
        "CAST(0 AS BIGINT), (acc, v) -> acc | v)"
    val df = Tables.load(spark, sf, "documents")
      .withColumn("words", split(col("text"), " "))
      .withColumn("fast", expr("simhash64(words)"))
      .withColumn("slow", expr(hof))
    assert(df.filter(col("fast") =!= col("slow")).count() === 0L)
  }

  test("sample_seeded is reproducible") {
    val a = q("sample_seeded").collect().toSeq
    val b = q("sample_seeded").collect().toSeq
    assert(a === b && a.nonEmpty)
    // the md5-bucket rate should sit near the nominal 10%
    val total = Tables.load(spark, sf, "lineitem").count()
    assert(math.abs(a.size.toDouble / total - 0.1) < 0.02,
      s"sample rate ${a.size.toDouble / total} far from 0.1")
  }

  test("df.sample primitive: seeded row set is stable across runs") {
    // The engine RNG sample stays exercised (round 6 moved the
    // ORACLED sample_seeded entry to the portable md5 bucketing).
    val li = Tables.load(spark, sf, "lineitem")
    def draw() = li.sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .select("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSet
    val a = draw()
    assert(a === draw() && a.nonEmpty)
  }

  test("typed_mapgroups matches the declarative formulation row-for-row") {
    import org.apache.spark.sql.functions._
    val e = Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_type", "unix_micros(cast(ts as timestamp)) AS ep")
    val stats = e.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (max(col("ep")) - min(col("ep"))).as("span_us"),
        countDistinct(col("event_type")).as("n_types"))
    val top = e.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("c").desc, col("event_type").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("top_type"), col("c").as("top_n"))
    val expected = stats.join(top, "user_id")
      .select("user_id", "n", "span_us", "n_types", "top_type", "top_n")
      .orderBy("user_id").collect().toSeq
    assert(q("typed_mapgroups").collect().toSeq === expected)
  }
}
