package graft

/** End-to-end pipeline run over the smallest testdata: all twelve
  * reference reports land with rows, the run summary appends once per
  * run, and the incremental short-circuit writes nothing — the §3.1
  * lifecycle as one call. */
class PipelineSpec extends SparkSpec {

  test("full run writes all 12 reports + appends the run summary") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val counts = Pipeline.run(spark, "/root/testdata/sf0.001", out,
      dqFanout = true)
    // the DQ side-output landed beside the reports, partitioned by rule
    assert(spark.read.parquet(s"$out/dq_events")
      .select("dq_issue").distinct().count() >= 1)
    assert(counts.keySet == Pipeline.REPORTS.map(_._1).toSet)
    assert(counts.values.forall(_ > 0), counts.toString)
    // one-row summaries really are one row
    assert(counts("inventory_summary") == 1L)
    assert(counts("financial_summary") == 1L)
    val summary = spark.read.parquet(s"$out/analytics_daily_summary")
    assert(summary.count() == 1)
    // second run appends a second summary row (S6 semantics)
    Pipeline.run(spark, "/root/testdata/sf0.001", out)
    assert(spark.read.parquet(s"$out/analytics_daily_summary").count() == 2)
    // S9: the HTML document renders from the WRITTEN reports — all five
    // sections present, top-10 cap on the transfer table
    val html = Pipeline.htmlReport(spark, out, "2002-01-01 00:00:00",
      Some(s"$out/warehouse_report.html"))
    for (sec <- Seq("Inventory Summary", "Financial Summary",
        "Peak Day of Week", "Peak Month", "Transfer Patterns (top 10)"))
      assert(html.contains(s"<h2>$sec</h2>"), s"missing section $sec")
    assert(new java.io.File(s"$out/warehouse_report.html").length() > 0)
    val transfers = html.split("<h2>Transfer Patterns \\(top 10\\)</h2>")(1)
    assert(transfers.split("<tr>").length - 2 <= 10)
    // the four create_charts figures render inline from the written
    // reports (report_generator.py:69-143 → Charts.chartsFor)
    for (fig <- Seq("monthly_movements", "abc_analysis_pie",
        "warehouse_activity", "top_10_value_products"))
      assert(html.contains(s"""<figure id="$fig"><svg """),
        s"missing chart $fig")
  }

  test("generator → warehouse → pipeline → reports closes the lifecycle loop") {
    // the reference's own loop (generate_data.py:528-556 feeding
    // main.py:51-115): write the generated warehouse (masters + order
    // family + facts + fixture projections), run the UNCHANGED pipeline
    // over it, and check every report lands with rows.
    val gen = java.nio.file.Files.createTempDirectory("graft-genwh").toString
    val out = java.nio.file.Files.createTempDirectory("graft-genout").toString
    val written = graft.ops.Generator.writeWarehouse(spark, gen)
    // all ten tables landed, at their declared cardinalities
    assert(written("categories") == graft.ops.Generator.DEFAULT_CATEGORIES)
    assert(written("suppliers") == graft.ops.Generator.DEFAULT_SUPPLIERS)
    assert(written("movements") == graft.ops.Generator.DEFAULT_ROWS)
    assert(written("events") == graft.ops.Generator.DEFAULT_ROWS)
    // order lines + the two paired legs per transfer
    assert(written("lineitem") ==
      written("order_details") + 2 * graft.ops.Generator.DEFAULT_TRANSFERS)

    val counts = Pipeline.run(spark, gen, out, dqFanout = true)
    assert(counts.keySet == Pipeline.REPORTS.map(_._1).toSet)
    assert(counts.values.forall(_ > 0), counts.toString)
    // the generator's planted 5% noise is what the DQ fan-out quarantines:
    // props k=99 rows land under dq_issue=invalid_reference
    val dq = spark.read.parquet(s"$out/dq_events")
    val quarantined = dq.filter(dq("dq_issue") === "invalid_reference").count()
    val planted = spark.read.parquet(s"$gen/events.parquet")
    val expected = planted.filter(planted("user_id") === 9999999L).count()
    assert(quarantined == expected && quarantined > 0,
      s"planted=$expected quarantined=$quarantined")
  }

  test("incremental delta: stored trends merge new buckets, ≡ full recompute") {
    import org.apache.spark.sql.functions.{lit, to_timestamp}
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val cut = "2024-01-15 00:00:00"
    // phase 1: a full run over the ledger AS OF the checkpoint — what a
    // previous day's pipeline would have persisted
    val dirA = fixtureDir(
      "lineitem" -> Tables(spark, src, "lineitem"),
      "events" -> Tables(spark, src, "events")
        .filter($"ts" <= to_timestamp(lit(cut))))
    val out = java.nio.file.Files.createTempDirectory("graft-delta").toString
    Pipeline.run(spark, dirA, out)
    // phase 2: incremental over the grown ledger — trends must take the
    // delta path (merge stored + post-checkpoint buckets in place)
    val counts2 = Pipeline.run(spark, src, out, incrementalSince = Some(cut))
    assert(counts2.nonEmpty)
    Pipeline.TREND_REPORTS.foreach { case (name, (unit, step)) =>
      val delta = spark.read.parquet(s"$out/$name")
        .select("bucket", "n_events", "total_value").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      val full = graft.ops.Movement.trend(spark, src, unit, step)
        .select("bucket", "n_events", "total_value").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      assert(delta == full, s"$name: delta != full recompute")
    }
    // peak reports were derived from the merged trends (no fact rescan)
    // and must still equal their full recompute
    val peakDelta = spark.read.parquet(s"$out/peak_day_of_week").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    val peakFull = graft.ops.Movement.peakDayOfWeek(spark, src).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(peakDelta == peakFull, "peak_day_of_week: derived != recompute")
    // the summary row claims exactly what happened
    val loadTypes = spark.read.parquet(s"$out/analytics_daily_summary")
      .select("load_type").collect().map(_.getString(0)).toSet
    assert(loadTypes == Set("full", "incremental_delta"))
  }

  test("jdbc outDir: all 12 reports + summary + DQ land in a warehouse") {
    // the reference's real load stage (12 report tables + summary INSERT
    // into Postgres) against in-process Derby — same writer calls, only
    // the URL differs
    val url = "jdbc:derby:memory:graftpipe;create=true"
    val counts = Pipeline.run(spark, "/root/testdata/sf0.001", url,
      dqFanout = true)
    assert(counts.keySet == Pipeline.REPORTS.map(_._1).toSet)
    assert(counts.values.forall(_ > 0), counts.toString)
    assert(Tables(spark, url, "analytics_daily_summary").count() == 1)
    assert(Tables(spark, url, "dq_events").count() > 0)
    // second run appends a second summary row over JDBC (S6)
    Pipeline.run(spark, "/root/testdata/sf0.001", url)
    assert(Tables(spark, url, "analytics_daily_summary").count() == 2)
  }

  test("incremental run short-circuits when nothing is newer than the checkpoint") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipe-inc").toString
    val counts = Pipeline.run(spark, "/root/testdata/sf0.001", out,
      incrementalSince = Some("2035-01-01 00:00:00"))
    assert(counts.isEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/analytics_daily_summary")))
  }
}
