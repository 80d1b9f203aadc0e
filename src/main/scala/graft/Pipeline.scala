package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sinks

/** The engine's top-level entry point — the analog of the reference's
  * `python main.py --load_type {full|incremental}` run
  * (`wsm/etl_pipeline/main.py:51-115`, SURVEY §3.1): one call computes
  * the twelve named analytics reports, loads them as parquet, optionally
  * writes the DQ fan-out beside them, then appends the one-row run
  * summary (S6) — so a user of the reference can replace their ETL
  * invocation with `Pipeline.run(spark, dataDir, outDir)`.
  *
  * Differences from the reference, by design:
  *  - reports are LAZY DataFrame DAGs materialized by their writes (the
  *    reference materializes every intermediate eagerly in RAM);
  *  - `incrementalSince` honors the T1 empty-batch short-circuit
  *    (`main.py:68-70`). When new data exists, the three calendar-trend
  *    reports take the TRUE row-subset delta path when their previous
  *    output exists at `outDir`: [[ops.Movement.trendDelta]] merges the
  *    stored report with only the post-checkpoint buckets (pushed-down
  *    predicate scan) and re-densifies — oracle-proven ≡ the full
  *    recompute (q56). Every other report RECOMPUTES in full:
  *    recompute-over-the-ledger is the engine's batch philosophy (A14)
  *    for reports whose delta is not cheaper than their aggregate
  *    (single-row summaries, full-ledger windows). The summary row
  *    records `incremental_delta` when at least one report took the
  *    delta path, `incremental_recompute` otherwise — the mode is never
  *    misrepresented. The row-subset scan itself is also exposed as
  *    [[ops.Incremental.incrementalEvents]] (q37) and the streaming
  *    ledger (T3);
  *  - DQ is an explicit, separately-written output (`dqFanout = true`
  *    writes the valid/quarantine split under `<outDir>/dq_events` in one
  *    pass — the reference filters movements inside extract instead;
  *    report entries here read raw inputs so their DuckDB oracles stay
  *    input-exact);
  *  - cross-report reuse is Catalyst's job (shared subtrees become reused
  *    exchanges within a report; across reports the parquet scans are the
  *    shared base), not a mutable dict threaded through transform stages.
  */
object Pipeline {

  /** The reference's twelve named reports
    * (`wsm/etl_pipeline/load/data_loader.py:33-38`) → engine queries. */
  val REPORTS: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "dead_stock_report" -> (ops.Inventory.deadStockReport(_, _)),
    "inventory_summary" -> (ops.Inventory.inventorySummary(_, _)),
    "daily_trends" -> (ops.Movement.trend(_, _, "day", "1 day")),
    "weekly_trends" -> (ops.Movement.trend(_, _, "week", "1 week")),
    "monthly_trends" -> (ops.Movement.trend(_, _, "month", "1 month")),
    "peak_day_of_week" -> (ops.Movement.peakDayOfWeek(_, _)),
    "peak_month" -> (ops.Movement.peakMonth(_, _)),
    "abc_analysis" -> (ops.Financial.abcAnalysis(_, _)),
    "stock_value_report" -> (ops.Financial.stockValue(_, _)),
    "financial_summary" -> (ops.Financial.financialSummary(_, _)),
    "transfer_patterns" -> (ops.Warehouse.transferPatterns(_, _)),
    "warehouse_io_summary" -> (ops.Warehouse.ioPivot(_, _)))

  /** The calendar-trend reports and their (unit, step) — the reports
    * with a genuine row-subset delta (merging new buckets into a stored
    * calendar is cheaper than rescanning the ledger; for everything else
    * delta ≈ recompute). */
  val TREND_REPORTS: Map[String, (String, String)] = Map(
    "daily_trends" -> (("day", "1 day")),
    "weekly_trends" -> (("week", "1 week")),
    "monthly_trends" -> (("month", "1 month")))

  /** Reports that are pure aggregations of a trend report written earlier
    * in the SAME run: derived from the just-written parquet (calendar-
    * bounded — broadcast-sized at any fact scale) instead of re-scanning
    * the fact. [[REPORTS]] lists sources before their derivations. */
  val DERIVED_FROM_TRENDS
      : Map[String, (String, org.apache.spark.sql.DataFrame => DataFrame)] = Map(
    "peak_day_of_week" -> (("daily_trends", ops.Movement.peakFromDaily _)),
    "peak_month" -> (("monthly_trends", ops.Movement.peakFromMonthly _)))

  /** Run the full pipeline; returns rows written per report (empty map =
    * incremental short-circuit fired). Each report lands at
    * `<outDir>/<name>`; the run summary appends to
    * `<outDir>/analytics_daily_summary` (S6/S7). Incremental caller
    * contract: `incrementalSince` is the checkpoint the PREVIOUS run
    * covered (its reports hold exactly the events ≤ that timestamp) and
    * the event ledger is append-only — then the trend delta path is
    * exact (see [[ops.Movement.trendDelta]]). */
  def run(
      spark: SparkSession,
      dataDir: String,
      outDir: String,
      incrementalSince: Option[String] = None,
      dqFanout: Boolean = false): Map[String, Long] = {
    val skip = incrementalSince.exists(ts =>
      !ops.Incremental.hasNewData(spark, dataDir, ts))
    if (skip) return Map.empty

    // A jdbc: outDir loads every report into warehouse TABLES and the
    // summary over JDBC — the reference's real load stage
    // (`data_loader.py:33-94`: 12 report tables + the summary INSERT into
    // Postgres). The trend delta path stays parquet-only (it re-reads its
    // own previous output; a warehouse-side merge is the warehouse's job).
    val jdbcOut = outDir.startsWith("jdbc:")
    lazy val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def written(name: String): DataFrame =
      if (jdbcOut) Tables(spark, outDir, name)
      else spark.read.parquet(s"$outDir/$name")
    def exists(name: String): Boolean =
      !jdbcOut && fs.exists(new org.apache.hadoop.fs.Path(s"$outDir/$name"))

    if (dqFanout) {
      val tagged = ops.Quality.tagged(spark, dataDir)
      if (jdbcOut) Sinks.writeJdbc(tagged, outDir, "dq_events")
      else Sinks.writeDqFanout(tagged, s"$outDir/dq_events")
    }

    var deltasTaken = 0
    val counts = REPORTS.map { case (name, fn) =>
      val deltaSpec = incrementalSince.flatMap(since =>
        TREND_REPORTS.get(name).filter(_ => exists(name)).map((since, _)))
      val derivedSrc = DERIVED_FROM_TRENDS.get(name).filter { case (src, _) =>
        jdbcOut || exists(src)
      }
      (deltaSpec, derivedSrc) match {
        case (Some((since, (unit, step))), _) =>
          // row-subset path: stored report ⊎ post-checkpoint buckets;
          // staging swap because the merge reads the path it replaces
          Sinks.overwriteInPlace(
            ops.Movement.trendDelta(spark, dataDir, unit, step, since,
              written(name)), s"$outDir/$name")
          deltasTaken += 1
        case (None, Some((src, derive))) =>
          // aggregate the trend report this run just wrote — no fact scan
          val df = derive(written(src))
          if (jdbcOut) Sinks.writeJdbc(df, outDir, name)
          else Sinks.writeParquet(df, s"$outDir/$name")
        case _ =>
          val df = fn(spark, dataDir)
          if (jdbcOut) Sinks.writeJdbc(df, outDir, name)
          else Sinks.writeParquet(df, s"$outDir/$name")
      }
      // count what actually landed (reading the written output back is the
      // honest number and avoids a second computation of the report DAG)
      name -> written(name).count()
    }.toMap

    Sinks.appendSummary(
      Sinks.liftSummary(spark, Seq(
        // the label claims exactly what happened — see class doc
        "load_type" -> incrementalSince.fold("full")(_ =>
          if (deltasTaken > 0) "incremental_delta"
          else "incremental_recompute"),
        "n_reports" -> counts.size.toLong,
        "total_rows" -> counts.values.sum)),
      // jdbc: the URL itself is the sink and the table name defaults to
      // analytics_daily_summary; parquet: the usual subdirectory
      if (jdbcOut) outDir else s"$outDir/analytics_daily_summary")
    counts
  }

  /** S9: render the reference's HTML report document from the WRITTEN
    * reports of a previous [[run]] (`report_generator.py:146-201`'s
    * to_html sections plus the two one-row summaries) — reads report
    * output (report-sized at any fact scale), never the fact. The
    * transfer section re-sorts on read: parquet round-trips do not
    * guarantee row order, and the reference's `head(10)` is of the
    * SORTED pattern table. `runDate` is caller-supplied (C2). The four
    * `create_charts` figures (report_generator.py:69-143) render inline
    * from the same written reports via [[sources.Charts.chartsFor]];
    * `withCharts = false` skips them (the reference's own charts block
    * is a best-effort try/except). */
  def htmlReport(spark: SparkSession, outDir: String, runDate: String,
      path: Option[String] = None, withCharts: Boolean = true): String = {
    def written(name: String): DataFrame =
      if (outDir.startsWith("jdbc:")) Tables(spark, outDir, name)
      else spark.read.parquet(s"$outDir/$name")
    def writtenOpt(name: String): Option[DataFrame] =
      try Some(written(name)) catch {
        case _: org.apache.spark.sql.AnalysisException => None
      }
    Sinks.writeHtmlReport(
      charts =
        if (withCharts) sources.Charts.chartsFor(writtenOpt) else Nil,
      sections = reportSections(written),
      title = "Warehouse Report",
      runDate = runDate,
      path = path)
  }

  /** S9's PDF document (`report_generator.py:203-214`: the reference's
    * WeasyPrint-optional export of the SAME report) — identical section
    * list and caps as [[htmlReport]], written by the stdlib PDF writer
    * ([[sources.Pdf]]). */
  def pdfReport(spark: SparkSession, outDir: String, runDate: String,
      path: Option[String] = None): Array[Byte] = {
    def written(name: String): DataFrame =
      if (outDir.startsWith("jdbc:")) Tables(spark, outDir, name)
      else spark.read.parquet(s"$outDir/$name")
    sources.Pdf.writeReport(reportSections(written),
      title = "Warehouse Report", runDate = runDate, path = path)
  }

  /** The report document's five sections over the WRITTEN reports —
    * shared by the HTML and PDF renderings so the two documents agree
    * section-for-section. */
  private def reportSections(
      written: String => DataFrame): Seq[(String, DataFrame)] = {
    import org.apache.spark.sql.functions.col
    Seq(
      "Inventory Summary" -> written("inventory_summary"),
      "Financial Summary" -> written("financial_summary"),
      "Peak Day of Week" -> written("peak_day_of_week"),
      "Peak Month" -> written("peak_month"),
      "Transfer Patterns (top 10)" -> written("transfer_patterns")
        .orderBy(col("total_transfers").desc, col("from_warehouse_id"),
          col("to_warehouse_id"))
        .limit(10))
  }
}
