package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sinks

/** The engine's top-level entry point — the analog of the reference's
  * `python main.py --load_type {full|incremental}` run
  * (`wsm/etl_pipeline/main.py:51-115`, SURVEY §3.1): one call extracts,
  * applies DQ, computes the twelve named analytics reports and loads them
  * as parquet, then appends the one-row run summary (S6) — so a user of
  * the reference can replace their ETL invocation with
  * `Pipeline.run(spark, dataDir, outDir)`.
  *
  * Differences from the reference, by design:
  *  - reports are LAZY DataFrame DAGs materialized by their writes (the
  *    reference materializes every intermediate eagerly in RAM);
  *  - `incrementalSince` reproduces the T1 mode: when no event is newer
  *    than the checkpoint the run short-circuits and writes nothing
  *    (`main.py:68-70`);
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

  /** Run the full pipeline; returns rows written per report (empty map =
    * incremental short-circuit fired). Each report lands at
    * `<outDir>/<name>`; the run summary appends to
    * `<outDir>/analytics_daily_summary` (S6/S7). */
  def run(
      spark: SparkSession,
      dataDir: String,
      outDir: String,
      incrementalSince: Option[String] = None): Map[String, Long] = {
    val skip = incrementalSince.exists(ts =>
      !ops.Incremental.hasNewData(spark, dataDir, ts))
    if (skip) return Map.empty

    val counts = REPORTS.map { case (name, fn) =>
      val path = s"$outDir/$name"
      Sinks.writeParquet(fn(spark, dataDir), path)
      // count what actually landed (reading the written files back is the
      // honest number and avoids a second computation of the report DAG)
      name -> spark.read.parquet(path).count()
    }.toMap

    Sinks.appendSummary(
      Sinks.liftSummary(spark, Seq(
        "load_type" -> incrementalSince.fold("full")(_ => "incremental"),
        "n_reports" -> counts.size.toLong,
        "total_rows" -> counts.values.sum)),
      s"$outDir/analytics_daily_summary")
    counts
  }
}
