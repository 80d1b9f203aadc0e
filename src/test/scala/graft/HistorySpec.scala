package graft

import graft.ops.History
import org.apache.spark.sql.functions._

/** Pins q80/q82 semantics on a planted ledger: the gaps-and-islands
  * collapse (a zero-net day must NOT open a new interval), interval
  * closing over the filtered frame, and the central invariant — the
  * interval probe equals a direct ledger replay at EVERY instant, not
  * just the pinned one the driver oracle checks. */
class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def fixture = fixtureDir("lineitem" -> Seq(
    // cell (1,1): +10 on day 1; +5/-5 on day 3 (net zero — must collapse);
    // -4 on day 5 → balance 6
    Li(1L, 1L, 1L, 1, 10.0, 1.0, 0.0, 0.0, "N", "O", ts("2020-01-01 00:00:00")),
    Li(2L, 1L, 1L, 1, 5.0, 1.0, 0.0, 0.0, "A", "O", ts("2020-01-03 00:00:00")),
    Li(3L, 1L, 1L, 1, 5.0, 1.0, 0.0, 0.0, "R", "O", ts("2020-01-03 00:00:00")),
    Li(4L, 1L, 1L, 1, 4.0, 1.0, 0.0, 0.0, "R", "O", ts("2020-01-05 00:00:00")),
    // cell (2,1): a single receipt
    Li(5L, 2L, 1L, 1, 7.0, 1.0, 0.0, 0.0, "A", "O", ts("2020-01-02 00:00:00"))
  ).toDF)

  test("zero-net day collapses; intervals close at the next genuine change") {
    val dir = fixture
    val rows = History.stockHistory(spark, dir)
      .orderBy("part_id", "warehouse_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toLocalDateTime.toLocalDate.toString,
        Option(r.getTimestamp(3)).map(_.toLocalDateTime.toLocalDate.toString).orNull,
        r.getDouble(4)))
    assert(rows.toSeq == Seq(
      // 2020-01-03 netted to zero: no interval opens there, and the day-1
      // interval closes at the NEXT CHANGE (day 5), not the next ledger day
      (1L, 1L, "2020-01-01", "2020-01-05", 10.0),
      (1L, 1L, "2020-01-05", null, 6.0),
      (2L, 1L, "2020-01-02", null, 7.0)))
  }

  test("history delta ≡ full recompute at every checkpoint") {
    // fixture edges covered as the checkpoint slides: stored empty (all
    // days new), first new day nets to ZERO on a stored cell (open
    // interval must stay open), a brand-new cell appearing after the
    // checkpoint, and no new days at all
    val dir = fixture
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("part_id", "warehouse_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toString,
        Option(r.getTimestamp(3)).map(_.toString).orNull,
        r.getDouble(4))).toSeq
    val full = rows(History.stockHistory(spark, dir))
    val checkpoints = Seq("2019-12-31", "2020-01-01", "2020-01-02",
      "2020-01-03", "2020-01-04", "2020-01-05", "2020-01-09")
    for (cp <- checkpoints) {
      val delta = rows(History.historyDelta(spark, dir, cp,
        History.stockHistoryUntil(spark, dir, cp)))
      assert(delta == full, s"delta/full diverge at checkpoint=$cp")
    }
  }

  test("incremental delta over a date-partitioned ledger prunes closed days " +
      "at planning time and still equals the full recompute") {
    val dir = fixture
    val cp = "2020-01-03"
    // the production layout: ledger partitioned by ship day (the q37 rule)
    val part = java.nio.file.Files.createTempDirectory("graft-ledger").toString
    Tables(spark, dir, "lineitem")
      .withColumn("ship_day", to_date($"l_shipdate"))
      .write.mode("overwrite").partitionBy("ship_day").parquet(part)
    val layoutFiles = spark.read.parquet(part).inputFiles.length
    assert(layoutFiles >= 4, "expected one file per ledger day at minimum")

    // the stored side read from parquet (what a previous run persisted) —
    // the delta plan must contain exactly ONE ledger scan, and it must be
    // the pruned one
    val storedPath = java.nio.file.Files.createTempDirectory("graft-stored").toString
    graft.sources.Sinks.writeParquet(
      History.stockHistoryUntil(spark, dir, cp), storedPath)
    val delta = History.historyDeltaFrom(
      spark.read.parquet(part)
        .filter($"ship_day" > java.sql.Date.valueOf(cp)),
      cp, spark.read.parquet(storedPath))

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("part_id", "warehouse_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString,
        Option(r.getTimestamp(3)).map(_.toString).orNull,
        r.getDouble(4))).toSeq
    assert(rows(delta) == rows(History.stockHistory(spark, dir)),
      "partitioned delta diverges from the full recompute")

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(pl: SparkPlan): Seq[FileSourceScanExec] = pl match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val all = scans(delta.queryExecution.executedPlan)
    val ledgerScans = all.filter(_.schema.fieldNames.contains("l_quantity"))
    assert(ledgerScans.length == 1,
      s"expected exactly one fact scan, found ${ledgerScans.length}")
    val scan = ledgerScans.head
    assert(scan.partitionFilters.nonEmpty,
      "checkpoint predicate did not reach PartitionFilters")
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead < layoutFiles,
      s"no pruning: read $filesRead of $layoutFiles ledger files")
    // days ≤ Jan-03 (the stored side's domain) must all be pruned:
    // only Jan-05 remains post-checkpoint in the fixture
    assert(filesRead <= layoutFiles - 3,
      s"expected the closed days pruned, read $filesRead/$layoutFiles")
  }

  test("as-of interval probe ≡ direct ledger replay at every probe instant") {
    val dir = fixture
    val li = Tables(spark, dir, "lineitem")
    val probes = Seq("2019-12-31", "2020-01-01", "2020-01-02", "2020-01-03",
      "2020-01-04", "2020-01-05", "2020-01-09")
    for (d <- probes) {
      val probe = History.stockAsOf(spark, dir, lit(d))
        .orderBy("part_id", "warehouse_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val replay = li
        .filter(to_date($"l_shipdate") <= to_date(lit(d)))
        .groupBy($"l_partkey".as("part_id"), $"l_suppkey".as("warehouse_id"))
        .agg(Dx.decSum(expr(
          "CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END"))
          .cast("double").as("stock_level"))
        .orderBy("part_id", "warehouse_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(probe == replay, s"probe/replay diverge at asOf=$d")
    }
  }
}
