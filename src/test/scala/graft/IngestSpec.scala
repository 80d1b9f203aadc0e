package graft

import graft.ops.{Incremental, Ingest, Udtf}
import org.apache.spark.sql.functions._

/** Pins the ingest/UDTF contracts the reference encodes procedurally:
  * the FIFO/LIFO RAISE EXCEPTION, transfer-leg conservation (legs sum to
  * zero per reference — so replay preserves per-part totals), validation
  * rule precedence, and the T1 empty-batch short-circuit. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = fixtureDir(
    "lineitem" -> Seq(
      // Commands derive from 'R' rows with quantity = l_quantity − 20.
      // (1,1): command qty 50−20=30, cell stock 25+50=75 → success
      // (to = (1*7+1)%97+1 = 9 ≠ 1).
      Li(part = 1, supp = 1, qty = 25, price = 100.0, flag = "N", ts("2001-01-01 00:00:00")),
      Li(part = 1, supp = 1, qty = 50, price = 100.0, flag = "R", ts("2001-02-01 00:00:00")),
      // (2,3): command qty 10−20 = −10 → error_quantity.
      Li(part = 2, supp = 3, qty = 10, price = 50.0, flag = "R", ts("2001-03-01 00:00:00")),
      // (4,2): command qty 45−20=25 but cell stock 45−44=1 → insufficient.
      Li(part = 4, supp = 2, qty = 45, price = 70.0, flag = "R", ts("2001-04-01 00:00:00")),
      Li(part = 4, supp = 2, qty = -44, price = 70.0, flag = "N", ts("2001-04-02 00:00:00"))
    ).toDF(),
    // valuation needs the orders cost pool (no 'F' rows → coalesce-0
    // path) and the part dimension for names.
    "orders" -> Seq((1L, 1L, "O", 10.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
    "part" -> Seq((1L, "part one"), (2L, "part two"), (4L, "part four"))
      .toDF("p_partkey", "p_name"))

  test("unknown valuation method raises, AVG works") {
    val e = intercept[IllegalArgumentException] {
      Udtf.calculateStockValue(spark, dir, "XYZ")
    }
    assert(e.getMessage.contains("not implemented"))
    // AVG with no completed orders: cost pool empty → coalesce(0) path.
    val rows = Udtf.calculateStockValue(spark, dir, "AVG").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("weighted_avg_cost") == 0.0))
  }

  test("FIFO keeps the newest receipt layers, LIFO the oldest (hand-walked)") {
    // One cell: receipts of 10 @ cost 10 (Jan) and 10 @ cost 20 (Feb),
    // then 5 issued (Mar) → on-hand 15.
    //   FIFO consumes the Jan layer first: remaining = 10@20 + 5@10 = 250.
    //   LIFO consumes the Feb layer first: remaining = 10@10 + 5@20 = 200.
    val vDir = fixtureDir(
      "lineitem" -> Seq(
        Li(l_orderkey = 1, l_partkey = 7, l_suppkey = 1, l_quantity = 10,
          l_extendedprice = 100.0, l_discount = 0, l_tax = 0,
          l_returnflag = "A", l_linestatus = "O",
          l_shipdate = ts("2001-01-01 00:00:00")),
        Li(l_orderkey = 2, l_partkey = 7, l_suppkey = 1, l_quantity = 10,
          l_extendedprice = 200.0, l_discount = 0, l_tax = 0,
          l_returnflag = "A", l_linestatus = "O",
          l_shipdate = ts("2001-02-01 00:00:00")),
        Li(l_orderkey = 3, l_partkey = 7, l_suppkey = 1, l_quantity = 5,
          l_extendedprice = 55.0, l_discount = 0, l_tax = 0,
          l_returnflag = "R", l_linestatus = "O",
          l_shipdate = ts("2001-03-01 00:00:00"))
      ).toDF(),
      "part" -> Seq((7L, "part seven")).toDF("p_partkey", "p_name"))
    val layers = Udtf.stockValuationLayers(spark, vDir).collect()
    assert(layers.length == 1)
    val r = layers.head
    assert(r.getAs[Double]("total_quantity") == 15.0)
    assert(r.getAs[Double]("fifo_value") == 250.0)
    assert(r.getAs[Double]("lifo_value") == 200.0)
    // the method dispatch serves the same numbers through the P4 API
    val fifo = Udtf.calculateStockValue(spark, vDir, "FIFO").collect().head
    assert(fifo.getAs[Double]("total_value") == 250.0)
    val lifo = Udtf.calculateStockValue(spark, vDir, "LIFO").collect().head
    assert(lifo.getAs[Double]("total_value") == 200.0)
  }

  test("LIFO is the PERIODIC method: an interleaved issue consumes the latest receipt") {
    // receipt 10@10 (Jan), issue 5 (Jan 15), receipt 10@20 (Feb).
    // Periodic LIFO allocates at valuation time: remaining 15 = the
    // OLDEST prefix = 10@10 + 5@20 = 200. (Perpetual LIFO would shield
    // the early layer — 10@10 + 10@20 − 5@10 = 250 — and is documented
    // as the explicit non-goal; FIFO is identical under both methods.)
    val vDir = fixtureDir(
      "lineitem" -> Seq(
        Li(l_orderkey = 1, l_partkey = 3, l_suppkey = 1, l_quantity = 10,
          l_extendedprice = 100.0, l_discount = 0, l_tax = 0,
          l_returnflag = "A", l_linestatus = "O",
          l_shipdate = ts("2001-01-01 00:00:00")),
        Li(l_orderkey = 2, l_partkey = 3, l_suppkey = 1, l_quantity = 5,
          l_extendedprice = 50.0, l_discount = 0, l_tax = 0,
          l_returnflag = "R", l_linestatus = "O",
          l_shipdate = ts("2001-01-15 00:00:00")),
        Li(l_orderkey = 3, l_partkey = 3, l_suppkey = 1, l_quantity = 10,
          l_extendedprice = 200.0, l_discount = 0, l_tax = 0,
          l_returnflag = "A", l_linestatus = "O",
          l_shipdate = ts("2001-02-01 00:00:00"))
      ).toDF(),
      "part" -> Seq((3L, "part three")).toDF("p_partkey", "p_name"))
    val r = Udtf.stockValuationLayers(spark, vDir).collect().head
    assert(r.getAs[Double]("total_quantity") == 15.0)
    assert(r.getAs[Double]("lifo_value") == 200.0) // periodic, by design
    assert(r.getAs[Double]("fifo_value") == 250.0) // method-independent
  }

  test("FIFO/LIFO converge to cost×qty when nothing was issued, 0 when oversold") {
    val vDir = fixtureDir(
      "lineitem" -> Seq(
        // part 1: single receipt, no issues → both methods = 10×10 = 100.
        Li(l_orderkey = 1, l_partkey = 1, l_suppkey = 1, l_quantity = 10,
          l_extendedprice = 100.0, l_discount = 0, l_tax = 0,
          l_returnflag = "A", l_linestatus = "O",
          l_shipdate = ts("2001-01-01 00:00:00")),
        // part 2: oversold cell (issues > receipts) → dropped (on-hand ≤ 0).
        Li(l_orderkey = 2, l_partkey = 2, l_suppkey = 1, l_quantity = 5,
          l_extendedprice = 50.0, l_discount = 0, l_tax = 0,
          l_returnflag = "A", l_linestatus = "O",
          l_shipdate = ts("2001-01-01 00:00:00")),
        Li(l_orderkey = 3, l_partkey = 2, l_suppkey = 1, l_quantity = 9,
          l_extendedprice = 90.0, l_discount = 0, l_tax = 0,
          l_returnflag = "R", l_linestatus = "O",
          l_shipdate = ts("2001-02-01 00:00:00"))
      ).toDF(),
      "part" -> Seq((1L, "p1"), (2L, "p2")).toDF("p_partkey", "p_name"))
    val rows = Udtf.stockValuationLayers(spark, vDir).collect()
    assert(rows.map(_.getAs[Long]("part_id")).toSeq == Seq(1L))
    assert(rows.head.getAs[Double]("fifo_value") == 100.0)
    assert(rows.head.getAs[Double]("lifo_value") == 100.0)
  }

  test("validation rules fire in first-match order") {
    val d = Ingest.validated(spark, dir)
      .select($"part_id", $"from_warehouse_id", $"disposition")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(d((1L, 1L)) == "success")            // qty 30 ≤ stock 30
    assert(d((2L, 3L)) == "error_quantity")     // qty −10
    assert(d((4L, 2L)) == "error_insufficient") // qty 25 > stock 1
  }

  test("transfer legs sum to zero per reference (conservation law)") {
    val sums = Ingest.transferLegs(spark, dir)
      .groupBy($"reference_id")
      .agg(sum($"quantity").as("s"))
      .collect()
    assert(sums.nonEmpty)
    assert(sums.forall(_.getAs[Double]("s") == 0.0))
  }

  test("replay preserves per-part totals (transfers move, never create)") {
    val before = Tables(spark, dir, "lineitem")
      .groupBy($"l_partkey".as("part_id"))
      .agg(sum($"l_quantity").as("total")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val after = Ingest.replaySnapshot(spark, dir)
      .groupBy($"part_id")
      .agg(sum($"quantity_on_hand").as("total")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after == before)
  }

  test("q36 replay reads lineitem exactly twice (base = reused snapshot aggregate)") {
    // Round-6 verdict #1: replaySnapshot must NOT re-scan the fact for the
    // base replay — the batch-start snapshot aggregate (identical subtree
    // inside the validation join) is the base, so the executed plan holds
    // exactly two lineitem scans (commands + snapshot) with the snapshot
    // exchange reused, not three.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val df = Ingest.replaySnapshot(spark, dir)
    df.queryExecution.toRdd.foreach(_ => ())
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case _: ReusedExchangeExec => Seq.empty // a reuse is not a rescan
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val distinct = scans(df.queryExecution.executedPlan)
      .groupBy(System.identityHashCode(_)).values.map(_.head).toSeq
    assert(distinct.size == 2,
      s"expected 2 lineitem scans, saw ${distinct.size}:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("incremental load short-circuits on an empty batch") {
    val evDir = fixtureDir(
      "events" -> Seq(
        Ev(1, ts("2024-01-10 00:00:00"), 1, "view", 1.0, "{}"),
        Ev(2, ts("2024-01-20 00:00:00"), 2, "view", 1.0, "{}")
      ).toDF())
    assert(Incremental.hasNewData(spark, evDir, "2024-01-15 00:00:00"))
    assert(!Incremental.hasNewData(spark, evDir, "2030-01-01 00:00:00"))
    val rows = Incremental.incrementalEvents(spark, evDir, "2024-01-15 00:00:00")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("audit diff classifies INSERT/UPDATE/DELETE with null-safe equality") {
    // old cutoff 1995-06-30, new 1997-12-31 (Incremental constants).
    val aDir = fixtureDir(
      "lineitem" -> Seq(
        // cell (1,1): 10 before, +5 after → UPDATE 10 → 15.
        Li(part = 1, supp = 1, qty = 10, price = 1.0, flag = "N", ts("1995-01-01 00:00:00")),
        Li(part = 1, supp = 1, qty = 5, price = 1.0, flag = "N", ts("1996-01-01 00:00:00")),
        // cell (2,1): only after → INSERT.
        Li(part = 2, supp = 1, qty = 7, price = 1.0, flag = "N", ts("1996-01-01 00:00:00")),
        // cell (3,1): 4 before, returned ('R' negates) to 0 after → DELETE.
        Li(part = 3, supp = 1, qty = 4, price = 1.0, flag = "N", ts("1995-01-01 00:00:00")),
        Li(part = 3, supp = 1, qty = 4, price = 1.0, flag = "R", ts("1996-01-01 00:00:00")),
        // cell (4,1): unchanged → dropped from the diff.
        Li(part = 4, supp = 1, qty = 9, price = 1.0, flag = "N", ts("1995-01-01 00:00:00"))
      ).toDF())
    val ops = Incremental.auditDiff(spark, aDir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(ops == Map(1L -> "UPDATE", 2L -> "INSERT", 3L -> "DELETE"))
    val fresh = Incremental.newCells(spark, aDir).collect().map(_.getLong(0))
    assert(fresh.toSeq == Seq(2L))
  }
}
