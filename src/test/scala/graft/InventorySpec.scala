package graft

import graft.ops.Inventory

/** Ports the reference's dead-stock unit test
  * (`wsm/etl_pipeline/tests/test_transformations.py:43-64`): only the
  * 200-days-stale cell with positive stock is dead; fresh movement and
  * zero-quantity cells are excluded; plus our never-moved → 9999-sentinel
  * path (`inventory_metrics.py:34`). AS_OF is pinned to 2002-01-01
  * (Inventory.AS_OF), so "200 days ago" = 2001-06-15, "10 days ago" =
  * 2001-12-22. */
class InventorySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = fixtureDir(
    "lineitem" -> Seq(
      // cell (1,1): qty 10, moved 10 days before AS_OF → NOT dead.
      Li(part = 1, supp = 1, qty = 10, price = 100.0, flag = "A", ts("2001-12-22 00:00:00")),
      // cell (2,1): qty 5, moved 200 days before AS_OF → DEAD.
      Li(part = 2, supp = 1, qty = 5, price = 100.0, flag = "A", ts("2001-06-15 00:00:00")),
      // cell (3,1): stale movement but net quantity 0 → excluded.
      Li(part = 3, supp = 1, qty = 5, price = 100.0, flag = "A", ts("2001-06-15 00:00:00")),
      Li(part = 3, supp = 1, qty = -5, price = 100.0, flag = "A", ts("2001-06-15 00:00:00")),
      // cell (4,1): positive stock, NO logged movement ('N' rows are
      // unlogged initial stock) → null last move → 9999 sentinel → DEAD.
      Li(part = 4, supp = 1, qty = 3, price = 100.0, flag = "N", ts("2001-12-22 00:00:00"))
    ).toDF())

  test("dead stock: stale+positive only; qty-0 and fresh cells excluded") {
    val report = Inventory.deadStockReport(spark, dir)
      .select("part_id", "days_since_last_movement").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(report.keySet == Set(2L, 4L))
    assert(report(2L) == 200)
    assert(report(4L) == 9999) // never-moved sentinel counts as dead
  }

  test("dead-stock flags keep every cell; only flags differ") {
    val flags = Inventory.deadStockFlags(spark, dir)
      .select("part_id", "is_dead_stock").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
  }

  test("asOf is caller-parameterized (C2): a later as-of makes fresh cells dead") {
    import org.apache.spark.sql.functions.lit
    // one year past the pinned AS_OF, cell (1,1)'s 10-day-old movement is
    // now 375 days stale → dead; the production call passes current_date()
    // the same way, no module edit needed.
    val flags = Inventory.deadStockFlags(spark, dir, asOf = lit("2003-01-01"))
      .select("part_id", "is_dead_stock").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true))
  }

  test("inventory summary prices dead stock and guards ratios") {
    val row = Inventory.inventorySummary(spark, dir).collect().head
    assert(row.getAs[Long]("total_dead_stock_items") == 2L)
    // dead value = qty × per-part avg cost: part 2 → 5 × (100/5) = 100;
    // part 4 → 3 × (100/3); cents-rounded then summed.
    val expected = 100.0 + math.floor(3.0 * (100.0 / 3.0) * 100 + 0.5) / 100
    assert(row.getAs[Double]("total_dead_stock_value") == expected)
  }

  test("stock aging: bucket boundaries, never-moved sentinel, exact totals") {
    import spark.implicits._
    // as-of 2002-01-01: 17d -> 000-030, 78d -> 031-090, 170d -> 091-180,
    // 365d -> 181+, no logged movement (flag N only) -> never-moved;
    // a zero-stock cell (part 6) must vanish entirely.
    val dir = fixtureDir("lineitem" -> Seq(
      Li(part = 1, supp = 1, qty = 10, price = 100.0, flag = "A", ts("2001-12-15 00:00:00")),
      Li(part = 2, supp = 1, qty = 5, price = 200.0, flag = "A", ts("2001-10-15 00:00:00")),
      Li(part = 3, supp = 1, qty = 2, price = 50.0, flag = "R", ts("2001-07-15 00:00:00")),
      Li(part = 4, supp = 1, qty = 4, price = 75.0, flag = "A", ts("2001-01-01 00:00:00")),
      Li(part = 5, supp = 1, qty = 7, price = 10.0, flag = "N", ts("2001-12-30 00:00:00")),
      Li(part = 6, supp = 1, qty = 5, price = 10.0, flag = "A", ts("2001-12-30 00:00:00")),
      Li(part = 6, supp = 1, qty = -5, price = 10.0, flag = "A", ts("2001-12-30 00:00:00"))
    ).toDF)
    val r = graft.ops.Inventory.stockAging(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2), x.getDouble(3)))
      .toMap
    assert(r == Map(
      "000-030" -> ((1L, 10.0, 100.0)),
      "031-090" -> ((1L, 5.0, 200.0)),
      "091-180" -> ((1L, 2.0, 50.0)),
      "181+" -> ((1L, 4.0, 75.0)),
      "never-moved" -> ((1L, 7.0, 10.0))))
  }
}
