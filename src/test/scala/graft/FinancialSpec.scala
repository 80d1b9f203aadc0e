package graft

import graft.ops.Financial

/** Ports the reference's ABC unit test
  * (`wsm/etl_pipeline/tests/test_transformations.py:66-90`): revenues
  * 1000/1000/500 over three products, thresholds A ≤ 0.80 / B ≤ 0.95
  * cumulative, inclusive boundaries.
  *
  * NOTE on the ported expectation: the reference test asserts product 3
  * (cumulative share 1.0) is class B, but the reference's own classifier
  * (`financial_metrics.py:31-36`: `<= 0.8 → A, <= 0.95 → B, else C`) maps
  * 1.0 to C — the committed test contradicts the committed code and cannot
  * have passed. We pin the CODE's semantics (A, A, C), and keep the test's
  * load-bearing assertion: cumulative share EXACTLY 0.80 is class A
  * (inclusive boundary).
  */
class FinancialSpec extends SparkSpec {
  import spark.implicits._

  private lazy val abcDir = fixtureDir(
    "lineitem" -> Seq(
      // product 1: revenue 1000 (two 500-rows, mirroring the reference's
      // two sales lines), product 2: 1000, product 3: 500.
      Li(part = 1, supp = 1, qty = 5, price = 500.0, flag = "A", ts("2001-06-01 00:00:00")),
      Li(part = 1, supp = 1, qty = 5, price = 500.0, flag = "A", ts("2001-06-02 00:00:00")),
      Li(part = 2, supp = 1, qty = 2, price = 1000.0, flag = "A", ts("2001-06-03 00:00:00")),
      Li(part = 3, supp = 1, qty = 10, price = 500.0, flag = "A", ts("2001-06-04 00:00:00"))
    ).toDF())

  test("ABC classes: 1000/1000/500 → A, A, C with the 0.80 boundary inclusive") {
    val rows = Financial.abcAnalysis(spark, abcDir)
      .select("part_id", "revenue_percent", "abc_class")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2))))
      .toMap
    assert(rows(1)._2 == "A")
    // Cumulative share is EXACTLY 0.80 here — inclusive boundary ⇒ A, the
    // rule the reference pins in its own test.
    assert(rows(2)._1 == 0.80)
    assert(rows(2)._2 == "A")
    // Share 1.0 > 0.95 ⇒ C per the reference classifier (see class doc).
    assert(rows(3)._1 == 1.0)
    assert(rows(3)._2 == "C")
  }

  test("ABC cumulative shares are monotone and end at 1.0") {
    val shares = Financial.abcAnalysis(spark, abcDir)
      .orderBy($"revenue_cumsum")
      .select("revenue_percent").collect().map(_.getDouble(0))
    assert(shares.sameElements(shares.sorted))
    assert(shares.last == 1.0)
  }

  test("weightedAvgCost guards the zero-quantity denominator with 0") {
    val dir = fixtureDir(
      "lineitem" -> Seq(
        Li(part = 1, supp = 1, qty = 4, price = 100.0, flag = "N", ts("2001-06-01 00:00:00")),
        Li(part = 1, supp = 1, qty = 6, price = 200.0, flag = "N", ts("2001-06-02 00:00:00")),
        // product 2's quantities sum to zero → guarded 0, not NaN/∞.
        Li(part = 2, supp = 1, qty = 5, price = 50.0, flag = "N", ts("2001-06-03 00:00:00")),
        Li(part = 2, supp = 1, qty = -5, price = 50.0, flag = "N", ts("2001-06-04 00:00:00"))
      ).toDF())
    val rows = Financial.weightedAvgCost(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1) == 30.0) // (100+200)/(4+6)
    assert(rows(2) == 0.0)
  }

  test("order reconciliation: exact decimal gaps, tolerance match, worst-first") {
    import spark.implicits._
    // Li.apply sets l_orderkey = part*1000 + supp, discount/tax 0 -> the
    // derived revenue is the extendedprice sum. Order 1001 header matches
    // exactly; 2001 overstates by 50; 3001 within the 0.01 tolerance.
    val li = Seq(
      Li(part = 1, supp = 1, qty = 1, price = 60.0, flag = "A", ts("2001-01-01 00:00:00")),
      Li(part = 1, supp = 1, qty = 1, price = 40.0, flag = "A", ts("2001-01-02 00:00:00")),
      Li(part = 2, supp = 1, qty = 1, price = 100.0, flag = "A", ts("2001-01-01 00:00:00")),
      Li(part = 3, supp = 1, qty = 1, price = 100.0, flag = "A", ts("2001-01-01 00:00:00"))
    ).toDF
    val orders = Seq(
      (1001L, 100.0), (2001L, 150.0), (3001L, 100.005),
      (9999L, 42.0) // childless header: reconciliation has no lineitem side
    ).toDF("o_orderkey", "o_totalprice")
    val dir = fixtureDir("lineitem" -> li, "orders" -> orders)
    val r = graft.ops.Financial.orderReconciliation(spark, dir).collect()
    // childless orders are not reconcilable rows (inner join)
    assert(r.map(_.getLong(0)).toSeq == Seq(2001L, 3001L, 1001L)) // |gap| desc
    val byKey = r.map(x => x.getLong(0) -> x).toMap
    assert(byKey(2001L).getAs[Double]("gap") == 50.0)
    assert(!byKey(2001L).getAs[Boolean]("matched"))
    assert(byKey(3001L).getAs[Double]("gap") == 0.005)
    assert(byKey(3001L).getAs[Boolean]("matched"))
    assert(byKey(1001L).getAs[Double]("gap") == 0.0)
    assert(byKey(1001L).getAs[Boolean]("matched"))
    assert(byKey(1001L).getAs[Double]("lineitem_revenue") == 100.0)
  }
}
