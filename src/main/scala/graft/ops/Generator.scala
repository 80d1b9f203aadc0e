package graft.ops

import graft.{Dx, Query}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic data generator (P9) — the Spark-native analog of the
  * reference's Faker pipeline (`wsm/data_generator/generate_data.py:
  * 54-364`: weighted movement types, 80/20 hot products, seasonal dates,
  * 5% DQ noise), built on `spark.range(n)` + pure modular arithmetic so
  * that (a) any scale factor generates in parallel with NO driver-side
  * state or RNG (SURVEY §2.10 P9), and (b) the whole generator is
  * ANSI-SQL-expressible, giving it a full DuckDB oracle over `range(n)` —
  * a generator whose output can't be cross-checked is a generator whose
  * bugs become "data".
  *
  * Mixing uses two chained Lehmer steps mod 2³¹−1 (products stay well
  * under 2⁶³, safe under ANSI overflow checking in both engines).
  * Distribution shapes mirror the reference:
  *  - movement_type weights 45/35/10/5/5 (IN/OUT/TRANSFER/ADJ/RETURN);
  *  - hot products: 20% of ids receive 80% of rows via a skew gate;
  *  - dates: two-year window with a triangular (sum-of-two-uniforms)
  *    seasonality peak;
  *  - DQ noise: 5% of rows get the 9999999 sentinel reference id
  *    (exactly what F1 quarantines).
  */
object Generator {

  val DEFAULT_ROWS = 10000L
  private val P = 2147483647L // 2^31 − 1

  /** Column-expression pipeline shared by the Spark and SQL twins. The
    * `i` placeholder is the row index column name. */
  private object Mix {
    def x(i: String) = s"(($i * 48271 + 11) % $P)"
    def y(i: String) = s"((${x(i)} * 16807 + 7) % $P)"
    def z(i: String) = s"((${y(i)} * 69621 + 3) % $P)"
    // A fourth chained step: attributes drawn from w must not share modular
    // structure with y-based draws (y%100 and y%1000 agree mod 100 —
    // deriving two "independent" attributes from y couples them; the extra
    // Lehmer multiply scrambles residue classes the way a fresh PRNG draw
    // would in the reference).
    def w(i: String) = s"((${z(i)} * 48271 + 11) % $P)"
  }

  /** Deterministic synthetic stock movements. */
  def movements(spark: SparkSession, n: Long = DEFAULT_ROWS): DataFrame = {
    val x = Mix.x("id"); val y = Mix.y("id"); val z = Mix.z("id")
    spark.range(n).select(
      col("id").as("movement_id"),
      // 80/20 skew: rows gated into the hot 20% of the id space 80% of
      // the time (generate_data.py:114-117 hot-product analog).
      expr(s"""CASE WHEN $x % 10 < 8 THEN $y % 1000
              |     ELSE 1000 + ($y % 4000) END""".stripMargin)
        .as("product_id"),
      expr(s"$z % 10").as("warehouse_id"),
      expr(s"""CASE WHEN $y % 100 < 45 THEN 'IN'
              |     WHEN $y % 100 < 80 THEN 'OUT'
              |     WHEN $y % 100 < 90 THEN 'TRANSFER'
              |     WHEN $y % 100 < 95 THEN 'ADJUSTMENT'
              |     ELSE 'RETURN' END""".stripMargin).as("movement_type"),
      // OUT flows are negative (C11 sign convention of the ledger).
      expr(s"""CASE WHEN $y % 100 >= 45 AND $y % 100 < 80
              |     THEN -(($x % 50) + 1) ELSE ($x % 50) + 1 END""".stripMargin)
        .as("quantity"),
      // Triangular seasonality: sum of two uniforms over a 2-year span.
      expr(s"DATE '2022-01-01' + CAST((($x % 365) + ($z % 366)) AS INT)")
        .as("movement_date"),
      // 5% DQ-noise sentinel (the invalid_reference F1 rule's target).
      expr(s"""CASE WHEN $z % 20 = 0 THEN 9999999
              |     ELSE $x % 100000 END""".stripMargin).as("reference_id"))
  }

  // ------------------------------------------------------- master data
  // The reference generates 4 master tables + 2 order families + the
  // movements fact (`generate_data.py:54-364`). Masters are pure
  // projections over `range(n)`; the same Lehmer mixes drive every
  // attribute so any scale factor reproduces bit-identically.

  val DEFAULT_PRODUCTS = 5000L
  val DEFAULT_WAREHOUSES = 10L
  val DEFAULT_ORDERS = 2000L
  val DEFAULT_TRANSFERS = 1000L
  val DEFAULT_CATEGORIES = 50L
  val DEFAULT_SUPPLIERS = 200L

  /** Categories master (`generate_data.py:58-67`: id, faker name,
    * description) — deterministic string analogs; ids 0..n−1 match the
    * `category_id` domain [[products]] draws from, so the FK is closed
    * by construction (GeneratorSpec pins it). */
  def categories(spark: SparkSession, n: Long = DEFAULT_CATEGORIES): DataFrame = {
    val x = Mix.x("id")
    spark.range(n).select(
      col("id").as("category_id"),
      expr("concat('Category-', lpad(CAST(id AS STRING), 3, '0'))").as("name"),
      expr(s"concat('category description ', CAST($x % 1000 AS STRING))")
        .as("description"))
  }

  /** Suppliers master (`generate_data.py:69-81`: id, company, contact,
    * email, phone, address) — same deterministic construction; ids match
    * the `supplier_id` domain of [[products]] and [[orders]]. */
  def suppliers(spark: SparkSession, n: Long = DEFAULT_SUPPLIERS): DataFrame = {
    val x = Mix.x("id"); val y = Mix.y("id"); val z = Mix.z("id")
    spark.range(n).select(
      col("id").as("supplier_id"),
      expr("concat('Supplier-', lpad(CAST(id AS STRING), 4, '0'))").as("name"),
      expr(s"concat('Contact ', CAST($x % 500 AS STRING))").as("contact_person"),
      expr("concat('supplier', CAST(id AS STRING), '@example.com')").as("email"),
      expr(s"concat('+62-', lpad(CAST($z % 10000000 AS STRING), 7, '0'))")
        .as("phone"),
      expr(s"concat('Street ', CAST($x % 100 AS STRING), ', City-', " +
        s"CAST($y % 50 AS STRING))").as("address"))
  }

  /** Products master (`generate_data.py:84-109`): SKU, category (50),
    * supplier (200), 2-dp unit cost. */
  def products(spark: SparkSession, n: Long = DEFAULT_PRODUCTS): DataFrame = {
    val x = Mix.x("id"); val y = Mix.y("id"); val z = Mix.z("id")
    spark.range(n).select(
      col("id").as("product_id"),
      expr(s"concat('SKU-', lpad(CAST(id AS STRING), 8, '0'))").as("sku"),
      expr(s"$x % 50").as("category_id"),
      expr(s"$y % 200").as("supplier_id"),
      // 2-dp price in [1.00, 500.99] — decimal-safe for Dx sums.
      expr(s"CAST(($z % 50000) + 100 AS DOUBLE) / 100.0").as("unit_cost"))
  }

  /** Warehouses master (`generate_data.py:111-125`). */
  def warehouses(spark: SparkSession, n: Long = DEFAULT_WAREHOUSES): DataFrame = {
    val x = Mix.x("id")
    spark.range(n).select(
      col("id").as("warehouse_id"),
      expr(s"concat('WH-', CAST(id AS STRING))").as("name"),
      expr(s"concat('LOC-', lpad(CAST($x % 100 AS STRING), 2, '0'))")
        .as("location_code"))
  }

  // ----------------------------------------------------- orders + details

  /** Discretized Poisson(3) detail count clipped to [1, 8] — the
    * reference draws `np.random.poisson(3)` details per order
    * (`generate_data.py:154,192`); here the CDF is a when-ladder over a
    * uniform Lehmer draw (thresholds = cumulative pmf ×1000), identical
    * in both engines. */
  private def poissonLadder(u: String): String =
    s"""CASE WHEN $u < 199 THEN 1
       |     WHEN $u < 423 THEN 2
       |     WHEN $u < 647 THEN 3
       |     WHEN $u < 815 THEN 4
       |     WHEN $u < 916 THEN 5
       |     WHEN $u < 966 THEN 6
       |     WHEN $u < 988 THEN 7
       |     ELSE 8 END""".stripMargin

  /** Order headers (`generate_data.py:127-160`): supplier, warehouse,
    * seasonal order date, weighted status, Poisson-analog detail count. */
  def orders(spark: SparkSession, n: Long = DEFAULT_ORDERS): DataFrame = {
    val x = Mix.x("id"); val y = Mix.y("id"); val z = Mix.z("id")
    val w = Mix.w("id")
    spark.range(n).select(
      col("id").as("po_id"),
      expr(s"$x % 200").as("supplier_id"),
      expr(s"$z % 10").as("warehouse_id"),
      expr(s"DATE '2022-01-01' + CAST((($x % 365) + ($z % 366)) AS INT)")
        .as("order_date"),
      // status weights mirror the reference enum distribution
      // (PENDING/PROCESSING/SHIPPED/COMPLETED/CANCELLED).
      expr(s"""CASE WHEN $y % 100 < 15 THEN 'PENDING'
              |     WHEN $y % 100 < 30 THEN 'PROCESSING'
              |     WHEN $y % 100 < 55 THEN 'SHIPPED'
              |     WHEN $y % 100 < 90 THEN 'COMPLETED'
              |     ELSE 'CANCELLED' END""".stripMargin).as("status"),
      // n_details from the w-chain, NOT y: y%100 (status) and y%1000 agree
      // mod 100, which would forbid e.g. a PENDING order from ever having
      // 8 lines — the reference draws status and poisson(3) independently.
      expr(poissonLadder(s"($w % 1000)")).as("n_details"))
  }

  /** Detail lines: each order explodes into `n_details` rows; per-line
    * attributes mix (po_id, line_no) so lines are independent draws. The
    * UNIQUE(po_id, product_id) reference constraint maps to distinct
    * product offsets per line. Quantity > 0 (the order-details CHECK). */
  def orderDetails(spark: SparkSession, n: Long = DEFAULT_ORDERS): DataFrame = {
    val d = orders(spark, n)
      .select(col("po_id"), col("warehouse_id"),
        explode(expr("sequence(1, n_details)")).as("line_no"))
    val k = s"(po_id * 8 + line_no)"
    val lx = Mix.x(k); val ly = Mix.y(k)
    d.select(
      col("po_id"), col("line_no"), col("warehouse_id"),
      // line_no offset keeps (po_id, product_id) unique within an order
      expr(s"($lx % 625) * 8 + line_no - 1").as("product_id"),
      expr(s"($ly % 50) + 1").as("quantity"),
      expr(s"CAST(($lx % 50000) + 100 AS DOUBLE) / 100.0").as("unit_price"))
  }

  // -------------------------------------------------------- transfers

  /** Paired TRANSFER legs (`generate_data.py:279-313`): each transfer id
    * explodes into exactly two ledger rows — OUT (−q at the source) and
    * IN (+q at the destination, destination ≠ source by construction) —
    * so legs sum to ZERO per reference id (the P2 invariant the
    * reference's own tests eyeball and IngestSpec pins). */
  def transfers(spark: SparkSession, n: Long = DEFAULT_TRANSFERS): DataFrame = {
    val x = Mix.x("id"); val y = Mix.y("id"); val z = Mix.z("id")
    spark.range(n)
      .select(
        col("id").as("reference_id"),
        expr(s"$y % 5000").as("product_id"),
        expr(s"$z % 10").as("from_warehouse_id"),
        // destination = source + 1..9 (mod 10): never equal to source
        expr(s"($z % 10 + ($x % 9) + 1) % 10").as("to_warehouse_id"),
        expr(s"($x % 50) + 1").as("quantity"),
        expr(s"DATE '2022-01-01' + CAST((($x % 365) + ($z % 366)) AS INT)")
          .as("movement_date"))
      .select(
        col("reference_id"), col("product_id"), col("movement_date"),
        explode(array(
          struct(col("from_warehouse_id").as("warehouse_id"),
            (-col("quantity")).as("quantity"),
            lit("OUT").as("leg")),
          struct(col("to_warehouse_id").as("warehouse_id"),
            col("quantity").as("quantity"),
            lit("IN").as("leg")))).as("l"))
      .select(
        col("reference_id"), col("product_id"),
        col("l.warehouse_id").as("warehouse_id"),
        lit("TRANSFER").as("movement_type"),
        col("l.quantity").as("quantity"),
        col("l.leg").as("leg"),
        col("movement_date"))
  }

  /** q44: order-family generator check — per-status counts, detail-line
    * totals and exact decimal order value (proves headers, the Poisson
    * ladder, the detail explosion and per-line draws all reproduce). */
  def orderSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hdr = orders(spark)
    orderDetails(spark)
      .join(hdr.select($"po_id", $"status"), Seq("po_id"))
      .groupBy($"status")
      .agg(
        countDistinct($"po_id").as("n_orders"),
        count(lit(1)).cast("long").as("n_lines"),
        (count(lit(1)).cast("double") / countDistinct($"po_id"))
          .as("avg_lines_per_order"),
        sum($"quantity").cast("long").as("total_quantity"),
        Dx.dsum2($"quantity" * $"unit_price").as("total_value"))
      .orderBy($"status")
  }

  private val orderSummaryOracle = {
    val y = Mix.y("i"); val w = Mix.w("i")
    val k = "(po_id * 8 + line_no)"
    val lx = Mix.x(k); val ly = Mix.y(k)
    s"""WITH hdr AS (
       |  SELECT i AS po_id,
       |         CASE WHEN $y % 100 < 15 THEN 'PENDING'
       |              WHEN $y % 100 < 30 THEN 'PROCESSING'
       |              WHEN $y % 100 < 55 THEN 'SHIPPED'
       |              WHEN $y % 100 < 90 THEN 'COMPLETED'
       |              ELSE 'CANCELLED' END AS status,
       |         ${poissonLadder(s"($w % 1000)")} AS n_details
       |  FROM range($DEFAULT_ORDERS) r(i)
       |), det AS (
       |  SELECT po_id, status, unnest(range(1, n_details + 1)) AS line_no
       |  FROM hdr
       |), lines AS (
       |  SELECT po_id, status,
       |         ($ly % 50) + 1 AS quantity,
       |         CAST(($lx % 50000) + 100 AS DOUBLE) / 100.0 AS unit_price
       |  FROM det
       |)
       |SELECT status,
       |       CAST(COUNT(DISTINCT po_id) AS BIGINT) AS n_orders,
       |       CAST(COUNT(*) AS BIGINT) AS n_lines,
       |       CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT po_id) AS avg_lines_per_order,
       |       CAST(SUM(quantity) AS BIGINT) AS total_quantity,
       |       ${Dx.sqlDsum2("quantity * unit_price")} AS total_value
       |FROM lines GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q45: transfer-leg generator check — per-warehouse leg flows plus the
    * zero-sum invariant surfaced as data: net quantity per reference id
    * aggregates to exactly zero, OUT and IN leg counts match. */
  def transferSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    transfers(spark)
      .groupBy($"warehouse_id")
      .agg(
        count(when($"leg" === "OUT", lit(1))).cast("long").as("n_out_legs"),
        count(when($"leg" === "IN", lit(1))).cast("long").as("n_in_legs"),
        sum($"quantity").cast("long").as("net_quantity"),
        countDistinct($"reference_id").as("n_transfers"))
      .orderBy($"warehouse_id")
  }

  private val transferSummaryOracle = {
    val x = Mix.x("i"); val y = Mix.y("i"); val z = Mix.z("i")
    s"""WITH t AS (
       |  SELECT i AS reference_id,
       |         $y % 5000 AS product_id,
       |         $z % 10 AS from_warehouse_id,
       |         ($z % 10 + ($x % 9) + 1) % 10 AS to_warehouse_id,
       |         ($x % 50) + 1 AS quantity
       |  FROM range($DEFAULT_TRANSFERS) r(i)
       |), legs AS (
       |  SELECT reference_id, from_warehouse_id AS warehouse_id,
       |         -quantity AS quantity, 'OUT' AS leg FROM t
       |  UNION ALL
       |  SELECT reference_id, to_warehouse_id, quantity, 'IN' FROM t
       |)
       |SELECT warehouse_id,
       |       CAST(COUNT(CASE WHEN leg = 'OUT' THEN 1 END) AS BIGINT) AS n_out_legs,
       |       CAST(COUNT(CASE WHEN leg = 'IN' THEN 1 END) AS BIGINT) AS n_in_legs,
       |       CAST(SUM(quantity) AS BIGINT) AS net_quantity,
       |       CAST(COUNT(DISTINCT reference_id) AS BIGINT) AS n_transfers
       |FROM legs GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q40: end-to-end generator check — distribution summary by movement
    * type (counts, net quantity, date bounds, DQ-noise rows). */
  def summary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    movements(spark)
      .groupBy($"movement_type")
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum($"quantity").cast("long").as("net_quantity"),
        // surfaced as timestamps: Spark DATE parquet ↔ DuckDB DATE reach
        // pandas as different dtypes (date object vs Timestamp); midnight
        // timestamps compare cleanly.
        min($"movement_date").cast("timestamp").as("first_date"),
        max($"movement_date").cast("timestamp").as("last_date"),
        count(when($"reference_id" === 9999999, lit(1))).cast("long")
          .as("dq_noise_rows"))
      .orderBy($"movement_type")
  }

  private val summaryOracle = {
    val x = Mix.x("i"); val y = Mix.y("i"); val z = Mix.z("i")
    s"""WITH g AS (
       |  SELECT i,
       |         CASE WHEN $y % 100 < 45 THEN 'IN'
       |              WHEN $y % 100 < 80 THEN 'OUT'
       |              WHEN $y % 100 < 90 THEN 'TRANSFER'
       |              WHEN $y % 100 < 95 THEN 'ADJUSTMENT'
       |              ELSE 'RETURN' END AS movement_type,
       |         CASE WHEN $y % 100 >= 45 AND $y % 100 < 80
       |              THEN -(($x % 50) + 1) ELSE ($x % 50) + 1 END AS quantity,
       |         DATE '2022-01-01' + CAST((($x % 365) + ($z % 366)) AS INT) AS movement_date,
       |         CASE WHEN $z % 20 = 0 THEN 9999999
       |              ELSE $x % 100000 END AS reference_id
       |  FROM range($DEFAULT_ROWS) r(i)
       |)
       |SELECT movement_type,
       |       CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       CAST(SUM(quantity) AS BIGINT) AS net_quantity,
       |       CAST(MIN(movement_date) AS TIMESTAMP) AS first_date,
       |       CAST(MAX(movement_date) AS TIMESTAMP) AS last_date,
       |       CAST(COUNT(CASE WHEN reference_id = 9999999 THEN 1 END) AS BIGINT) AS dq_noise_rows
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val all: Seq[Query] = Seq(
    Query("q40_generator_summary",
      "deterministic arithmetic data generator, distribution summary (P9)",
      (s, _) => summary(s, ""), Some(summaryOracle), headline = false),
    Query("q44_generator_orders",
      "order headers + Poisson-ladder detail explosion, per-status value summary (P9)",
      orderSummary, Some(orderSummaryOracle), headline = false),
    Query("q45_generator_transfers",
      "paired TRANSFER legs, per-warehouse flows + zero-sum invariant (P9/P2)",
      transferSummary, Some(transferSummaryOracle), headline = false))
}
