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
      (s, _) => summary(s, ""), Some(summaryOracle), headline = false))
}
