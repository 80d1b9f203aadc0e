package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet sources for the driver testdata (TESTDATA.md): TPC-H-ish star
  * schema + `events` stream table + `documents`/`embeddings` for the
  * LLM-pipeline operators.
  *
  * These play the roles of the reference warehouse tables (survey: SURVEY.md
  * §7.1, mapping in FIXTURES.md §3): `lineitem` ≈ sales_order_details +
  * stock_movements fact, `part` ≈ products, `supplier`/`nation` ≈
  * warehouse geography, `events` ≈ the stock_movements ledger.
  *
  * Scale notes (100 TB design): all readers are plain columnar parquet scans
  * — Catalyst pushes filters (`PushedFilters`) and prunes columns
  * (`ReadSchema`) into the scan, so every downstream operator should express
  * predicates/projections declaratively and NEVER cache or collect a base
  * table. At cluster scale the same code runs over partitioned object-store
  * layouts; nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (dir.startsWith("jdbc:")) {
      // S1 JDBC pass-through (`wsm/etl_pipeline/extract/data_extractor
      // .py:27-36`: seven `SELECT *` over a warehouse connection): `dir`
      // is the connection URL and `name` the table — so EVERY registered
      // operator runs unchanged against a JDBC warehouse by passing the
      // URL where the parquet dir usually goes. Catalyst pushes filters
      // into the remote query (`PushedFilters` on the scan) and prunes
      // columns into the SELECT list, same as the parquet path. For a
      // parallel extract at scale use [[jdbcPartitioned]] — a plain JDBC
      // read is a single connection/partition by design.
      spark.read.format("jdbc")
        .option("url", dir).option("dbtable", name).load()
    } else {
      // The testdata has shipped timestamp columns with three physical
      // encodings across driver regenerations — TIMESTAMP(NANOS) (read as
      // raw Long via the legacy conf), timestamp[us] without tz (read as
      // TIMESTAMP_NTZ), and timestamp[us] UTC-adjusted (read as
      // TIMESTAMP). Normalize ALL of them to TimestampType (epoch micros)
      // HERE, by dataType, so downstream operators see one type:
      //  - TIMESTAMP_NTZ (any table): cast to TIMESTAMP. Sessions run
      //    with spark.sql.session.timeZone=UTC, so the wall-clock is
      //    taken as UTC — the same interpretation DuckDB applies to a
      //    naive timestamp[us] column. Bit-identical epoch micros.
      //  - events.ts as LongType (nanos): floor-divide to micros —
      //    exactly DuckDB's native nanos→micros truncation.
      //  - TIMESTAMP: already the normal form; pass through.
      // An engine claiming 100 TB robustness reads whatever encoding the
      // upstream writer (pandas/arrow version of the day) produced.
      // Casts are per-column projections fused into the scan — no extra
      // pass, and pushdown/pruning are unaffected.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val ntzFixed = raw.schema.fields.foldLeft(raw) { (df, f) =>
        if (f.dataType == TimestampNTZType)
          df.withColumn(f.name, col(f.name).cast(TimestampType))
        else df
      }
      if (name == "events") ntzFixed.schema("ts").dataType match {
        case LongType =>
          ntzFixed.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => ntzFixed
        case other => throw new IllegalStateException(
          s"events.ts: unsupported parquet encoding $other — extend " +
            "graft.Tables' ts normalization for this new testdata drift")
      }
      else ntzFixed
    }

  /** Register every warehouse table as a temp view, giving users the full
    * `spark.sql` surface over the same sources the Column-API operators
    * read — `registerViews(spark, dir); spark.sql("SELECT ... FROM
    * lineitem JOIN part ...")`. Views are lazy (no scan happens here) and
    * carry the same pushdown/pruning as the DataFrame path; combined with
    * [[graft.GraftExtensions]] the native expressions are callable from
    * that SQL too. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** Range-partitioned JDBC extract — the scale path for S1: `n` executor
    * tasks each issue a bounded `WHERE partCol BETWEEN …` slice, so a
    * 10⁹-row warehouse table extracts with cluster parallelism instead of
    * one connection. Bounds need not be tight (empty slices are cheap);
    * the usual key is the table's synthetic PK. */
  def jdbcPartitioned(
      spark: SparkSession, url: String, table: String, partCol: String,
      lower: Long, upper: Long, n: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", n)
      .load()
}

/** Determinism helpers shared by every query and its DuckDB oracle.
  *
  * The driver hash-compares Spark output parquet against DuckDB output on
  * the same tables (BASELINE.md "Engine acceptance targets"). Floating-point
  * sums are order-dependent, and Spark's partial aggregation order differs
  * from DuckDB's — so every sum over non-integral doubles goes through an
  * exact decimal: elementwise double arithmetic (bit-identical in both
  * engines) → cast to DECIMAL(30,6) (deterministic round-half-up for
  * positive values in both engines) → exact, order-independent decimal sum
  * → cast back to double (deterministic nearest). Averages divide two such
  * deterministic doubles. This costs one extra cast in the codegen'd
  * aggregate and keeps results reproducible at any parallelism — the same
  * property that makes results stable across 1000-executor re-runs.
  */
object Dx {
  /** Exact, order-independent sum of a double expression → double. */
  def dsum(e: Column): Column = sum(e.cast(DecimalType(30, 6))).cast("double")

  /** Decimal-exact sum kept as decimal (for window cumsums that must add
    * exactly across frames). */
  def decSum(e: Column): Column = sum(e.cast(DecimalType(30, 6)))

  /** Exact sum of a COMPUTED (noisy) double expression. Spark casts
    * double→decimal via the shortest string repr + HALF_UP while DuckDB
    * expands the full binary value, so they disagree on full-precision
    * noise (and their round() built-ins disagree on ties). Instead round to
    * cents with pure IEEE ops — floor(x*100+0.5)/100 — which both engines
    * evaluate bit-identically; the result is k/100 whose decimal(·,6) cast
    * is unambiguous for |x| < 1e8. Use [[dsum]] for raw input columns, this
    * for products/ratios. */
  def dsum2(e: Column): Column =
    sum((floor(e * 100.0 + 0.5) / 100.0).cast(DecimalType(30, 6))).cast("double")

  /** Bit-portable round-to-cents for a computed double (see [[dsum2]]). */
  def round2(e: Column): Column = floor(e * 100.0 + 0.5) / 100.0

  /** SQL twin fragments for DuckDB oracles. */
  def sqlDsum(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"
  def sqlDsum2(e: String): String =
    s"CAST(SUM(CAST((floor(($e)*100.0 + 0.5)/100.0) AS DECIMAL(30,6))) AS DOUBLE)"
  def sqlRound2(e: String): String = s"(floor(($e)*100.0 + 0.5)/100.0)"

  /** Deterministic hash-membership key: the first 8 hex chars of
    * md5(salt ‖ id) as a long in [0, 2³²) — the device behind stratified
    * sampling and the eval-set carve (membership is a pure function of
    * the row, stable under re-runs and re-partitioning). Shared here so
    * every consumer keys the SAME 32-bit prefix; the DuckDB twin is
    * [[sqlHex2Long]] over the same md5 expression. */
  def hashKey(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** DuckDB-side parse of the first `n` hex chars of expression `h` (a hex
    * string, e.g. md5 output) into a BIGINT — DuckDB has no conv(); Spark
    * side uses conv(substring(h,1,n),16,10). Generated as a positional
    * polynomial so both engines agree exactly. */
  def sqlHex2Long(h: String, n: Int): String = {
    val terms = (1 to n).map { i =>
      val mult = BigInt(16).pow(n - i)
      s"(strpos('0123456789abcdef', substr($h,$i,1)) - 1) * $mult"
    }
    "(" + terms.mkString(" + ") + ")"
  }
}
