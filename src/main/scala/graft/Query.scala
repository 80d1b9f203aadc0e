package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * DataFrame program plus (when SQL-expressible) an equivalent DuckDB oracle
  * query. Ops whose semantics aren't ANSI-SQL-expressible (e.g. MinHash-LSH
  * banding) carry `oracle = None` and get the driver's weaker rows-only
  * check.
  */
final case class Query(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Included in the per-round benchmark run (the reference-report
      * analogs); heavy auxiliary ops can opt out. */
    headline: Boolean = true,
    /** What the benchmark times, when it differs from [[fn]]: some
      * registered closures append a global `orderBy` purely so the
      * driver's hash compare sees the oracle's ORDER BY (presentational —
      * the driver sorts rows itself). That sort is comparison overhead,
      * not operator cost, so the bench may time the unordered API shape
      * instead. Defaults to [[fn]]. */
    benchFn: Option[(SparkSession, String) => DataFrame] = None,
    /** Excluded from the ROUTINE bench run (still a correctness entry, and
      * still timeable on demand via SPARK_GRAFT_BENCH_ONLY): structural
      * cross-check twins whose cost is by-construction (e.g. q52b's
      * md5-per-position winnowing) tell us nothing run-over-run and would
      * dominate aux totals (round-6 verdict item 7). The bench artifact
      * records the exclusion under "bench_skipped". */
    benchSkip: Boolean = false) {
  def timed: (SparkSession, String) => DataFrame = benchFn.getOrElse(fn)
}
