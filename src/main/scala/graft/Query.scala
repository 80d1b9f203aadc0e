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
    headline: Boolean = true)
