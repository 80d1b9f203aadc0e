package graft.ops

import graft.{Dx, Query, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators over `documents`: deterministic stratified
  * sampling (the "training-mix" op — downweight the dominant language,
  * keep the tail) and exact interpolated length quantiles per stratum.
  * Not in the reference; first-class LLM-pipeline surface per the builder
  * brief, with full DuckDB oracles.
  *
  * 100 TB design notes:
  *  - Sampling is a pure PROJECTION + filter: the keep decision is a hash
  *    of the row's own id against a per-stratum threshold — no shuffle, no
  *    state, no count-first pass; the same row is kept or dropped on every
  *    re-run, on any cluster, at any parallelism (re-runnable lineage, the
  *    property `rand()`-based sampling loses).
  *  - Rates are by-stratum literals here; a production run derives them
  *    from q22-style stats and inlines them the same way.
  *  - Quantiles shuffle once keyed by lang, then per-lang sort windows; the
  *    4-row probe table rides a broadcast nested-loop join. At petabyte
  *    stratum sizes swap the exact sort for `percentile_approx` — the
  *    operator contract (lang, p, q) is unchanged.
  */
object Sampling {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Per-language keep rates: the synthetic corpus is ~44% English
    * (q22), so en is downsampled 4× and the tail kept at 3/4. */
  val RATES: Seq[(String, Double)] =
    Seq("en" -> 0.25, "de" -> 0.75, "es" -> 0.75, "fr" -> 0.75, "zh" -> 0.75)

  /** Salt pinning the sample membership independent of any other hash use. */
  val SAMPLE_SALT = "graft-sample:"

  private val HASH_SPACE: Long = 1L << 32 // 8 hex chars

  // ---------------------------------------------------------------- q65

  /** Deterministic stratified sample: keep a document iff the first 8 hex
    * chars of md5(salt ‖ doc_id), read as an integer, fall under
    * floor(rate(lang) · 2³²). Membership is a pure function of
    * (doc_id, lang) — stable under re-runs, incremental loads, and
    * cluster re-partitioning. Unknown strata default to rate 0 (dropped):
    * an unconfigured language never silently floods the mix. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val key = conv(
      substring(md5(concat(lit(SAMPLE_SALT), $"doc_id".cast("string"))), 1, 8),
      16, 10).cast("long")
    val threshold: Column = RATES.foldLeft(lit(0L)) { case (acc, (l, r)) =>
      when($"lang" === l, lit((r * HASH_SPACE).toLong)).otherwise(acc)
    }
    docs(spark, dir)
      .withColumn("sample_key", key)
      .filter($"sample_key" < threshold)
      .select($"doc_id", $"lang", $"source", $"n_chars", $"sample_key")
      .orderBy($"doc_id")
  }

  private val stratifiedOracle = {
    val hex = Dx.sqlHex2Long(
      s"md5('$SAMPLE_SALT' || CAST(doc_id AS VARCHAR))", 8)
    val cases = RATES.map { case (l, r) =>
      s"WHEN lang = '$l' THEN ${(r * HASH_SPACE).toLong}"
    }.mkString(" ")
    s"""SELECT doc_id, lang, source, n_chars, $hex AS sample_key
       |FROM documents
       |WHERE $hex < CASE $cases ELSE 0 END
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q69

  /** Probe points for the length-distribution profile. */
  val QUANTILES: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)

  /** Exact linearly-interpolated quantiles (type-7, the pandas/NumPy
    * default: h = (n−1)p, q = a + (b−a)·(h−⌊h⌋)) of `n_chars` per lang.
    * Implemented as explicit rank arithmetic on BOTH sides rather than
    * `percentile`/`quantile_cont` builtins, so the interpolation formula —
    * and therefore every double bit — is pinned by construction instead of
    * by hoping two engines' builtins agree. */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byVal = Window.partitionBy($"lang").orderBy($"n_chars")
    val all = Window.partitionBy($"lang")
    val v = docs(spark, dir)
      .select($"lang", $"n_chars")
      .withColumn("rn", row_number().over(byVal))
      .withColumn("n", count(lit(1)).over(all))
    val ps = QUANTILES.toDF("p")
    v.crossJoin(ps)
      .withColumn("h", ($"n" - 1) * $"p")
      .withColumn("lo", floor($"h").cast("long"))
      .withColumn("hi", ceil($"h").cast("long"))
      .filter($"rn" === $"lo" + 1 || $"rn" === $"hi" + 1)
      .groupBy($"lang", $"p")
      .agg((min(when($"rn" === $"lo" + 1, $"n_chars")).cast("double") +
        (max(when($"rn" === $"hi" + 1, $"n_chars")) -
          min(when($"rn" === $"lo" + 1, $"n_chars"))) *
          (max($"h") - max($"lo"))).as("q"))
      .orderBy($"lang", $"p")
  }

  private val quantilesOracle = {
    val plist = QUANTILES.map(p => s"CAST($p AS DOUBLE)").mkString(", ")
    s"""WITH v AS (
       |  SELECT lang, n_chars,
       |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
       |         COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM documents
       |), p AS (SELECT unnest([$plist]) AS p),
       |pos AS (
       |  SELECT v.lang, p.p, v.n_chars, v.rn,
       |         CAST(floor((v.n - 1) * p.p) AS BIGINT) AS lo,
       |         CAST(ceil((v.n - 1) * p.p) AS BIGINT) AS hi,
       |         (v.n - 1) * p.p AS h
       |  FROM v, p
       |  WHERE v.rn = CAST(floor((v.n - 1) * p.p) AS BIGINT) + 1
       |     OR v.rn = CAST(ceil((v.n - 1) * p.p) AS BIGINT) + 1
       |)
       |SELECT lang, p,
       |  CAST(MIN(CASE WHEN rn = lo + 1 THEN n_chars END) AS DOUBLE)
       |    + (MAX(CASE WHEN rn = hi + 1 THEN n_chars END)
       |       - MIN(CASE WHEN rn = lo + 1 THEN n_chars END))
       |      * (MAX(h) - MAX(lo)) AS q
       |FROM pos GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val all: Seq[Query] = Seq(
    Query("q65_stratified_sample",
      "deterministic md5-threshold stratified sample per language stratum",
      stratifiedSample, Some(stratifiedOracle), headline = false),
    Query("q69_length_quantiles",
      "exact type-7 interpolated n_chars quantiles per language (pinned rank arithmetic)",
      lengthQuantiles, Some(quantilesOracle), headline = false))
}
