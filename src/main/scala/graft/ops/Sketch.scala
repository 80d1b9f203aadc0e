package graft.ops

import graft.{Dx, Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cardinality sketching over `documents` — the distinct-count estimator
  * a 100 TB pipeline runs where exact `COUNT(DISTINCT)` stops being
  * affordable (q112's documented `approx_count_distinct` swap-in), made
  * FIRST-CLASS and cross-engine-exact: a HyperLogLog (Flajolet et al.
  * 2007, public) built from md5-derived registers so the DuckDB oracle
  * replays the SKETCH ITSELF bit-for-bit — the q124/q103 harness
  * discipline (the judge of the approximation is not itself approximate)
  * applied to cardinality.
  *
  * Why not `approx_count_distinct`? Its HLL++ registers live inside an
  * opaque Spark aggregation buffer DuckDB cannot replay, so a query
  * using it gets the driver's weaker rows-only check. This sketch keeps
  * the identical algebra (register max-merge, harmonic estimate) in
  * plain integer SQL both engines evaluate exactly:
  *
  *  - register index = first 32 md5 bits mod [[M]]; rank = leading-zero
  *    count of the NEXT 32 bits + 1, via `33 − length(bin(tail))` —
  *    `bin()` exists in both engines and its length IS the MSB position,
  *    so no log() and no bit loop.
  *  - the harmonic denominator Σ 2^−maxrank is scaled by 2³³: every term
  *    becomes the exact BIGINT `1 << (33 − maxrank)` and the sum is
  *    order-independent integer arithmetic (a float Σ 2^−r would round
  *    on alignment). Empty registers contribute 2³³ (rank 0).
  *  - the estimate α·m²·2³³ / z_scaled folds its whole numerator into
  *    ONE Scala-computed double literal ([[EST_NUM]], shortest-repr
  *    round-trip in both parsers), leaving a single exactly-rounded
  *    division at runtime.
  *
  * The output reports, per source and for the register-wise MERGE of all
  * sources ("ALL"), the sketch (n_regs, z_scaled), the estimate, the
  * exact distinct count, and the absolute error — the measured-accuracy
  * harness for the sketch family.
  *
  * 100 TB shape: ONE corpus scan to doc grain; the register table is
  * (sources+1)·[[M]] rows — dimension-sized; `groupBy(source, reg).max`
  * is map-side-combining, so each executor ships at most m rows per
  * source regardless of corpus size (this partial-merge property IS the
  * reason HLL is the standard distributed cardinality sketch — the
  * sketch is the mergeable artifact, and the "ALL" row is that merge
  * performed in SQL). Exact distinct costs one md5-keyed exchange here
  * (it is the harness's ground truth); a production deploy drops it and
  * ships registers alone. m=64 (σ ≈ 1.04/√64 ≈ 13%) keeps the fixture
  * corpus (~476 distinct) above the 2.5·m small-range-correction cutoff,
  * so the raw-regime estimator — the one that matters at scale — is the
  * one under test; deploys raise m (p bits) for accuracy, same algebra.
  */
object Sketch {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Register count m = 2^6 and the paper's bias constant α₆₄ = 0.709. */
  val M = 64
  val ALPHA = 0.709

  /** The folded estimate numerator α·m²·2³³ — computed once here, pasted
    * as the SAME shortest-repr literal into both engines. */
  val EST_NUM: Double = ALPHA * (M.toDouble * M.toDouble) * 8589934592.0

  private val SALT = "hll"

  /** q128: per-source + merged HLL cardinality sketch vs exact distinct. */
  def hllHarness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = md5(concat(lit(SALT), $"text"))
    val base = docs(spark, dir)
      .select($"source", h.as("h"))
      .withColumn("reg",
        pmod(conv(substring($"h", 1, 8), 16, 10).cast("long"), lit(M.toLong)))
      .withColumn("tail", conv(substring($"h", 9, 8), 16, 10).cast("long"))
      .withColumn("r",
        when($"tail" === 0L, lit(33L))
          .otherwise(lit(33L) - length(bin($"tail")).cast("long")))
      .select($"source", $"h", $"reg", $"r")
      .persist()
    val regs = base.groupBy($"source", $"reg")
      .agg(max($"r").as("maxr"))
    val merged = regs.groupBy($"reg")
      .agg(max($"maxr").as("maxr"))
      .select(lit("ALL").as("source"), $"reg", $"maxr")
    val exacts = base.groupBy($"source")
      .agg(countDistinct($"h").as("n_exact"))
      .union(base.agg(countDistinct($"h").as("n_exact"))
        .select(lit("ALL").as("source"), $"n_exact"))
    val sk = regs.union(merged)
      .groupBy($"source")
      .agg(count(lit(1)).cast("long").as("n_regs"),
        sum(expr("shiftleft(1L, cast(33 - maxr as int))")).as("z_present"))
      .withColumn("z_scaled",
        $"z_present" + (lit(M.toLong) - $"n_regs") * lit(8589934592L))
      .withColumn("est", lit(EST_NUM) / $"z_scaled".cast("double"))
    sk.join(exacts, "source")
      .withColumn("abs_err", abs($"est" - $"n_exact".cast("double")))
      .select($"source", $"n_exact", $"n_regs", $"z_scaled", $"est", $"abs_err")
      .orderBy($"source")
  }

  private val hllOracle = {
    val reg1 = Dx.sqlHex2Long("h", 8)
    val tail = Dx.sqlHex2Long("h2", 8)
    s"""WITH base AS (
       |  SELECT source, md5('$SALT' || text) AS h,
       |         substr(md5('$SALT' || text), 9, 8) AS h2
       |  FROM documents
       |), keyed AS (
       |  SELECT source, h,
       |         CAST($reg1 % $M AS BIGINT) AS reg,
       |         CAST(CASE WHEN $tail = 0 THEN 33
       |                   ELSE 33 - length(bin($tail)) END AS BIGINT) AS r
       |  FROM base
       |), regs AS (
       |  SELECT source, reg, MAX(r) AS maxr FROM keyed GROUP BY 1, 2
       |), allregs AS (
       |  SELECT * FROM regs
       |  UNION ALL
       |  SELECT 'ALL' AS source, reg, MAX(maxr) AS maxr FROM regs GROUP BY reg
       |), exacts AS (
       |  SELECT source, CAST(COUNT(DISTINCT h) AS BIGINT) AS n_exact
       |  FROM base GROUP BY 1
       |  UNION ALL
       |  SELECT 'ALL', CAST(COUNT(DISTINCT h) AS BIGINT) FROM base
       |), sk AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_regs,
       |         CAST(SUM(CAST(1 AS BIGINT)
       |                  << CAST(33 - maxr AS INTEGER)) AS BIGINT) AS z_present
       |  FROM allregs GROUP BY 1
       |)
       |SELECT sk.source, n_exact, n_regs,
       |       z_present + ($M - n_regs) * 8589934592 AS z_scaled,
       |       $EST_NUM / CAST(z_present + ($M - n_regs) * 8589934592 AS DOUBLE)
       |         AS est,
       |       abs($EST_NUM / CAST(z_present + ($M - n_regs) * 8589934592
       |                           AS DOUBLE)
       |           - CAST(n_exact AS DOUBLE)) AS abs_err
       |FROM sk JOIN exacts ON sk.source = exacts.source
       |ORDER BY 1""".stripMargin
  }

  // ----------------------------------------------------------------

  val all: Seq[Query] = Seq(
    Query("q128_hll_cardinality",
      "cross-engine-exact HyperLogLog: per-source + register-merged distinct-text estimates vs exact, integer-scaled harmonic sum",
      hllHarness, Some(hllOracle), headline = false))
}
