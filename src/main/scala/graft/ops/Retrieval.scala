package graft.ops

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text relevance retrieval over `documents`: BM25 keyword search —
  * the operator a training-data pipeline runs to pull topical subsets
  * out of a crawl (and the scoring half of every retrieval-augmented
  * eval set). Not in the reference (whose text surface ends at notes
  * columns); first-class per the builder brief's text-analysis family.
  *
  * Scoring is Okapi BM25 (Robertson et al., public) with two
  * determinism changes so the DuckDB oracle hash-matches bit-for-bit:
  *  - idf uses the RAW odds ratio (N − df + ½)/(df + ½) instead of its
  *    log. log() is the one non-exactly-rounded IEEE op in BM25 and the
  *    engines' libm may disagree in the last bit; the ratio is a single
  *    exactly-rounded division and log is monotone, so rankings are
  *    IDENTICAL — the q106 "PMI without the log" device applied to
  *    retrieval. Written as (2N − 2df + 1)/(2df + 1): integer numerator
  *    and denominator, ONE rounding.
  *  - per-term scores round to the 1e-6 grid with pure IEEE ops
  *    (floor(x·1e6 + ½)/1e6, the [[graft.Dx]] dsum2 device) and sum as
  *    DECIMAL(30,6), so the per-document sum is order-independent at
  *    any parallelism.
  *
  * 100 TB shape (the inverted-index probe, without materializing one):
  *  - ONE corpus scan projects to doc grain: (doc_id, dl, query-term
  *    hits). The token filter runs INSIDE the projection (array filter
  *    against the broadcast-literal term set), so nothing downstream —
  *    persist, exchange, or agg — ever carries a non-query token.
  *  - that doc-grain projection persists (digest-sized: two longs and a
  *    ≤|Q|-term array per doc) and feeds both corpus stats (N, avgdl)
  *    and the postings explode — the q108 two-consumer device.
  *  - df is a ≤|Q|-row aggregate of the tf stream, broadcast back; the
  *    corpus-stats scalar broadcasts the same way. No fact-sized join.
  *  - top-k is `orderBy.limit(k)` → TakeOrderedAndProject: per-partition
  *    heaps, k rows to the driver, no global sort.
  */
object Retrieval {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** BM25 free parameters (the standard defaults). 1−b = 0.25 and
    * k1+1 = 2.2 are folded in below; every literal appears in the SQL
    * twin with the same spelling so both engines parse the same double. */
  val K1 = 1.2
  val B = 0.75

  /** The fixed probe query (C2 discipline: a constant, like every
    * fixture parameter — a deployment passes its own). Terms chosen
    * with differing corpus df so the idf factor actually orders. */
  val QUERY_TERMS: Seq[String] = Seq("hash", "join", "stream", "vector")

  /** q123's query batch: (query_id, terms). */
  val QUERY_BATCH: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("hash", "join"),
    2L -> Seq("stream", "vector", "slow"),
    3L -> Seq("customer", "order", "data"))

  val TOP_K = 20
  val BATCH_TOP_K = 5

  private def sqlQuote(ts: Seq[String]): String =
    ts.map(t => s"'$t'").mkString(", ")

  /** Doc-grain base projection: (doc_id, dl, q) with q already filtered
    * to `terms` — the one corpus scan everything else branches from. */
  private def baseOf(spark: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id", split($"text", " ").as("l"))
      .select($"doc_id", size($"l").cast("long").as("dl"),
        expr(s"filter(l, w -> w IN (${sqlQuote(terms)}))").as("q"))
  }

  /** Per-(doc, term) BM25 partial score on the 1e-6 grid. Expression
    * structure (op order and literals) mirrors the SQL twin exactly —
    * every op is exactly-rounded IEEE, so bit-equality holds. */
  private def rscoreCol = {
    val idf = (col("n_docs") * 2 - col("df") * 2 + 1).cast("double") /
      (col("df") * 2 + 1).cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val den = col("tf").cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl))
    val raw = idf * ((col("tf").cast("double") * lit(2.2)) / den)
    floor(raw * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
  }

  /** q122: top-20 documents for [[QUERY_TERMS]] by BM25 (ratio idf). */
  def bm25Search(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = baseOf(spark, dir, QUERY_TERMS).persist()
    val stats = base.agg(
      sum($"dl").cast("long").as("sum_dl"),
      count(lit(1)).cast("long").as("n_docs"))
    val tf = base
      .select($"doc_id", $"dl", explode($"q").as("term"))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).cast("long").as("tf"))
    val dft = tf.groupBy($"term")
      .agg(count(lit(1)).cast("long").as("df"))
    tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("rscore", rscoreCol)
      .groupBy($"doc_id", $"dl")
      .agg(count(lit(1)).cast("long").as("n_hits"),
        sum($"rscore".cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .cast("double").as("score"))
      .select($"doc_id", $"dl", $"n_hits", $"score")
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(TOP_K)
  }

  private def bm25Sql(terms: Seq[String]): String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |         list_filter(string_split(text, ' '),
       |                     w -> w IN (${sqlQuote(terms)})) AS q
       |  FROM documents
       |), stats AS (
       |  SELECT CAST(SUM(dl) AS BIGINT) AS sum_dl,
       |         CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM base
       |), tf AS (
       |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(q) AS term FROM base)
       |  GROUP BY 1, 2, 3
       |), dft AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), scored AS (
       |  SELECT tf.doc_id, tf.dl, tf.term,
       |         floor((CAST(n_docs * 2 - df * 2 + 1 AS DOUBLE)
       |                / CAST(df * 2 + 1 AS DOUBLE))
       |               * ((CAST(tf AS DOUBLE) * 2.2)
       |                  / (CAST(tf AS DOUBLE)
       |                     + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE)
       |                        / (CAST(sum_dl AS DOUBLE)
       |                           / CAST(n_docs AS DOUBLE))))))
       |               * 1000000.0 + 0.5) / 1000000.0 AS rscore
       |  FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN stats
       |)""".stripMargin

  private val bm25Oracle =
    s"""${bm25Sql(QUERY_TERMS)}
       |SELECT doc_id, dl, CAST(COUNT(*) AS BIGINT) AS n_hits,
       |       CAST(SUM(CAST(rscore AS DECIMAL(30,6))) AS DOUBLE) AS score
       |FROM scored GROUP BY 1, 2
       |ORDER BY score DESC, doc_id LIMIT $TOP_K""".stripMargin

  /** q123: the serve-batch variant — score ALL of [[QUERY_BATCH]] in one
    * pass and keep each query's top-5. The token filter runs against the
    * UNION of the batch's terms (still a broadcast literal); per-query
    * assignment is a broadcast join of the ≤Σ|Qᵢ|-row (query_id, term)
    * table onto the tf stream. One corpus scan serves the whole batch —
    * the retrieval analog of q90's batched IVF assignment. */
  def bm25Batch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val allTerms = QUERY_BATCH.flatMap(_._2).distinct.sorted
    val qterms = QUERY_BATCH
      .flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("query_id", "term")
    val base = baseOf(spark, dir, allTerms).persist()
    val stats = base.agg(
      sum($"dl").cast("long").as("sum_dl"),
      count(lit(1)).cast("long").as("n_docs"))
    val tf = base
      .select($"doc_id", $"dl", explode($"q").as("term"))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).cast("long").as("tf"))
    // df is corpus-global per term (query-independent), shared by every
    // query that probes the term
    val dft = tf.groupBy($"term")
      .agg(count(lit(1)).cast("long").as("df"))
    val scored = tf.join(broadcast(dft), "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("rscore", rscoreCol)
      .groupBy($"query_id", $"doc_id", $"dl")
      .agg(count(lit(1)).cast("long").as("n_hits"),
        sum($"rscore".cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .cast("double").as("score"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"score".desc, $"doc_id".asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= BATCH_TOP_K)
      .select($"query_id", $"rnk", $"doc_id", $"dl", $"n_hits", $"score")
      .orderBy($"query_id", $"rnk")
  }

  private val bm25BatchOracle = {
    val allTerms = QUERY_BATCH.flatMap(_._2).distinct.sorted
    val values = QUERY_BATCH
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""${bm25Sql(allTerms)}, qt AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, term
       |  FROM (VALUES $values) AS v(query_id, term)
       |), byq AS (
       |  SELECT qt.query_id, scored.doc_id, scored.dl,
       |         CAST(COUNT(*) AS BIGINT) AS n_hits,
       |         CAST(SUM(CAST(scored.rscore AS DECIMAL(30,6))) AS DOUBLE)
       |           AS score
       |  FROM scored JOIN qt ON scored.term = qt.term
       |  GROUP BY 1, 2, 3
       |)
       |SELECT query_id, CAST(ROW_NUMBER() OVER (
       |         PARTITION BY query_id ORDER BY score DESC, doc_id ASC)
       |         AS BIGINT) AS rnk,
       |       doc_id, dl, n_hits, score
       |FROM byq
       |QUALIFY rnk <= $BATCH_TOP_K
       |ORDER BY query_id, rnk""".stripMargin
  }

  val all: Seq[Query] = Seq(
    Query("q122_bm25_search",
      "BM25 keyword retrieval: top-20 docs for a 4-term query, ratio idf + grid-rounded decimal sums",
      bm25Search, Some(bm25Oracle), headline = false),
    Query("q123_bm25_batch",
      "batched BM25 serve: 3 queries scored in one corpus pass, top-5 each via per-query rank window",
      bm25Batch, Some(bm25BatchOracle), headline = false))
}
