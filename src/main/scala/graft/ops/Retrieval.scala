package graft.ops

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Shared scoring tail: (doc_id, dl, term, tf) postings + the ≤|Q|-row
    * df table + the 1-row corpus stats → per-doc decimal-summed BM25,
    * top-[[TOP_K]]. Both the scan path (q122) and the index path
    * (q125/q126) end here, which is what makes the index serve
    * oracle-equal to the scan by construction. */
  private def rankTopK(tf: DataFrame, dft: DataFrame,
      stats: DataFrame): DataFrame =
    rankTopKWithDf(tf.join(broadcast(dft), "term"), stats)

  /** The tail below the df attachment: postings already carrying their
    * `df` column → scored, decimal-summed, top-k. */
  private def rankTopKWithDf(post: DataFrame, stats: DataFrame): DataFrame = {
    import post.sparkSession.implicits._
    post
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
    rankTopK(tf, dft, stats)
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
  /** The shared batch-serve core: every query's candidates ranked —
    * (query_id, rnk, doc_id, dl, n_hits, score), unbounded rank. q123
    * cuts it at [[BATCH_TOP_K]]; q161 packs it under a token budget. */
  private def bm25BatchRanked(spark: SparkSession, dir: String): DataFrame = {
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
      .select($"query_id", $"rnk", $"doc_id", $"dl", $"n_hits", $"score")
  }

  def bm25Batch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bm25BatchRanked(spark, dir)
      .filter($"rnk" <= BATCH_TOP_K)
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

  // ---------------------------------------------------------------- q161

  /** Context token budget for [[ragContext]] (dl = whitespace tokens, the
    * q49 proxy; a deployment passes its tokenizer's counts — q160's
    * fertility table says how far the proxy drifts per language). 120
    * packs 3–5 fixture docs, so the cut lands mid-list. */
  val RAG_BUDGET = 120L

  /** q161: retrieval-augmented CONTEXT ASSEMBLY — the serve-side step
    * between retrieval and the model call that every RAG deployment
    * runs: for each query, take the BM25-ranked candidates (q123's
    * batch-serve core) and fill a fixed token budget in rank order,
    * emitting each included document's context position and the exact
    * running token total. Prefix ("fill until full") semantics: a
    * document is included iff the cumulative dl through its rank fits
    * [[RAG_BUDGET]] — the running sum is a per-query window over k-row
    * ranked lists, all integer arithmetic on top of the already-pinned
    * BM25 scores.
    *
    * 100 TB shape: identical to q123 (ONE corpus scan serves the whole
    * batch; candidate lists are k rows per query), plus a k-row window
    * per query — assembly cost is output-sized, never corpus-sized. */
  def ragContext(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wCum = Window.partitionBy($"query_id").orderBy($"rnk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bm25BatchRanked(spark, dir)
      // dl >= 1 (a doc has at least one whitespace token), so the packed
      // prefix is at most RAG_BUDGET rows — bounding the rank BEFORE the
      // cumulative window restores the WindowGroupLimit partial top-K
      // plan (round-13 ADVICE: unbounded, every matching doc shipped to
      // the per-query exchange). Oracle applies the same bound.
      .filter($"rnk" <= RAG_BUDGET)
      .withColumn("cum_tokens", sum($"dl").over(wCum).cast("long"))
      .filter($"cum_tokens" <= RAG_BUDGET)
      .select($"query_id", $"rnk".as("ctx_pos"), $"doc_id", $"dl",
        $"cum_tokens", $"score")
      .orderBy($"query_id", $"ctx_pos")
  }

  private val ragContextOracle = {
    val allTerms = QUERY_BATCH.flatMap(_._2).distinct.sorted
    val values = QUERY_BATCH
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""${bm25Sql(allTerms)}, qt AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, term
       |  FROM (VALUES $values) AS v(query_id, term)
       |), byq AS (
       |  SELECT qt.query_id, scored.doc_id, scored.dl,
       |         CAST(SUM(CAST(scored.rscore AS DECIMAL(30,6))) AS DOUBLE)
       |           AS score
       |  FROM scored JOIN qt ON scored.term = qt.term
       |  GROUP BY 1, 2, 3
       |), ranked AS (
       |  SELECT query_id, CAST(ROW_NUMBER() OVER (
       |           PARTITION BY query_id ORDER BY score DESC, doc_id ASC)
       |           AS BIGINT) AS ctx_pos,
       |         doc_id, dl, score
       |  FROM byq
       |), packed AS (
       |  SELECT query_id, ctx_pos, doc_id, dl, score,
       |         CAST(SUM(dl) OVER (PARTITION BY query_id ORDER BY ctx_pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |              AS BIGINT) AS cum_tokens
       |  FROM ranked WHERE ctx_pos <= $RAG_BUDGET
       |)
       |SELECT query_id, ctx_pos, doc_id, dl, cum_tokens, score
       |FROM packed WHERE cum_tokens <= $RAG_BUDGET
       |ORDER BY query_id, ctx_pos""".stripMargin
  }

  // ---------------------------------------------------------------- q167

  /** DEFAULT context budget for [[ragContextBpe]] in BPE tokens — a
    * PARAMETER of the packer, not a constant of the algorithm (the
    * overload below takes any budget). This default is derived from the
    * fixture: the corpus measures fertility ≈ 3.87 subword tokens per
    * word (q160), so 450 packs the same 2–4 docs per query that q161's
    * 120-word budget does — but in the units the MODEL actually
    * consumes.
    *
    * Per-language budget policy (what the q160 fertility report is
    * FOR): a deploy sets ONE number — the model's context window minus
    * prompt/answer reserve — and passes it here; no per-language
    * adjustment is needed precisely BECAUSE the packing is denominated
    * in BPE tokens (the window's own unit). The per-language knob q160
    * informs is the RANKING side: a corpus whose languages differ in
    * fertility (q160 measures the spread) over-charges high-fertility
    * languages per unit of content, so a mixed-corpus deploy can
    * normalize candidate scores by the language's measured fertility —
    * or simply accept that a BPE budget buys less high-fertility text,
    * which is the true cost to the model. Budgeting in words (q161) and
    * correcting per language would need exactly the q160 table; in BPE
    * units the table is advisory, not load-bearing. */
  val RAG_BUDGET_BPE = 450L

  /** q167: [[ragContext]] budgeted in REAL tokenizer units — the fix
    * q160 argues for (round-13 verdict item 4): q161 packs by whitespace
    * `dl`, and a context budgeted in words overflows a BPE-denominated
    * model window by the language's fertility (measured ≈ 3.87× here,
    * and per-language variance is exactly what q160 reports). This
    * variant joins the ranked candidates to q121's doc-grain BPE counts
    * and fills [[RAG_BUDGET_BPE]] in rank order — same prefix semantics,
    * exact integer running sums, and RetrievalSpec pins that under ONE
    * shared budget number the BPE-denominated packing admits strictly
    * fewer docs than the word-denominated one (fertility > 1).
    *
    * 100 TB shape: q161's plan plus one token-count leg (at deploy the
    * count is an INDEX attribute stored next to dl — q125 already
    * carries dl per posting — so the leg costs nothing at serve; here it
    * is q121's one-scan projection); the rank bound keeps the partial
    * top-K shape (n_tokens_bpe ≥ n_words ≥ 1).
    *
    * The registered entry packs the default [[RAG_BUDGET_BPE]]; the
    * overload takes any budget (a deploy passes its model window minus
    * reserve — see the budget-policy note on [[RAG_BUDGET_BPE]]), and
    * RetrievalSpec pins the parameter's semantics: a smaller budget
    * yields exactly a per-query PREFIX of a larger budget's packing. */
  def ragContextBpe(spark: SparkSession, dir: String): DataFrame =
    ragContextBpe(spark, dir, RAG_BUDGET_BPE)

  def ragContextBpe(spark: SparkSession, dir: String,
      budget: Long): DataFrame =
    ragContextBy(spark, dir, bpe = true, budget)

  /** The budget-parametrized packer behind q167 (and RetrievalSpec's
    * same-budget comparison). `bpe = false` reproduces q161's packing
    * column-for-column plus the `n_tokens` alias. */
  private[graft] def ragContextBy(spark: SparkSession, dir: String,
      bpe: Boolean, budget: Long): DataFrame = {
    import spark.implicits._
    val wCum = Window.partitionBy($"query_id").orderBy($"rnk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = bm25BatchRanked(spark, dir).filter($"rnk" <= budget)
    val withTok =
      if (!bpe) ranked.withColumn("n_tokens", $"dl")
      else ranked.join(
        Terms.bpeDocTokenCounts(spark, dir)
          .withColumnRenamed("n_tokens_bpe", "n_tokens"),
        Seq("doc_id"))
    withTok
      .withColumn("cum_tokens", sum($"n_tokens").over(wCum).cast("long"))
      .filter($"cum_tokens" <= budget)
      .select($"query_id", $"rnk".as("ctx_pos"), $"doc_id", $"dl",
        $"n_tokens", $"cum_tokens", $"score")
      .orderBy($"query_id", $"ctx_pos")
  }

  private val ragContextBpeOracle = {
    val allTerms = QUERY_BATCH.flatMap(_._2).distinct.sorted
    val values = QUERY_BATCH
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""${bm25Sql(allTerms)}, ${Terms.bpeDocCountCtes}, qt AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, term
       |  FROM (VALUES $values) AS v(query_id, term)
       |), byq AS (
       |  SELECT qt.query_id, scored.doc_id, scored.dl,
       |         CAST(SUM(CAST(scored.rscore AS DECIMAL(30,6))) AS DOUBLE)
       |           AS score
       |  FROM scored JOIN qt ON scored.term = qt.term
       |  GROUP BY 1, 2, 3
       |), ranked AS (
       |  SELECT query_id, CAST(ROW_NUMBER() OVER (
       |           PARTITION BY query_id ORDER BY score DESC, doc_id ASC)
       |           AS BIGINT) AS ctx_pos,
       |         doc_id, dl, score
       |  FROM byq
       |), packed AS (
       |  SELECT r.query_id, r.ctx_pos, r.doc_id, r.dl,
       |         d.n_tokens_bpe AS n_tokens, r.score,
       |         CAST(SUM(d.n_tokens_bpe) OVER (
       |                PARTITION BY r.query_id ORDER BY r.ctx_pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |              AS BIGINT) AS cum_tokens
       |  FROM ranked r JOIN bpedoc d ON d.doc_id = r.doc_id
       |  WHERE r.ctx_pos <= $RAG_BUDGET_BPE
       |)
       |SELECT query_id, ctx_pos, doc_id, dl, n_tokens, cum_tokens, score
       |FROM packed WHERE cum_tokens <= $RAG_BUDGET_BPE
       |ORDER BY query_id, ctx_pos""".stripMargin
  }

  // ---------------------------------------------------------------- q125

  /** Term-hash partition count of the on-disk index. 64 directories at
    * fixture scale; a 100 TB index raises this with vocabulary size so
    * each bucket stays a few hundred MB — the partition count is a
    * layout knob, not a semantics one. */
  val N_BUCKETS = 64

  /** Portable term→bucket hash (md5 via [[graft.Dx.hashKey]], so the
    * engine-side column and the driver-side probe agree by definition). */
  private def termBucket =
    pmod(graft.Dx.hashKey("tb", col("term")), lit(N_BUCKETS.toLong))

  private def bucketOfDriver(term: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(("tb" + term).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % N_BUCKETS
  }

  /** One live temp index dir per JVM (the q91/q104 lifecycle: previous
    * dir deleted on the next invocation, last one on JVM exit; a
    * DataFrame returned by an earlier invocation must be fully consumed
    * before the next — how every driver uses it). */
  private val liveIdxDir =
    new java.util.concurrent.atomic.AtomicReference[String](null)
  private lazy val idxReaper: Unit = {
    sys.addShutdownHook(Option(liveIdxDir.get).foreach(deleteLocalDir))
    ()
  }
  private def deleteLocalDir(path: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
  private def nextIdxDir(): String = {
    idxReaper
    val d = java.nio.file.Files
      .createTempDirectory("graft_q125_index").toString
    Option(liveIdxDir.getAndSet(d)).foreach(deleteLocalDir)
    d
  }

  /** Build the FULL inverted index from a (doc_id, text) frame into
    * `idx`: postings (doc_id, dl, term, tf) partitioned by the term-hash
    * bucket, plus the 1-row corpus stats. Two scans of the input — the
    * documented build floor (postings need the token multiset, stats
    * need every doc including zero-token ones; a production build fuses
    * them into one pass of its ingest job). */
  private def writeIndexOf(src: DataFrame, idx: String): Unit = {
    import src.sparkSession.implicits._
    val base = src.select($"doc_id", split($"text", " ").as("l"))
    base
      .select($"doc_id", size($"l").cast("long").as("dl"),
        explode($"l").as("term"))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("term_bucket", termBucket)
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$idx/q125_postings")
    base.agg(sum(size($"l")).cast("long").as("sum_dl"),
        count(lit(1)).cast("long").as("n_docs"))
      .write.mode("overwrite").parquet(s"$idx/q125_stats")
  }

  /** Serve [[QUERY_TERMS]]-style probes from an index dir: the postings
    * read prunes to the probe terms' hash buckets at PLANNING time
    * (PartitionFilters over the `term_bucket=` directories — the q91
    * device applied to text retrieval), df falls out of the pruned
    * postings (a term's every posting lives in its one bucket, so the
    * pruned read still sees the full df), stats is a 1-row broadcast. */
  private def serveFrom(spark: SparkSession, idx: String,
      terms: Seq[String]): DataFrame = {
    val buckets = terms.map(bucketOfDriver).distinct.sorted
    val stats = spark.read.parquet(s"$idx/q125_stats")
    val post = spark.read.parquet(s"$idx/q125_postings")
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(terms: _*))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    // df as a count window over the one term-keyed read (the q68 df
    // lesson): a groupBy-join-back formulation read the pruned postings
    // TWICE (measured 2× in the executed plan); the window keys one
    // exchange and the scoring tail branches above it.
    val withDf = post.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("term")))
      .cast("long"))
    rankTopKWithDf(withDf, stats)
  }

  /** q125: build→serve — the 100 TB retrieval deployment shape. The
    * corpus is scanned at INDEX BUILD time only; the serve plan reads
    * the term-partitioned index with directory pruning and never touches
    * the corpus. Oracle: q122's scan-path SQL — the serve must equal the
    * scan result exactly (same [[rankTopK]] tail, same inputs by
    * construction). */
  def bm25ServeIndex(spark: SparkSession, dir: String): DataFrame = {
    val idx = nextIdxDir()
    writeIndexOf(docs(spark, dir), idx)
    serveFrom(spark, idx, QUERY_TERMS)
  }

  // ---------------------------------------------------------------- q126

  /** q126: incremental index maintenance — T1 for the RETRIEVAL index,
    * the way q104 is T1 for the containment index: the corpus
    * (doc_id < split, the 4/5-max checkpoint device) owns a persisted
    * index; a new batch (doc_id ≥ split) arrives and ONE batch-text scan
    * appends its postings into the term-partitioned layout and merges
    * the 1-row stats (two 1-row collects — planning inputs). Serving the
    * merged index must equal the full-corpus scan path exactly, which is
    * what the oracle (q122's SQL) states. The corpus text is NEVER
    * rescanned: df, avgdl, and N all come from the index artifacts. */
  def bm25IndexIncrement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = docs(spark, dir)
    val cut = corpus.agg(expr("max(doc_id) * 4 div 5")).head().getLong(0)
    val idx = nextIdxDir()
    writeIndexOf(corpus.filter($"doc_id" < cut), idx)
    // the increment: one batch scan → posting append + stats merge
    val batch = corpus.filter($"doc_id" >= cut)
      .select($"doc_id", split($"text", " ").as("l"))
    batch
      .select($"doc_id", size($"l").cast("long").as("dl"),
        explode($"l").as("term"))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("term_bucket", termBucket)
      .write.mode("append").partitionBy("term_bucket")
      .parquet(s"$idx/q125_postings")
    val stored = spark.read.parquet(s"$idx/q125_stats").head()
    val delta = batch.agg(sum(size($"l")).cast("long").as("sum_dl"),
      count(lit(1)).cast("long").as("n_docs")).head()
    val merged = Seq((stored.getLong(0) + delta.getLong(0),
      stored.getLong(1) + delta.getLong(1))).toDF("sum_dl", "n_docs")
    merged.write.mode("overwrite").parquet(s"$idx/q125_stats")
    serveFrom(spark, idx, QUERY_TERMS)
  }

  // ---------------------------------------------------------------- q127

  /** RRF constant (Cormack et al. 2009, public — the standard k=60) and
    * fusion geometry: each leg contributes its top-[[FUSE_DEPTH]], the
    * fused list keeps [[FUSED_TOP]]. */
  val RRF_K = 60
  val FUSE_DEPTH = 20
  val FUSED_TOP = 10

  /** The dense probe: the embedding of `vec_id` 0 (fixture mapping
    * `vec_id ≡ doc_id`, the q58 contract). The probe document itself is
    * excluded from its own result list (the q29 contract). */
  val DENSE_QUERY = 0L

  /** Reciprocal-rank contribution on the integer micro grid:
    * `1e6 div (k + rank)` — ONE integer division (`div`, not `/`-then-
    * cast), exact in both engines, so the fused score is an
    * order-independent BIGINT sum. 1/(k+rank) as a double would be fine
    * too (each reciprocal is one rounding), but the integer form keeps
    * the whole fusion in ℤ — no float ever. */
  private def rrfContrib(rnkCol: String): Column =
    coalesce(expr(s"1000000L div (${RRF_K}L + $rnkCol)"), lit(0L))

  /** Dense retrieval leg: exact decimal cosine of every vector against
    * the [[DENSE_QUERY]] probe ([[Ann.dotDec]] — the same formulation as
    * q29, so the leg inherits its cross-engine bit-equality), top-20 via
    * `orderBy.limit` (TakeOrderedAndProject — per-partition heaps, never
    * a global sort; the rank window then runs over 20 rows). */
  private def denseLeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Ann.withNorm(spark, dir)
    val probe = base.filter($"vec_id" === DENSE_QUERY).select(
      $"embedding".as("q_emb"), $"nrm_dec".as("q_nrm"))
    val top = base
      .filter($"vec_id" =!= DENSE_QUERY)
      .crossJoin(broadcast(probe))
      .withColumn("cosine",
        Ann.dotDec("q_emb", "embedding").cast("double") /
          (sqrt($"q_nrm".cast("double")) * sqrt($"nrm_dec".cast("double"))))
      .select($"vec_id".as("doc_id"), $"cosine")
      .orderBy($"cosine".desc, $"doc_id".asc)
      .limit(FUSE_DEPTH)
    top.withColumn("dense_rnk", row_number().over(
        Window.orderBy($"cosine".desc, $"doc_id".asc)).cast("long"))
      .select($"doc_id", $"dense_rnk")
  }

  /** q127: hybrid retrieval — the BM25 keyword leg (q122's exact plan)
    * and the dense cosine leg fused by Reciprocal Rank Fusion. The two
    * retrieval families fail differently (keyword misses paraphrase,
    * dense misses rare literal terms), and RRF is the standard public
    * recipe for combining them WITHOUT score calibration: only RANKS
    * cross the legs, so the BM25 grid scores and the cosine doubles
    * never meet arithmetically — the fused score is a pure BIGINT sum of
    * `1e6 div (60 + rank)` contributions (docs outside a leg's top-20
    * contribute 0 via the full-outer join).
    *
    * 100 TB shape: each leg is its own already-audited retrieval plan
    * (q122's one-corpus-scan BM25; the dense leg swaps to q30/q48/q91's
    * bucketed serve at scale — rank-only fusion is exactly what makes
    * the legs independently replaceable); the fusion itself joins two
    * k-row lists — output-sized, never corpus-sized. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bm = bm25Search(spark, dir)
      .select($"doc_id", $"score")
      .withColumn("bm25_rnk", row_number().over(
        Window.orderBy($"score".desc, $"doc_id".asc)).cast("long"))
      .select($"doc_id", $"bm25_rnk")
    val fused = bm.join(denseLeg(spark, dir), Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        rrfContrib("bm25_rnk") + rrfContrib("dense_rnk"))
      .orderBy($"rrf_micro".desc, $"doc_id".asc)
      .limit(FUSED_TOP)
    fused.withColumn("rnk", row_number().over(
        Window.orderBy($"rrf_micro".desc, $"doc_id".asc)).cast("long"))
      .select($"doc_id", $"bm25_rnk", $"dense_rnk", $"rrf_micro", $"rnk")
      .orderBy($"rnk")
  }

  private val hybridRrfOracle = {
    val dim = Ann.EMBED_DIM
    val prodDec =
      "CAST(floor(CAST(%s AS DOUBLE) * CAST(%s AS DOUBLE) * 1e12 + 0.5) / 1e12 AS DECIMAL(38,15))"
    s"""${bm25Sql(QUERY_TERMS)}, bmtop AS (
       |  SELECT doc_id,
       |         CAST(SUM(CAST(rscore AS DECIMAL(30,6))) AS DOUBLE) AS score
       |  FROM scored GROUP BY 1
       |  ORDER BY score DESC, doc_id LIMIT $FUSE_DEPTH
       |), bm AS (
       |  SELECT doc_id, CAST(ROW_NUMBER() OVER (
       |           ORDER BY score DESC, doc_id) AS BIGINT) AS bm25_rnk
       |  FROM bmtop
       |), el AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         unnest(embedding) AS x
       |  FROM embeddings
       |), norms AS (
       |  SELECT vec_id, SUM(${prodDec.format("x", "x")}) AS nrm
       |  FROM el GROUP BY 1
       |), dots AS (
       |  SELECT e.vec_id AS doc_id, SUM(${prodDec.format("q.x", "e.x")}) AS dot
       |  FROM el q JOIN el e ON q.i = e.i AND e.vec_id <> $DENSE_QUERY
       |  WHERE q.vec_id = $DENSE_QUERY
       |  GROUP BY 1
       |), dntop AS (
       |  SELECT doc_id,
       |         CAST(dot AS DOUBLE)
       |           / (sqrt(CAST(nq.nrm AS DOUBLE)) * sqrt(CAST(nn.nrm AS DOUBLE)))
       |           AS cosine
       |  FROM dots JOIN norms nq ON nq.vec_id = $DENSE_QUERY
       |            JOIN norms nn ON nn.vec_id = doc_id
       |  ORDER BY cosine DESC, doc_id LIMIT $FUSE_DEPTH
       |), dn AS (
       |  SELECT doc_id, CAST(ROW_NUMBER() OVER (
       |           ORDER BY cosine DESC, doc_id) AS BIGINT) AS dense_rnk
       |  FROM dntop
       |), fused AS (
       |  SELECT COALESCE(bm.doc_id, dn.doc_id) AS doc_id, bm25_rnk, dense_rnk,
       |         COALESCE(CAST(1000000 // ($RRF_K + bm25_rnk) AS BIGINT), 0)
       |           + COALESCE(CAST(1000000 // ($RRF_K + dense_rnk) AS BIGINT), 0)
       |           AS rrf_micro
       |  FROM bm FULL JOIN dn ON bm.doc_id = dn.doc_id
       |)
       |SELECT doc_id, bm25_rnk, dense_rnk, rrf_micro,
       |       CAST(ROW_NUMBER() OVER (
       |         ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rnk
       |FROM fused
       |QUALIFY rnk <= $FUSED_TOP
       |ORDER BY rnk""".stripMargin
  }

  // ----------------------------------------------------------------

  val all: Seq[Query] = Seq(
    Query("q122_bm25_search",
      "BM25 keyword retrieval: top-20 docs for a 4-term query, ratio idf + grid-rounded decimal sums",
      bm25Search, Some(bm25Oracle), headline = false),
    Query("q123_bm25_batch",
      "batched BM25 serve: 3 queries scored in one corpus pass, top-5 each via per-query rank window",
      bm25Batch, Some(bm25BatchOracle), headline = false),
    Query("q161_rag_context",
      "RAG context assembly: BM25-ranked candidates packed into a fixed token budget in rank order, exact running totals per query",
      ragContext, Some(ragContextOracle), headline = false),
    Query("q167_rag_context_bpe",
      "RAG context packed by REAL BPE token counts (q121's doc grain) instead of whitespace words — the budget the model actually consumes; fertility makes it admit fewer docs",
      ragContextBpe, Some(ragContextBpeOracle), headline = false),
    Query("q125_bm25_serve_index",
      "build→serve: BM25 over a term-hash-partitioned on-disk index, PartitionFilters-pruned bucket reads, ≡ the scan path",
      bm25ServeIndex, Some(bm25Oracle), headline = false),
    Query("q126_bm25_index_increment",
      "maintain→serve: batch postings appended + stats merged without rescanning the corpus, ≡ the full-corpus scan path",
      bm25IndexIncrement, Some(bm25Oracle), headline = false),
    Query("q127_hybrid_rrf",
      "hybrid retrieval: BM25 keyword leg + exact-cosine dense leg fused by integer Reciprocal Rank Fusion (k=60)",
      hybridRrf, Some(hybridRrfOracle), headline = false))
}
