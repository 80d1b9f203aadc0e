package graft.ops

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-frequency analyses over `documents`: the repetition filters a
  * Gopher/MassiveText-style curation pass runs per document, and an
  * exact-rank "distinctive terms" (TF-IDF-shaped) extraction. Neither
  * exists in the reference (its text surface ends at notes columns); both
  * are first-class LLM-pipeline operators per the builder brief, so each
  * carries a full DuckDB oracle.
  *
  * 100 TB design notes:
  *  - Everything shuffles keyed by (doc_id, gram) or (term) — never by the
  *    document text; grams are exploded AFTER projecting (doc_id, n_chars,
  *    tokens), so exchanged bytes track token data, not row width.
  *  - All windows partition by doc_id (or doc_id, n): no global window
  *    exists anywhere in the plan.
  *  - The n-gram streams for n=1,2,3 ride ONE explode over one scan (array
  *    of (n, gram) structs), not three scans of the corpus.
  *  - df in [[distinctiveTerms]] is a count window over ONE term-keyed
  *    shuffle of the (doc, term) stream — never an aggregate joined back
  *    (that shape re-reads the corpus; see the method note).
  */
object Terms {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  // ---------------------------------------------------------------- q64

  /** Gopher-style repetition thresholds (Rae et al. 2021 table A1 uses
    * duplicate-line/top-n-gram character fractions; the testdata corpus is
    * single-line word text, so the signals here are token-level). Chosen to
    * split the synthetic corpus non-trivially; a real curation run tunes
    * them per corpus. */
  val DUP_TOKEN_MAX = 0.5
  val TOP_BIGRAM_MAX = 0.08
  val TOP_TRIGRAM_MAX = 0.10

  /** Per-document repetition signals: duplicate-token fraction and the
    * character fraction covered by the most frequent word bigram/trigram
    * (ties broken by gram text, ascending — pinned so the DuckDB oracle
    * ranks identically). `repetition_ok` applies the documented thresholds.
    *
    * All fractions are single divisions of exact integers (counts ×
    * lengths over n_chars), so double results are bit-identical across
    * engines and across cluster re-runs. */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // One explode carries all three gram orders: array<struct<n,gram>>.
    // Spark's sequence(1, 0) is DESCENDING (not empty), so short documents
    // guard each higher-order gram array explicitly.
    val toks = docs(spark, dir)
      .select($"doc_id", $"n_chars", split($"text", " ").as("l"))
    val grams = toks.select(
      $"doc_id", $"n_chars",
      explode(concat(
        expr("transform(l, w -> struct(1 as n, w as gram))"),
        when(size($"l") >= 2, expr(
          """transform(sequence(1, size(l)-1),
            |  i -> struct(2 as n, concat(element_at(l, i), ' ',
            |                             element_at(l, i+1)) as gram))"""
            .stripMargin))
          .otherwise(expr("array()")),
        when(size($"l") >= 3, expr(
          """transform(sequence(1, size(l)-2),
            |  i -> struct(3 as n, concat(element_at(l, i), ' ',
            |                             element_at(l, i+1), ' ',
            |                             element_at(l, i+2)) as gram))"""
            .stripMargin))
          .otherwise(expr("array()")))).as("g"))
      .select($"doc_id", $"n_chars", $"g.n", $"g.gram")
    val cnt = grams.groupBy($"doc_id", $"n_chars", $"n", $"gram")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"doc_id", $"n").orderBy($"c".desc, $"gram".asc)
    val lvl = cnt
      .withColumn("rnk", row_number().over(w))
      .groupBy($"doc_id", $"n_chars", $"n")
      .agg(
        sum($"c").as("tot"),
        count(lit(1)).as("n_distinct"),
        max(when($"rnk" === 1, $"gram")).as("top_gram"),
        max(when($"rnk" === 1, $"c")).as("top_cnt"))
    lvl
      .groupBy($"doc_id")
      .agg(
        max(when($"n" === 1, $"tot")).cast("long").as("n_tokens"),
        (max(when($"n" === 1, $"tot" - $"n_distinct")).cast("double") /
          max(when($"n" === 1, $"tot"))).as("dup_token_frac"),
        max(when($"n" === 2, $"top_gram")).as("top_bigram"),
        (coalesce(max(when($"n" === 2, $"top_cnt" * length($"top_gram"))),
          lit(0L)).cast("double") / max($"n_chars")).as("top_bigram_frac"),
        max(when($"n" === 3, $"top_gram")).as("top_trigram"),
        (coalesce(max(when($"n" === 3, $"top_cnt" * length($"top_gram"))),
          lit(0L)).cast("double") / max($"n_chars")).as("top_trigram_frac"))
      .withColumn("repetition_ok",
        $"dup_token_frac" <= DUP_TOKEN_MAX &&
          $"top_bigram_frac" <= TOP_BIGRAM_MAX &&
          $"top_trigram_frac" <= TOP_TRIGRAM_MAX)
      .orderBy($"doc_id")
  }

  private val repetitionOracle =
    s"""WITH toks AS (
       |  SELECT doc_id, n_chars, string_split(text, ' ') AS l FROM documents
       |), grams AS (
       |  SELECT doc_id, n_chars, 1 AS n, unnest(l) AS gram FROM toks
       |  UNION ALL
       |  SELECT doc_id, n_chars, 2 AS n,
       |         unnest(list_transform(generate_series(1, len(l)-1),
       |                i -> l[i] || ' ' || l[i+1])) AS gram
       |  FROM toks
       |  UNION ALL
       |  SELECT doc_id, n_chars, 3 AS n,
       |         unnest(list_transform(generate_series(1, len(l)-2),
       |                i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS gram
       |  FROM toks
       |), cnt AS (
       |  SELECT doc_id, n_chars, n, gram, COUNT(*) AS c
       |  FROM grams GROUP BY 1, 2, 3, 4
       |), ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, n
       |                               ORDER BY c DESC, gram) AS rnk
       |  FROM cnt
       |), lvl AS (
       |  SELECT doc_id, n_chars, n, SUM(c) AS tot, COUNT(*) AS n_distinct,
       |         MAX(CASE WHEN rnk = 1 THEN gram END) AS top_gram,
       |         MAX(CASE WHEN rnk = 1 THEN c END) AS top_cnt
       |  FROM ranked GROUP BY 1, 2, 3
       |), sig AS (
       |SELECT doc_id,
       |  CAST(MAX(CASE WHEN n = 1 THEN tot END) AS BIGINT) AS n_tokens,
       |  CAST(MAX(CASE WHEN n = 1 THEN tot - n_distinct END) AS DOUBLE)
       |    / MAX(CASE WHEN n = 1 THEN tot END) AS dup_token_frac,
       |  MAX(CASE WHEN n = 2 THEN top_gram END) AS top_bigram,
       |  CAST(COALESCE(MAX(CASE WHEN n = 2 THEN top_cnt * len(top_gram) END), 0)
       |       AS DOUBLE) / MAX(n_chars) AS top_bigram_frac,
       |  MAX(CASE WHEN n = 3 THEN top_gram END) AS top_trigram,
       |  CAST(COALESCE(MAX(CASE WHEN n = 3 THEN top_cnt * len(top_gram) END), 0)
       |       AS DOUBLE) / MAX(n_chars) AS top_trigram_frac
       |FROM lvl GROUP BY doc_id)
       |SELECT *, (dup_token_frac <= $DUP_TOKEN_MAX
       |       AND top_bigram_frac <= $TOP_BIGRAM_MAX
       |       AND top_trigram_frac <= $TOP_TRIGRAM_MAX) AS repetition_ok
       |FROM sig ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q68

  /** Top-5 distinctive terms per document, TF-IDF-shaped but ranked by the
    * EXACT lexicographic key (tf DESC, df ASC, term ASC) instead of a
    * floating tf·log(N/df) score — the rank a float score would produce up
    * to log-monotonicity within equal tf, with zero cross-engine float
    * risk (Spark's `Math.log` and DuckDB's `std::log` are not guaranteed
    * bit-equal). tf/df/n_docs are emitted so any downstream scorer can
    * apply its own idf curve. */
  def distinctiveTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tf = docs(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).cast("long").as("tf"))
    // df: documents containing the term — a count(*) WINDOW over the tf
    // stream (one row per (doc, term)), not an aggregate joined back:
    // the agg+self-join shape references the tf subtree twice and was
    // measured to scan the corpus twice (exchange reuse does not fire
    // across the differing consumers); the window keys ONE term shuffle
    // and every consumer branches above it — the q27 df lesson applied.
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy($"term")).cast("long"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc, $"term".asc)
    withDf
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 5)
      .select($"doc_id", $"rnk", $"term", $"tf", $"df")
      .orderBy($"doc_id", $"rnk")
  }

  private val distinctiveOracle =
    """WITH tf AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  GROUP BY 1, 2
      |), df AS (
      |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
      |)
      |SELECT doc_id, rnk, term, tf, df FROM (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |                ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS BIGINT)
      |           AS rnk
      |  FROM tf JOIN df USING (term))
      |WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q76

  /** Context-window size and stride (tokens): 32-token chunks every 24
    * tokens ⇒ 8 tokens of overlap, the standard train-prep shape scaled
    * to the fixture corpus (a SOTA run uses e.g. 8192/7680 — same code,
    * different literals). */
  val CHUNK_TOKENS = 32
  val CHUNK_STRIDE = 24

  /** Context-length chunking — the training-prep step between curation
    * and sharding: each document becomes overlapping token windows with
    * DETERMINISTIC (doc_id, chunk_idx) identity, so chunk membership
    * survives re-runs and incremental loads the way the sampler's hash
    * membership does. A chunk starts at every stride multiple below the
    * token count (trailing short chunks are kept — they carry the
    * document tail; a sub-stride document yields exactly one chunk).
    *
    * 100 TB shape: pure projection + posexplode — chunking happens in
    * the scan stage, no shuffle; output rows carry (ids, text slice),
    * ready for [[graft.sources.Sinks.writeShards]]. */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id", $"lang", split($"text", " ").as("l"))
      .select($"doc_id", $"lang", posexplode(expr(
        s"""transform(sequence(0, size(l) - 1, $CHUNK_STRIDE),
           |  s -> concat_ws(' ', slice(l, s + 1, $CHUNK_TOKENS)))"""
          .stripMargin)))
      .select($"doc_id", $"lang",
        $"pos".cast("long").as("chunk_idx"),
        $"col".as("chunk_text"),
        (size(split($"col", " "))).cast("long").as("chunk_tokens"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  private val chunkOracle =
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS l
       |           FROM documents),
       |c AS (
       |  SELECT doc_id, lang,
       |         CAST(s // $CHUNK_STRIDE AS BIGINT) AS chunk_idx,
       |         array_to_string(l[s + 1 : s + $CHUNK_TOKENS], ' ')
       |           AS chunk_text
       |  FROM t, unnest(range(0, len(l), $CHUNK_STRIDE)) AS u(s)
       |)
       |SELECT doc_id, lang, chunk_idx, chunk_text,
       |       CAST(len(string_split(chunk_text, ' ')) AS BIGINT)
       |         AS chunk_tokens
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- q106

  /** Collocation extraction floor and result width: pairs seen fewer than
    * [[COLLOC_MIN_PAIR]] times carry no statistical signal (and at 100 TB
    * the floor is what keeps the scored pair table vocabulary-sized, not
    * corpus-sized); [[COLLOC_TOP_K]] bounds the ranked output. */
  val COLLOC_MIN_PAIR = 10L
  val COLLOC_TOP_K = 50

  /** Top bigram collocations by pointwise lift — the vocabulary/tokenizer-
    * prep step that surfaces multi-word units worth merging. Score is the
    * PMI argument WITHOUT the log: lift = N·c(ab) / (c(a)·c(b)) (N = total
    * bigrams; c(·) = token occurrences). The log is monotone, so the
    * RANKING is exactly PMI's, and skipping it keeps the score a pinned
    * left-associated double chain (`CAST(N AS DOUBLE) * c_ab / c_a / c_b`)
    * both engines evaluate bit-identically — no libm in the plan.
    *
    * 100 TB shape: one corpus scan fans into the unigram+bigram gram
    * stream (the q64 single-explode trick); counts shuffle keyed by gram;
    * the min-count filter collapses the pair table to signal-bearing pairs
    * BEFORE the marginal joins; N rides a 1-row broadcast; the final
    * top-K is `orderBy.limit` ⇒ TakeOrderedAndProject (per-partition
    * heaps + driver merge of K rows, never a global sort). */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = docs(spark, dir).select(split($"text", " ").as("l"))
    // One explode carries unigrams (n=1, w2='') and bigrams (n=2).
    val grams = toks.select(explode(concat(
      expr("transform(l, w -> struct(1 as n, w as w1, '' as w2))"),
      when(size($"l") >= 2, expr(
        """transform(sequence(1, size(l)-1),
          |  i -> struct(2 as n, element_at(l, i) as w1,
          |              element_at(l, i+1) as w2))""".stripMargin))
        .otherwise(expr("array()")))).as("g"))
      .select($"g.n", $"g.w1", $"g.w2")
    // Persisted at GRAM grain (distinct unigrams+bigrams with counts —
    // vocabulary-sized, ≪ the occurrence stream): three consumers (pair
    // counts, marginals, N) branch here, and without the cache their
    // differing column pruning defeats AQE stage reuse and the corpus is
    // scanned three times (measured; the Scale.prefixSum precedent and
    // cache-lifetime contract — the harness mains clear the cache per
    // query).
    val cnt = grams.groupBy($"n", $"w1", $"w2")
      .agg(count(lit(1)).cast("long").as("c"))
      .persist()
    val uni = cnt.filter($"n" === 1)
      .select($"w1".as("term"), $"c".as("uc"))
    val pairs = cnt.filter($"n" === 2 && $"c" >= COLLOC_MIN_PAIR)
      .select($"w1", $"w2", $"c".as("pair_count"))
    val nBigrams = cnt.filter($"n" === 2)
      .agg(sum($"c").cast("long").as("n_bigrams"))
    pairs
      .join(uni.select($"term".as("w1"), $"uc".as("c1")), Seq("w1"))
      .join(uni.select($"term".as("w2"), $"uc".as("c2")), Seq("w2"))
      .crossJoin(broadcast(nBigrams))
      .withColumn("lift",
        $"n_bigrams".cast("double") * $"pair_count" / $"c1" / $"c2")
      .select($"w1", $"w2", $"pair_count", $"c1", $"c2", $"lift")
      .orderBy($"lift".desc, $"pair_count".desc, $"w1", $"w2")
      .limit(COLLOC_TOP_K)
  }

  private val collocationsOracle =
    s"""WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents),
       |uni AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS uc
       |  FROM (SELECT unnest(l) AS term FROM toks) GROUP BY 1
       |), bi AS (
       |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count
       |  FROM (SELECT unnest(list_transform(generate_series(1, len(l)-1),
       |                      i -> struct_pack(w1 := l[i], w2 := l[i+1])),
       |               recursive := true)
       |        FROM toks WHERE len(l) >= 2)
       |  GROUP BY 1, 2
       |), n AS (SELECT CAST(SUM(pair_count) AS BIGINT) AS n_bigrams FROM bi)
       |SELECT bi.w1, bi.w2, bi.pair_count,
       |       u1.uc AS c1, u2.uc AS c2,
       |       CAST(n.n_bigrams AS DOUBLE) * bi.pair_count / u1.uc / u2.uc
       |         AS lift
       |FROM bi
       |JOIN uni u1 ON u1.term = bi.w1
       |JOIN uni u2 ON u2.term = bi.w2
       |CROSS JOIN n
       |WHERE bi.pair_count >= $COLLOC_MIN_PAIR
       |ORDER BY lift DESC, pair_count DESC, w1, w2
       |LIMIT $COLLOC_TOP_K""".stripMargin

  // ---------------------------------------------------------------- q107

  /** Vocabulary size for the coverage probe. Small against the fixture
    * corpus ON PURPOSE (the synthetic vocabulary is ~tens of distinct
    * terms, so 24 splits it non-trivially); a real tokenizer run uses
    * 32k–256k — same plan, different literal. */
  val VOCAB_SIZE = 24

  /** Vocabulary coverage: build the top-[[VOCAB_SIZE]] term vocabulary by
    * corpus frequency (ties by term, pinned), then measure the
    * out-of-vocabulary token rate per (lang, source) stratum — the
    * go/no-go check run before freezing a tokenizer on a corpus mix.
    *
    * Two corpus passes BY CONSTRUCTION (train the vocab artifact, then
    * score the corpus against it) — the same two-pass contract as q57's
    * evidence/projection split; the intermediate vocab is V rows and
    * broadcast to the scoring pass, so pass 2 adds zero shuffles beyond
    * its stratum-grain agg. The OOV rate is one exact division of long
    * sums. */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = docs(spark, dir)
      .select($"doc_id", $"lang", $"source",
        explode(split($"text", " ")).as("term"))
    val vocab = tok.groupBy($"term")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"term".asc)
      .limit(VOCAB_SIZE)
      .select($"term", lit(1L).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .groupBy($"lang", $"source")
      .agg(
        countDistinct($"doc_id").cast("long").as("n_docs"),
        count(lit(1)).cast("long").as("tokens"),
        sum(when($"in_vocab".isNull, 1L).otherwise(0L)).cast("long")
          .as("oov_tokens"))
      .withColumn("oov_rate", $"oov_tokens".cast("double") / $"tokens")
      .orderBy($"lang", $"source")
  }

  private val vocabCoverageOracle =
    s"""WITH tok AS (
       |  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS term
       |  FROM documents
       |), vocab AS (
       |  SELECT term FROM (
       |    SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1)
       |  ORDER BY cnt DESC, term LIMIT $VOCAB_SIZE
       |)
       |SELECT lang, source,
       |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(COUNT(*) AS BIGINT) AS tokens,
       |       CAST(SUM(CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END)
       |            AS BIGINT) AS oov_tokens,
       |       CAST(SUM(CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END)
       |            AS DOUBLE) / COUNT(*) AS oov_rate
       |FROM tok LEFT JOIN vocab USING (term)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q108

  /** Typicality class boundaries (mean corpus frequency per token — see
    * [[tokenTypicality]]). Data-driven against the synthetic corpus the
    * way [[DUP_TOKEN_MAX]] is: the fixture's per-doc means cluster around
    * the uniform-draw expectation, so the cuts split the corpus into
    * non-trivial rare/mid/common populations; a real curation run tunes
    * them per corpus (they are the operator's config surface, not its
    * semantics). */
  val TYPICALITY_COMMON_MIN = 0.0334
  val TYPICALITY_RARE_MAX = 0.0332

  /** Per-document corpus-typicality score — the zero-dependency stand-in
    * for an n-gram-LM perplexity quality filter: the mean corpus relative
    * frequency of the document's token occurrences,
    * score = (Σ_occ c(tok)) / (n_tok · T). Documents of corpus-typical
    * words score high ("common"); noise/junk drawn from the frequency
    * tail scores low ("rare") — the same signal a unigram LM's average
    * token probability gives, with every sum an exact integer and the
    * score ONE pinned double chain (no libm log/exp anywhere).
    *
    * 100 TB shape: corpus token counts are a count WINDOW over the one
    * term-keyed shuffle of the exploded stream (the q68 df lesson — never
    * an aggregate joined back, which would re-scan the corpus); the
    * per-doc rollup re-keys that stream by doc_id; T rolls up from the
    * PERSISTED doc-grain aggregate, never from a second corpus scan
    * (single-scan pinned by the q106/q107/q108 ScanBudget entries). */
  def tokenTypicality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = docs(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
    val withC = tok.withColumn("c",
      count(lit(1)).over(Window.partitionBy($"term")).cast("long"))
    // Persisted at DOC grain (one row per document): T's rollup and the
    // scoring projection both branch here, and their differing column
    // pruning defeats AQE stage reuse — without the cache the corpus is
    // scanned twice (measured; prefixSum's persist precedent, harness
    // clears the cache per query).
    val byDoc = withC.groupBy($"doc_id")
      .agg(sum($"c").cast("long").as("sum_c"),
        count(lit(1)).cast("long").as("n_tok"))
      .persist()
    val total = byDoc.agg(sum($"n_tok").cast("long").as("t_tokens"))
    byDoc.crossJoin(broadcast(total))
      .withColumn("typicality",
        $"sum_c".cast("double") / $"n_tok" / $"t_tokens")
      .withColumn("typicality_class",
        when($"typicality" >= TYPICALITY_COMMON_MIN, "common")
          .when($"typicality" < TYPICALITY_RARE_MAX, "rare")
          .otherwise("mid"))
      .select($"doc_id", $"n_tok", $"typicality", $"typicality_class")
      .orderBy($"doc_id")
  }

  private val typicalityOracle =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT)
       |           AS c
       |  FROM tok
       |), d AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS sum_c,
       |         CAST(COUNT(*) AS BIGINT) AS n_tok
       |  FROM c GROUP BY 1
       |), t AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS t_tokens FROM d)
       |SELECT doc_id, n_tok,
       |       CAST(sum_c AS DOUBLE) / n_tok / t_tokens AS typicality,
       |       CASE
       |         WHEN CAST(sum_c AS DOUBLE) / n_tok / t_tokens
       |              >= $TYPICALITY_COMMON_MIN THEN 'common'
       |         WHEN CAST(sum_c AS DOUBLE) / n_tok / t_tokens
       |              < $TYPICALITY_RARE_MAX THEN 'rare'
       |         ELSE 'mid'
       |       END AS typicality_class
       |FROM d CROSS JOIN t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q120

  /** Number of BPE merge rounds to train. Small against the fixture's
    * ~50-word vocabulary; a real tokenizer runs 30k–250k rounds of the
    * SAME per-round plan. */
  val BPE_ROUNDS = 6

  /** BPE merge training — the canonical tokenizer-build loop (Sennrich et
    * al. 2016, public): start from characters, repeatedly merge the most
    * frequent adjacent symbol pair (corpus-frequency-weighted, ties by
    * (left, right) ascending — pinned so both engines pick the same
    * pair). Emits one row per learned merge with its pair count at merge
    * time.
    *
    * Merge mechanics: a word's symbol sequence is stored as a 2-SPACE
    * separated string with 2-space ends ("␣␣a␣␣b␣␣"); applying merge
    * (A,B) is then `replace(sym, " A␣␣B ", " AB ")` — each match consumes
    * ONE space from each side, so the 2-space invariant survives and
    * `replace`'s left-to-right non-overlapping scan IS the BPE greedy
    * merge order, identically in Spark and DuckDB ("a a a" merges once,
    * "a b a b" merges twice).
    *
    * 100 TB shape: ONE corpus scan collapses to the word-frequency table
    * (vocabulary-grain); every round after that runs at vocab grain —
    * pair counts are one explode + agg over vocab rows, the argmax is a
    * 1-row `orderBy.limit(1)` collect (driver planning input, the
    * k-means precedent), and the merge is a projection. localCheckpoint
    * per round bounds lineage (the q60 device). */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // LAZY localCheckpoint per round (optimization guide §1.2/§2.4 —
    // this round's job-count cut): the round-16 shape eagerly
    // localCheckpoint'ed `words` after every merge, so each round ran TWO
    // jobs (pair-count argmax + checkpoint materialization) and the LAST
    // round's frame — which nothing consumes — was still materialized.
    // Each round's only consumer of words(k) is round k+1's pair count
    // (one stage — no concurrent-stage race), so a lazy checkpoint is
    // enough: the argmax job of round k+1 computes words(k) from the
    // checkpointed words(k−1) blocks plus one replace projection and
    // stores it in passing. One vocab-grain job per round, the final
    // frame never materializes, and lineage still truncates per round
    // (each frame is a LogicalRDD over its predecessor's blocks).
    // localCheckpoint, NOT persist: a persist variant was measured
    // +0.6–0.7 s on every consumer at sf0.1 — the columnar string
    // encode of the sym column costs more than the job it saves (the
    // same lore as the shingle pair-frame persist note). Values are
    // untouched: the pair counts aggregate the same frames, so the
    // learned ruleset is byte-identical (TermsSpec + the
    // q120/q121/q160/q167 oracles pin it).
    var words = docs(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).cast("long").as("freq"))
      .select(concat(lit("  "),
        concat_ws("  ", expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))")),
        lit("  ")).as("sym"), $"freq")
      .localCheckpoint(false)
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (round <- 1 to BPE_ROUNDS) {
      val pairs = words
        .select($"freq", split($"sym", "  ").as("l"))
        // single-symbol words ([", A, "], size 3) have no pairs — and
        // Spark's sequence(2, 1) is DESCENDING, not empty (the q64 trap)
        .filter(size($"l") >= 4)
        .select($"freq", explode(expr(
          """transform(sequence(2, size(l) - 2),
            |  i -> struct(element_at(l, i) as lft,
            |              element_at(l, i + 1) as rgt))""".stripMargin))
          .as("p"))
        .groupBy($"p.lft", $"p.rgt")
        .agg(sum($"freq").cast("long").as("cnt"))
      val best = pairs.orderBy($"cnt".desc, $"lft", $"rgt").limit(1)
        .collect()
      if (best.nonEmpty) {
        val (a, b, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round.toLong, a, b, a + b, c))
        words = words
          .select(replace($"sym", lit(s" $a  $b "), lit(s" $a$b "))
            .as("sym"), $"freq")
          .localCheckpoint(false)
      }
    }
    merges.result()
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
      .orderBy($"merge_rank")
  }

  // ---------------------------------------------------------------- q121

  /** BPE apply — the serve half of the q120 train→apply lifecycle (the
    * tokenizer analog of IVF's q85 train→serve): tokenize every document
    * with the JUST-TRAINED merge ruleset and report per-document token
    * accounting (chars, whitespace words, BPE tokens, and the exact
    * chars-per-token compression ratio a context-budget planner reads).
    * Merges apply in rank order — each is one `replace` under the q120
    * 2-space invariant, so application is a pure K-deep projection chain.
    *
    * 100 TB shape: training runs once (vocab-grain, q120's plan; its
    * k-row ruleset is a driver planning input — the trained-centroid
    * precedent, so training's scans run before the registered plan),
    * then application is ONE corpus scan through a K-replace codegen
    * projection: no shuffle, no state, no join. Semantically the same
    * train/serve two-pass as q107; the gated apply plan itself is
    * 1-scan. */
  /** Doc-grain BPE token accounting (doc_id, lang, n_chars, n_words,
    * n_tokens_bpe) — the shared core of q121 (per-doc report) and q160
    * (per-language fertility rollup). */
  private def bpeTokenized(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ruleset = bpeMerges(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    val charSym = concat(lit("  "),
      concat_ws("  ", expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")),
      lit("  "))
    val applied = ruleset.foldLeft(charSym) { case (sym, (a, b, m)) =>
      replace(sym, lit(s" $a  $b "), lit(s" $m "))
    }
    docs(spark, dir)
      .select($"doc_id", $"lang", $"n_chars",
        explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      // tokens in a word = symbols = separator runs − 1 under the
      // invariant: size(split(sym, '  ')) = symbols + 2 ⇒ symbols =
      // size − 2
      .select($"doc_id", $"lang", $"n_chars",
        (size(split(applied, "  ")) - 2).cast("long").as("w_tokens"))
      .groupBy($"doc_id", $"lang")
      .agg(max($"n_chars").cast("long").as("n_chars"),
        count(lit(1)).cast("long").as("n_words"),
        sum($"w_tokens").cast("long").as("n_tokens_bpe"))
  }

  def bpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeTokenized(spark, dir)
      .select($"doc_id", $"n_chars", $"n_words", $"n_tokens_bpe")
      .withColumn("chars_per_token",
        $"n_chars".cast("double") / $"n_tokens_bpe")
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- q160

  /** q160: tokenizer FERTILITY per language — the fairness read run
    * after any tokenizer change (Ács 2019 popularized the metric;
    * fertility = subword tokens per whitespace word): a language whose
    * fertility is 2× another's pays 2× the context budget and 2× the
    * compute per sentence, so the mix owner reads this table next to
    * q147's epoch plan before trusting a token-denominated budget.
    * Per language: docs, exact char/word/BPE-token totals, and the two
    * ratios (chars per token — compression; tokens per word —
    * fertility). Totals are exact BIGINTs off q121's doc-grain core;
    * each ratio is one double division.
    *
    * 100 TB shape: q121's one-scan K-replace projection, then a doc-
    * grain hash agg and a LANG-grain rollup (dimension-sized output);
    * training's scans run before the registered plan (ruleset = driver
    * planning input, the q121/trained-centroid precedent). */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeTokenized(spark, dir)
      .groupBy($"lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum($"n_chars").cast("long").as("n_chars"),
        sum($"n_words").cast("long").as("n_words"),
        sum($"n_tokens_bpe").cast("long").as("n_tokens_bpe"))
      .withColumn("chars_per_token",
        $"n_chars".cast("double") / $"n_tokens_bpe")
      .withColumn("fertility",
        $"n_tokens_bpe".cast("double") / $"n_words")
      .orderBy($"lang")
  }

  /** `(doc_id, n_tokens_bpe)` — the doc-grain BPE token counts alone,
    * for consumers that budget in REAL tokenizer units (q167's RAG
    * packing). Rides [[bpeTokenized]]'s one-scan K-replace projection. */
  private[ops] def bpeDocTokenCounts(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    bpeTokenized(spark, dir).select($"doc_id", $"n_tokens_bpe")
  }

  /** The per-doc BPE token-count replay as a CTE chain ending in
    * `bpedoc(doc_id, n_tokens_bpe)` — the q121 scaffolding packaged for
    * CROSS-MODULE oracles (q167 composes it with the BM25 CTEs; the
    * CTE names — w0, pN, bN, wN, tok, bpedoc — are disjoint from
    * [[Retrieval]]'s). */
  private[ops] def bpeDocCountCtes: String = {
    val rounds = (1 to BPE_ROUNDS).map { i =>
      s"""p$i AS (
         |  SELECT l[i] AS lft, l[i + 1] AS rgt,
         |         CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(sym, '  ') AS l, freq FROM w${i - 1}),
         |       unnest(range(2, len(l) - 1)) AS u(i)
         |  GROUP BY 1, 2
         |), b$i AS (
         |  SELECT lft, rgt, lft || rgt AS merged
         |  FROM p$i ORDER BY cnt DESC, lft, rgt LIMIT 1
         |), w$i AS (
         |  SELECT replace(sym, ' ' || b$i.lft || '  ' || b$i.rgt || ' ',
         |                 ' ' || b$i.merged || ' ') AS sym, freq
         |  FROM w${i - 1}, b$i
         |)""".stripMargin
    }.mkString(",\n")
    val appliedSql = (1 to BPE_ROUNDS).foldLeft(
      """'  ' || array_to_string(list_transform(range(1, length(w) + 1),
        |                        i -> substr(w, i, 1)), '  ') || '  '"""
        .stripMargin) { (acc, i) =>
      s"replace($acc, ' ' || b$i.lft || '  ' || b$i.rgt || ' ', ' ' || b$i.merged || ' ')"
    }
    val bJoin = (1 to BPE_ROUNDS).map(i => s"b$i").mkString(", ")
    s"""w0 AS (
       |  SELECT '  ' || array_to_string(
       |           list_transform(range(1, length(w) + 1),
       |                          i -> substr(w, i, 1)), '  ') || '  '
       |           AS sym,
       |         CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY 1
       |),
       |$rounds,
       |tok AS (
       |  SELECT doc_id,
       |         CAST(len(string_split($appliedSql, '  ')) - 2 AS BIGINT)
       |           AS w_tokens
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |        FROM documents),
       |       $bJoin
       |  WHERE length(w) > 0
       |),
       |bpedoc AS (
       |  SELECT doc_id, CAST(SUM(w_tokens) AS BIGINT) AS n_tokens_bpe
       |  FROM tok GROUP BY doc_id
       |)""".stripMargin
  }

  private val bpeTokenizeOracle = {
    // the trained rules replayed as the q120 CTE chain, then applied as a
    // 6-deep replace over each word's char-split symbol string
    val rounds = (1 to BPE_ROUNDS).map { i =>
      s"""p$i AS (
         |  SELECT l[i] AS lft, l[i + 1] AS rgt,
         |         CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(sym, '  ') AS l, freq FROM w${i - 1}),
         |       unnest(range(2, len(l) - 1)) AS u(i)
         |  GROUP BY 1, 2
         |), b$i AS (
         |  SELECT lft, rgt, lft || rgt AS merged
         |  FROM p$i ORDER BY cnt DESC, lft, rgt LIMIT 1
         |), w$i AS (
         |  SELECT replace(sym, ' ' || b$i.lft || '  ' || b$i.rgt || ' ',
         |                 ' ' || b$i.merged || ' ') AS sym, freq
         |  FROM w${i - 1}, b$i
         |)""".stripMargin
    }.mkString(",\n")
    val appliedSql = (1 to BPE_ROUNDS).foldLeft(
      """'  ' || array_to_string(list_transform(range(1, length(w) + 1),
        |                        i -> substr(w, i, 1)), '  ') || '  '"""
        .stripMargin) { (acc, i) =>
      s"replace($acc, ' ' || b$i.lft || '  ' || b$i.rgt || ' ', ' ' || b$i.merged || ' ')"
    }
    val bJoin = (1 to BPE_ROUNDS).map(i => s"b$i").mkString(", ")
    s"""WITH w0 AS (
       |  SELECT '  ' || array_to_string(
       |           list_transform(range(1, length(w) + 1),
       |                          i -> substr(w, i, 1)), '  ') || '  '
       |           AS sym,
       |         CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY 1
       |),
       |$rounds,
       |tok AS (
       |  SELECT doc_id, n_chars,
       |         CAST(len(string_split($appliedSql, '  ')) - 2 AS BIGINT)
       |           AS w_tokens
       |  FROM (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS w
       |        FROM documents),
       |       $bJoin
       |  WHERE length(w) > 0
       |)
       |SELECT doc_id, CAST(MAX(n_chars) AS BIGINT) AS n_chars,
       |       CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(w_tokens) AS BIGINT) AS n_tokens_bpe,
       |       CAST(MAX(n_chars) AS DOUBLE) / SUM(w_tokens)
       |         AS chars_per_token
       |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private val bpeFertilityOracle = {
    // the q121 scaffolding (trained rules replayed as CTEs, K-replace
    // apply) with lang carried, doc-grain rollup, then the lang rollup
    val rounds = (1 to BPE_ROUNDS).map { i =>
      s"""p$i AS (
         |  SELECT l[i] AS lft, l[i + 1] AS rgt,
         |         CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(sym, '  ') AS l, freq FROM w${i - 1}),
         |       unnest(range(2, len(l) - 1)) AS u(i)
         |  GROUP BY 1, 2
         |), b$i AS (
         |  SELECT lft, rgt, lft || rgt AS merged
         |  FROM p$i ORDER BY cnt DESC, lft, rgt LIMIT 1
         |), w$i AS (
         |  SELECT replace(sym, ' ' || b$i.lft || '  ' || b$i.rgt || ' ',
         |                 ' ' || b$i.merged || ' ') AS sym, freq
         |  FROM w${i - 1}, b$i
         |)""".stripMargin
    }.mkString(",\n")
    val appliedSql = (1 to BPE_ROUNDS).foldLeft(
      """'  ' || array_to_string(list_transform(range(1, length(w) + 1),
        |                        i -> substr(w, i, 1)), '  ') || '  '"""
        .stripMargin) { (acc, i) =>
      s"replace($acc, ' ' || b$i.lft || '  ' || b$i.rgt || ' ', ' ' || b$i.merged || ' ')"
    }
    val bJoin = (1 to BPE_ROUNDS).map(i => s"b$i").mkString(", ")
    s"""WITH w0 AS (
       |  SELECT '  ' || array_to_string(
       |           list_transform(range(1, length(w) + 1),
       |                          i -> substr(w, i, 1)), '  ') || '  '
       |           AS sym,
       |         CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY 1
       |),
       |$rounds,
       |tok AS (
       |  SELECT doc_id, lang, n_chars,
       |         CAST(len(string_split($appliedSql, '  ')) - 2 AS BIGINT)
       |           AS w_tokens
       |  FROM (SELECT doc_id, lang, n_chars,
       |               unnest(string_split(text, ' ')) AS w
       |        FROM documents),
       |       $bJoin
       |  WHERE length(w) > 0
       |), perdoc AS (
       |  SELECT doc_id, lang, CAST(MAX(n_chars) AS BIGINT) AS n_chars,
       |         CAST(COUNT(*) AS BIGINT) AS n_words,
       |         CAST(SUM(w_tokens) AS BIGINT) AS n_tokens_bpe
       |  FROM tok GROUP BY doc_id, lang
       |)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |       CAST(SUM(n_words) AS BIGINT) AS n_words,
       |       CAST(SUM(n_tokens_bpe) AS BIGINT) AS n_tokens_bpe,
       |       CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_tokens_bpe) AS DOUBLE)
       |         AS chars_per_token,
       |       CAST(SUM(n_tokens_bpe) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE)
       |         AS fertility
       |FROM perdoc GROUP BY lang ORDER BY lang""".stripMargin
  }

  private val bpeOracle = {
    // the same loop as chained CTEs: w0 = char-split vocab, each round
    // picks its best pair and rewrites the words for the next
    val rounds = (1 to BPE_ROUNDS).map { i =>
      s"""p$i AS (
         |  SELECT l[i] AS lft, l[i + 1] AS rgt,
         |         CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(sym, '  ') AS l, freq FROM w${i - 1}),
         |       unnest(range(2, len(l) - 1)) AS u(i)
         |  GROUP BY 1, 2
         |), b$i AS (
         |  SELECT CAST($i AS BIGINT) AS merge_rank, lft, rgt,
         |         lft || rgt AS merged, cnt
         |  FROM p$i ORDER BY cnt DESC, lft, rgt LIMIT 1
         |), w$i AS (
         |  SELECT replace(sym, ' ' || b$i.lft || '  ' || b$i.rgt || ' ',
         |                 ' ' || b$i.merged || ' ') AS sym, freq
         |  FROM w${i - 1}, b$i
         |)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to BPE_ROUNDS)
      .map(i => s"SELECT * FROM b$i").mkString("\nUNION ALL ")
    s"""WITH w0 AS (
       |  SELECT '  ' || array_to_string(
       |           list_transform(range(1, length(w) + 1),
       |                          i -> substr(w, i, 1)), '  ') || '  '
       |           AS sym,
       |         CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY 1
       |),
       |$rounds
       |SELECT merge_rank, lft AS "left", rgt AS "right", merged, cnt AS pair_count
       |FROM ($unions)
       |ORDER BY merge_rank""".stripMargin
  }

  // ---------------------------------------------------------------- q129

  /** q129: per-source distribution shift as TOTAL VARIATION distance —
    * TV(p_s, p) = ½ Σ_t |p_s(t) − p(t)| between each source's token
    * distribution and the corpus-wide one. The drift number a corpus-mix
    * owner watches: a source whose language suddenly changes (a crawl
    * gone wrong, a boilerplate flood) moves its TV before any downstream
    * metric does. TV instead of KL/JS because it needs NO log: with
    * p_s = c_st/T_s and p = C_t/T every |difference| term is the exact
    * integer |c_st·T − C_t·T_s|, the Σ is an order-independent BIGINT
    * sum, and the only float op is ONE final division by 2·T_s·T — the
    * q106/q122 "ranking math without the libm call" device applied to a
    * distance (KL would also blow up on the zero-count terms TV handles
    * natively).
    *
    * Terms the source never contains still carry mass |0 − p(t)| = C_t/T;
    * summing them needs no source×vocab grid: their numerator total is
    * T_s·(T − Σ_{t∈s} C_t), folded from the same per-source aggregate
    * (`cov`).
    *
    * 100 TB shape: ONE corpus scan → (source, term) hash agg (map-side
    * combining); the per-term corpus count is a count window over that
    * vocab-grain frame's term-keyed exchange (the q68 df device); the
    * per-source rollup reuses vocab-grain rows. Nothing after the first
    * agg is corpus-sized. Integer widths: every product is ≤ T_s·T
    * (~3.6e10 at sf0.1) — BIGINT-exact with 8 orders of headroom; a
    * corpus past ~4e9 tokens swaps the products to DECIMAL(38,0), same
    * contract. */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val st = docs(spark, dir)
      .select($"source", explode(split($"text", " ")).as("term"))
      .groupBy($"source", $"term")
      .agg(count(lit(1)).cast("long").as("c"))
      .persist()
    val withTot = st.withColumn("c_tot",
      sum($"c").over(Window.partitionBy($"term")).cast("long"))
    val totals = st.groupBy($"source").agg(sum($"c").cast("long").as("t_s"))
    val grand = totals.agg(sum($"t_s").cast("long").as("t_all"))
    withTot
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(grand))
      .withColumn("num", abs($"c" * $"t_all" - $"c_tot" * $"t_s"))
      .groupBy($"source", $"t_s", $"t_all")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum($"num").cast("long").as("present_num"),
        sum($"c_tot").cast("long").as("cov"))
      .withColumn("tv_num", $"present_num" + $"t_s" * ($"t_all" - $"cov"))
      .withColumn("tv", $"tv_num".cast("double") /
        ($"t_s" * $"t_all" * lit(2L)).cast("double"))
      .select($"source", $"t_s".as("n_tokens"), $"n_terms", $"tv_num", $"tv")
      .orderBy($"source")
  }

  private val divergenceOracle =
    s"""WITH st AS (
       |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
       |        FROM documents)
       |  GROUP BY 1, 2
       |), wt AS (
       |  SELECT source, term, c,
       |         CAST(SUM(c) OVER (PARTITION BY term) AS BIGINT) AS c_tot
       |  FROM st
       |), tot AS (
       |  SELECT source, CAST(SUM(c) AS BIGINT) AS t_s FROM st GROUP BY 1
       |), g AS (SELECT CAST(SUM(t_s) AS BIGINT) AS t_all FROM tot),
       |agg AS (
       |  SELECT wt.source, t_s, t_all,
       |         CAST(COUNT(*) AS BIGINT) AS n_terms,
       |         CAST(SUM(abs(c * t_all - c_tot * t_s)) AS BIGINT)
       |           AS present_num,
       |         CAST(SUM(c_tot) AS BIGINT) AS cov
       |  FROM wt JOIN tot ON wt.source = tot.source CROSS JOIN g
       |  GROUP BY 1, 2, 3
       |)
       |SELECT source, t_s AS n_tokens, n_terms,
       |       present_num + t_s * (t_all - cov) AS tv_num,
       |       CAST(present_num + t_s * (t_all - cov) AS DOUBLE)
       |         / CAST(t_s * t_all * 2 AS DOUBLE) AS tv
       |FROM agg ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q145

  /** Per-document bigram-LM perplexity — the REAL n-gram-LM quality
    * filter (the CCNet/FineWeb curation stage) that [[tokenTypicality]]
    * is the exact-arithmetic proxy for. A bigram model with add-one
    * smoothing is trained on the corpus itself and every document is
    * scored by its negative log-likelihood under that model:
    * P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁·)+V), nll = −Σᵢ ln P over the doc's
    * bigram positions, nll_per_tok = nll / n_bigrams (nats/token —
    * perplexity is its monotone exp, left presentational). Template/
    * duplicated prose scores low, frequency-tail junk scores high — the
    * standard keep-band filter reads both tails.
    *
    * Cross-engine float contract — NO LIBM ANYWHERE (the decisive
    * finding, measured before this operator was registered: JVM
    * `Math.log` vs glibc/DuckDB `ln` mismatches 0.14% of a 2.1M-rational
    * sweep, `Math.exp` 0.24%, and Spark's `log` codegen actually calls
    * `StrictMath.log`, 1.3% off glibc — a libm-backed score is a latent
    * hash mismatch that passes on lucky corpora; this one FAILED the
    * sf0.01 oracle on 52 cells before the rewrite). Instead each
    * position's lp is [[graft.functions.PinnedMath.lnRatioSql]]: a pinned
    * chain of exact-integer range reduction + a 20-term atanh Horner
    * series in pure `+ − × ÷` doubles, ONE SHARED SQL TEXT evaluated
    * verbatim by Spark and DuckDB — IEEE basic ops are correctly rounded
    * by spec, so the bits match by construction. The per-doc sum is an
    * ORDER-FREE fixed-point SUM (the q149/q153 device): each position's
    * lp is lifted onto the 1e-12 integer grid — floor(lp·1e12 + 0.5),
    * identical in both engines — and summed as exact DECIMAL(38,0);
    * integer addition is associative + commutative, so the engines'
    * differing partial-aggregation orders cannot matter and Spark plans
    * a HASH aggregation (the previous order-pinned float fold
    * `aggregate(array_sort(collect_list(...)))` forced a sort-based
    * aggregation materializing every per-doc list — the measured q153
    * 1000× spill cliff, same shape). An unordered FLOAT sum would still
    * be wrong (float addition is not associative); the quantized integer
    * sum sidesteps it, perturbing nll by ≤ 0.5e-12 per position — the
    * documented scoring function IS this quantized sum.
    *
    * 100 TB shape: honest TWO-PASS train/score (q107's documented
    * 2-scan design floor — a production run trains on a sample or a
    * stored model artifact and scores in one pass). Pass 1 collapses the
    * corpus to the DISTINCT-BIGRAM-grain model via one map-side-combined
    * hash agg; the context total c(w₁·) is a sum window over that
    * vocab-grain frame (never a corpus re-scan) and V rolls up from the
    * same frame as a 1-row broadcast. Pass 2 joins the corpus bigram
    * stream to the model on (w₁,w₂) — broadcastable while the model fits,
    * shuffle-keyed by bigram beyond that — and the doc-grain rollup is
    * the only other corpus-sized exchange. Per-position floats never
    * cross an exchange unaggregated except inside the doc-keyed rollup
    * that consumes them. */
  /** Corpus bigram stream (doc_id, pos, w1, w2) from a documents-shaped
    * frame — one projection + one explode, shared by q145 and q148. */
  private def bigramFrame(docsDf: DataFrame): DataFrame = {
    val s = docsDf.sparkSession
    import s.implicits._
    docsDf
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> " +
          "struct(i AS pos, ws[i-1] AS w1, ws[i] AS w2))")).as("b"))
      .select($"doc_id", $"b.pos".as("pos"), $"b.w1".as("w1"),
        $"b.w2".as("w2"))
  }

  /** Distinct-bigram-grain counts (w1, w2, c2) — THE model artifact: a
    * sum-mergeable summary (counts(A∪B) = key-merge summed counts), the
    * property q148's incremental maintenance rests on. */
  private def bigramCounts(bg: DataFrame): DataFrame = {
    val s = bg.sparkSession
    import s.implicits._
    bg.groupBy($"w1", $"w2").agg(count(lit(1)).cast("long").as("c2"))
  }

  /** Add-one-smoothed scoring surface over a (w1, w2, c2) model frame:
    * context totals c1 as a sum window (vocab-grain, never a corpus
    * re-scan), vocab V from the model's own key set as a 1-row
    * broadcast, and the pinned libm-free lp — evaluated at MODEL grain,
    * once per distinct bigram, never per corpus position. */
  private def scoreModel(model: DataFrame): DataFrame = {
    val s = model.sparkSession
    import s.implicits._
    val withC1 = model.withColumn("c1",
      sum($"c2").over(Window.partitionBy($"w1")).cast("long"))
    // model vocab: distinct tokens seen in any bigram slot — derived from
    // the vocab-grain model frame, not another corpus pass (a 1-token doc
    // contributes no bigram and needs no smoothing mass; pinned in both
    // engines by construction)
    val vocab = model.select($"w1".as("w"))
      .union(model.select($"w2".as("w")))
      .agg(countDistinct($"w").cast("long").as("v"))
    withC1.crossJoin(broadcast(vocab))
      .withColumn("la", ($"c2" + 1).cast("long"))
      .withColumn("lb", ($"c1" + $"v").cast("long"))
      .withColumn("lp",
        expr(graft.functions.PinnedMath.lnRatioSql("la", "lb")))
      .select($"w1", $"w2", $"c2", $"c1", $"lp")
  }

  def bigramPerplexity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def bigrams = bigramFrame(docs(spark, dir))
    // Persisted at DISTINCT-BIGRAM grain (the model artifact): the vocab
    // rollup and the scoring join both consume it, and their differing
    // column pruning defeats exchange reuse — without the cache each
    // re-derives the corpus explode (3 documents scans measured; the
    // q108 persist precedent, harness clears the cache per query).
    val model = graft.Caches.track(s"terms.bigramModel:$dir",
      bigramCounts(bigrams))
    val scored = scoreModel(model).select($"w1", $"w2", $"c2", $"lp")
    bigrams.join(scored, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        // c2 = 1 ⇔ this occurrence is the bigram's ONLY one corpus-wide:
        // the doc's novel-continuation count (novelty evidence for free)
        count(when($"c2" === 1L, lit(1))).cast("long").as("n_singleton"),
        // order-free 1e-12 fixed-point lift + exact integer SUM → hash
        // aggregation, no per-doc list (see class doc)
        sum(expr("CAST(floor(lp * 1e12 + 0.5) AS DECIMAL(38,0))"))
          .as("sum_fx"))
      .withColumn("nll", -(expr("CAST(sum_fx AS DOUBLE) / 1e12")))
      .withColumn("nll_per_tok", $"nll" / $"n_bigrams")
      .select($"doc_id", $"n_bigrams", $"n_singleton", $"nll",
        $"nll_per_tok")
      .orderBy($"doc_id")
  }

  private val perplexityOracle =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2
       |), bg AS (
       |  SELECT doc_id, b.pos AS pos, b.w1 AS w1, b.w2 AS w2
       |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
       |          i -> {'pos': i, 'w1': ws[i], 'w2': ws[i + 1]})) AS b
       |        FROM t)
       |), model AS (
       |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
       |  FROM bg GROUP BY 1, 2
       |), m2 AS (
       |  SELECT w1, w2, c2,
       |         CAST(SUM(c2) OVER (PARTITION BY w1) AS BIGINT) AS c1
       |  FROM model
       |), v AS (
       |  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM
       |    (SELECT w1 AS w FROM model UNION SELECT w2 AS w FROM model)
       |), m3 AS (
       |  SELECT w1, w2, c2, CAST(c2 + 1 AS BIGINT) AS la,
       |         CAST(c1 + v.v AS BIGINT) AS lb
       |  FROM m2 CROSS JOIN v
       |), m4 AS (
       |  SELECT w1, w2, c2,
       |         ${graft.functions.PinnedMath.lnRatioSql("la", "lb")} AS lp
       |  FROM m3
       |), s AS (
       |  SELECT bg.doc_id, bg.pos, m4.c2, m4.lp
       |  FROM bg JOIN m4 ON bg.w1 = m4.w1 AND bg.w2 = m4.w2
       |), d AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |         CAST(COUNT(CASE WHEN c2 = 1 THEN 1 END) AS BIGINT)
       |           AS n_singleton,
       |         -(CAST(SUM(CAST(floor(lp * 1e12 + 0.5) AS DECIMAL(38,0)))
       |             AS DOUBLE) / 1e12) AS nll
       |  FROM s GROUP BY 1
       |)
       |SELECT doc_id, n_bigrams, n_singleton, nll,
       |       nll / n_bigrams AS nll_per_tok
       |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q148

  private val liveModelDir =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** T1 for the q145 LM: incremental MODEL maintenance. Bigram counts
    * are a SUM-MERGEABLE summary — counts(A∪B) = key-merge of summed
    * counts — so maintaining the model needs the stored artifact
    * (distinct-bigram grain, the whole persisted state) plus ONE scan of
    * the arriving batch, never a corpus rescan. The context totals c1,
    * the vocab V and every smoothed lp are then RE-DERIVED from the
    * merged frame — the part a naive "only touched bigrams change"
    * increment gets wrong: a batch that adds vocabulary changes V and
    * with it EVERY bigram's smoothed probability (TermsSpec pins exactly
    * that boundary). The driver oracle is the FULL-CORPUS model
    * recompute, so the merge identity is proven per round (the q134
    * HLL-max / q142 rank-cap discipline, applied to sum-merge); output
    * is the scored model surface (w1, w2, c2, c1, lp) q145's score pass
    * consumes.
    *
    * 100 TB shape: increment cost is batch-sized + a model-sized
    * artifact read; the registered plan scans `documents` once (the
    * batch leg — 1-scan budget-pinned); everything after the merge is
    * vocab-grain. Cited split: max(doc_id)·4/5 mirrors q134/q142's
    * stored/batch carve. */
  def bigramModelIncrement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = docs(spark, dir)
    val cut = corpus.agg(expr("max(doc_id) * 4 div 5")).head().getLong(0)
    val sk = java.nio.file.Files
      .createTempDirectory("graft_q148_model").toString
    Option(liveModelDir.getAndSet(sk)).foreach { old =>
      val p = java.nio.file.Paths.get(old)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    // setup: the stored model artifact, as a prior load would have left it
    bigramCounts(bigramFrame(corpus.filter($"doc_id" < cut)))
      .write.mode("overwrite").parquet(s"$sk/q148_model")
    val batch = bigramCounts(bigramFrame(corpus.filter($"doc_id" >= cut)))
    // Persisted at merged-model grain: scoreModel consumes the frame
    // three ways (c1 window, two vocab legs) — without the cache each
    // re-derives the batch scan (the q145 persist rationale).
    val merged = graft.Caches.track(s"terms.bigramModelInc:$dir",
      spark.read.parquet(s"$sk/q148_model").union(batch)
        .groupBy($"w1", $"w2").agg(sum($"c2").cast("long").as("c2")))
    scoreModel(merged).orderBy($"w1", $"w2")
  }

  /** Oracle = the FULL-CORPUS model recompute: stored ⊎ batch merge must
    * be indistinguishable from never having split the corpus. */
  private val modelIncrementOracle =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2
       |), bg AS (
       |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2
       |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
       |          i -> {'pos': i, 'w1': ws[i], 'w2': ws[i + 1]})) AS b
       |        FROM t)
       |), model AS (
       |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
       |  FROM bg GROUP BY 1, 2
       |), m2 AS (
       |  SELECT w1, w2, c2,
       |         CAST(SUM(c2) OVER (PARTITION BY w1) AS BIGINT) AS c1
       |  FROM model
       |), v AS (
       |  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM
       |    (SELECT w1 AS w FROM model UNION SELECT w2 AS w FROM model)
       |), m3 AS (
       |  SELECT w1, w2, c2, c1, CAST(c2 + 1 AS BIGINT) AS la,
       |         CAST(c1 + v.v AS BIGINT) AS lb
       |  FROM m2 CROSS JOIN v
       |)
       |SELECT w1, w2, c2, c1,
       |       ${graft.functions.PinnedMath.lnRatioSql("la", "lb")} AS lp
       |FROM m3 ORDER BY w1, w2""".stripMargin

  // ---------------------------------------------------------------- q150

  /** Heaps-law vocabulary-growth curve: distinct terms seen vs tokens
    * ingested, at data-decile grain — the mix owner's "what does the next
    * decade of data buy in vocabulary" number (Heaps 1978: V(n) ≈ K·n^β;
    * a flattening curve says more of the SAME source adds tokens, not
    * coverage — the argument for source diversification that q143's
    * per-doc novelty and q144's per-source exclusivity make at finer
    * grains). Deciles carve the dense doc_id keyspace directly
    * (bucket = doc_id·10 div (max_id+1) — the generator writes ids
    * 0..n−1, pinned by TESTDATA; a sparse keyspace swaps in the
    * documented Scale.prefixSum ranking, same contract): each term's
    * FIRST bucket is a min aggregate, so "new vocabulary per decile"
    * needs no ordered scan and no global row_number over the corpus.
    * All counts are exact integers.
    *
    * 100 TB shape: ONE documents scan (cached base: the decile rollup
    * and the term explode both consume it — budget-pinned); the term
    * frame collapses to vocab grain via one map-side-combined min agg;
    * everything after is DECILE-grain (10 rows — the cumulative window
    * is the q08 single-partition-over-aggregate class at fixed size). */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = graft.Caches.track(s"terms.vocabGrowthBase:$dir",
      docs(spark, dir).select($"doc_id", split($"text", " ").as("ws")))
    val mx = base.agg((max($"doc_id") + 1L).as("n_keys"))
    val bucketed = base.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("(doc_id * 10) div n_keys").cast("long"))
    val perBucket = bucketed.groupBy($"bucket")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(size($"ws")).cast("long").as("n_tokens"))
    val firstSeen = bucketed
      .select($"bucket", explode($"ws").as("term"))
      .groupBy($"term").agg(min($"bucket").as("fb"))
      .groupBy($"fb".as("bucket"))
      .agg(count(lit(1)).cast("long").as("new_terms"))
    val w = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(firstSeen, Seq("bucket"), "left")
      .withColumn("new_terms", coalesce($"new_terms", lit(0L)).cast("long"))
      .withColumn("docs_cum", sum($"n_docs").over(w).cast("long"))
      .withColumn("tokens_cum", sum($"n_tokens").over(w).cast("long"))
      .withColumn("vocab_cum", sum($"new_terms").over(w).cast("long"))
      .select($"bucket", $"n_docs", $"n_tokens", $"new_terms",
        $"docs_cum", $"tokens_cum", $"vocab_cum")
      .orderBy($"bucket")
  }

  private val vocabGrowthOracle =
    s"""WITH base AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |), mx AS (SELECT MAX(doc_id) + 1 AS n_keys FROM base),
       |b AS (
       |  SELECT doc_id, ws,
       |         CAST((doc_id * 10) // n_keys AS BIGINT) AS bucket
       |  FROM base CROSS JOIN mx
       |), d AS (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(len(ws)) AS BIGINT) AS n_tokens
       |  FROM b GROUP BY 1
       |), ft AS (
       |  SELECT term, MIN(bucket) AS fb
       |  FROM (SELECT bucket, unnest(ws) AS term FROM b) GROUP BY 1
       |), nv AS (
       |  SELECT fb AS bucket, CAST(COUNT(*) AS BIGINT) AS new_terms
       |  FROM ft GROUP BY 1
       |)
       |SELECT d.bucket, n_docs, n_tokens,
       |       CAST(COALESCE(new_terms, 0) AS BIGINT) AS new_terms,
       |       CAST(SUM(n_docs) OVER (ORDER BY d.bucket
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS docs_cum,
       |       CAST(SUM(n_tokens) OVER (ORDER BY d.bucket
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS tokens_cum,
       |       CAST(SUM(COALESCE(new_terms, 0)) OVER (ORDER BY d.bucket
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS vocab_cum
       |FROM d LEFT JOIN nv ON d.bucket = nv.bucket
       |ORDER BY d.bucket""".stripMargin

  val all: Seq[Query] = Seq(
    Query("q64_repetition_signals",
      "Gopher-style repetition filters: duplicate-token and top n-gram char fractions per doc",
      repetitionSignals, Some(repetitionOracle), headline = false),
    Query("q68_distinctive_terms",
      "top-5 distinctive terms per doc, exact-rank TF-IDF (tf desc, df asc)",
      distinctiveTerms, Some(distinctiveOracle), headline = false),
    Query("q76_context_chunks",
      "context-length chunking: 32-token windows at stride 24 with deterministic (doc, idx) identity",
      chunkDocs, Some(chunkOracle), headline = false),
    Query("q106_collocations",
      "top-50 bigram collocations by exact-ratio lift (PMI ranking without the log)",
      collocations, Some(collocationsOracle), headline = false),
    Query("q107_vocab_coverage",
      "top-V vocabulary build + per-stratum OOV token rate (tokenizer coverage gate)",
      vocabCoverage, Some(vocabCoverageOracle), headline = false),
    Query("q108_token_typicality",
      "per-doc corpus-typicality score (unigram-LM perplexity proxy, exact arithmetic)",
      tokenTypicality, Some(typicalityOracle), headline = false),
    Query("q120_bpe_merges",
      "BPE merge training: 6 greedy most-frequent-pair rounds at vocab grain, pinned tie-breaks",
      bpeMerges, Some(bpeOracle), headline = false),
    Query("q121_bpe_tokenize",
      "BPE apply: tokenize with the just-trained ruleset, per-doc token accounting + compression ratio",
      bpeTokenize, Some(bpeTokenizeOracle), headline = false),
    Query("q160_bpe_fertility",
      "tokenizer fertility per language: subword tokens per word + chars per token off q121's doc-grain core - the token-budget fairness read",
      bpeFertility, Some(bpeFertilityOracle), headline = false),
    Query("q129_source_divergence",
      "per-source total-variation distance of token distributions vs the corpus (exact integer numerators, one final division)",
      sourceDivergence, Some(divergenceOracle), headline = false),
    Query("q145_bigram_perplexity",
      "per-doc bigram-LM perplexity quality filter (add-one smoothing, libm-free pinned ln chain + order-pinned fold, bit-exact vs DuckDB)",
      bigramPerplexity, Some(perplexityOracle), headline = false),
    Query("q148_bigram_model_increment",
      "incremental LM-model maintenance: stored counts + one batch scan, sum-merged; oracle = full-corpus recompute",
      bigramModelIncrement, Some(modelIncrementOracle), headline = false),
    Query("q150_vocab_growth",
      "Heaps-law vocabulary-growth curve: new distinct terms per data decile, exact integers, decile-grain output",
      vocabGrowth, Some(vocabGrowthOracle), headline = false))
}
