package graft.ops

import graft.{Caches, Query, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based document classification — the supervised complement of the
  * q145 LM-perplexity filter. Every production curation stack runs a
  * trained classifier as a quality/domain gate (the CCNet/fastText
  * "looks like Wikipedia" filter, FineWeb-Edu's quality scorer, domain
  * routers for mix construction); the reference has no analog (its text
  * surface ends at notes columns) but the builder brief makes
  * training-data operators first-class. A multinomial Naive Bayes with
  * add-one smoothing is the canonical exact-arithmetic representative of
  * that family: the training step IS a token-count aggregation (the same
  * sum-mergeable summary class as the q145/q148 LM — a linear scan, no
  * iterative optimizer), and scoring is a log-linear sum, so the whole
  * train→classify→evaluate lifecycle carries a full DuckDB oracle where a
  * gradient-trained model could not.
  *
  * Three consumers of ONE scoring pipeline ([[scoredBest]] — shared so
  * predictions, the evaluation report and the mislabel audit can never
  * disagree, the q60/q138 discipline):
  *  - q149: out-of-sample per-doc predictions on the deterministic
  *    `doc_id % 5` 80/20 carve (the q148 stored/batch class) — train on
  *    ≠0, score the held-out 0 class;
  *  - q152: the confusion matrix of exactly those predictions — the
  *    artifact a gate owner reads before trusting the filter;
  *  - q153: the label-consistency audit (Northcutt et al.'s confident-
  *    learning move, public): train on ALL rows, score every row
  *    IN-SAMPLE, and surface docs whose recorded `lang` the corpus-wide
  *    model itself rejects, ranked by ln-odds margin — the standard
  *    label-noise screen run before trusting provider metadata.
  *
  * Task: predict `lang` from token counts (5 classes — the label a real
  * pipeline's fastText lang-ID stage predicts; q24's n-gram heuristic is
  * the rule-based version of the same gate).
  *
  * Cross-engine float contract (the q145 discipline): NO LIBM. Every log
  * in the score — the class prior ln(N_c/N), the seen-term
  * lp = ln((c_ct+1)/(T_c+V)) and the unseen-term default ln(1/(T_c+V)) —
  * is [[graft.functions.PinnedMath.lnRatioSql]], one shared SQL text both
  * engines evaluate verbatim. Per-(doc, class) accumulation is an
  * ORDER-FREE fixed-point SUM: each contribution (contrib = lp · n, one
  * correctly rounded product) is lifted onto the 1e-12 integer grid —
  * floor(contrib·1e12 + 0.5), identical in both engines because ×, +,
  * floor on doubles are correctly rounded/exact — and the per-group
  * reduction is an exact DECIMAL(38,0) integer SUM, associative and
  * commutative, so NO ordering pin is needed and Spark plans a hash
  * aggregation (the round-14 order-pinned float fold forced a sort-based
  * aggregation that spilled unboundedly at 1000× scale). The score
  * re-scales once (CAST(Σ AS DOUBLE)/1e12, one correctly rounded
  * division) and adds the prior; each lift perturbs the float score by
  * ≤ 0.5·ulp(contrib·1e12)/1e12 — exactly 0.5e-12 while |contrib| ≤
  * ~9e3 (contrib·1e12 inside 2^53, where the grid is resolved at
  * integer ulp), growing with the double's ulp beyond that (≈1e-9 near
  * the BIGINT edge); cross-engine BIT-IDENTITY is unaffected at any
  * magnitude because both engines compute the identical doubles
  * (round-15 ADVICE: the earlier flat 0.5e-12 claim over the whole
  * domain was wrong past 2^53). The scoring function is DOCUMENTED as
  * this quantized sum, not as the float sum it approximates. Domain
  * bound: |contrib|·1e12 must stay inside BIGINT (|lp·n| < 9.2e6 —
  * holds for any real doc: |lp| ≤ ~40 even at web-scale vocab and n is
  * one term's count in ONE doc; real contribs also sit well inside the
  * ~9e3 exact-grid region). Bit-identical scores make
  * the argmax — and therefore the prediction, the confusion matrix and
  * the audit ranking — identical by construction; ties (equal doubles,
  * impossible in practice) break by class name ascending via the shared
  * (score DESC, cls ASC) rank.
  *
  * 100 TB shape: ONE documents scan collapses to the persisted
  * (doc, lang, term, n) doc-term frame (the q145 model-persist
  * rationale — train aggregation, priors and the scoring stream all
  * consume it; budget-pinned). The model is (class × vocab)-grain —
  * dimension-sized, broadcast into the scoring join while it fits and
  * term-keyed beyond (the q145 model-join contract); context totals T_c
  * are a sum window over the model frame (the q68 device), V and the
  * priors are 1-row/class-row broadcasts. Scoring work is
  * |scored doc-term| × C rows — linear in the corpus with C a
  * dimension — and the only corpus-sized exchanges are the doc-term
  * hash agg and the doc-keyed rollup. The heavy pinned-ln chain runs at
  * MODEL grain (once per class×term), never per corpus position. q152's
  * rollup is C×C-grain on top of q149's stream; q153 adds one
  * doc-keyed-frame self-alignment (the label row rides the same window
  * partition as the argmax — no extra exchange).
  */
object Classify {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Holdout carve: doc_id % HOLDOUT_MOD == 0 is scored, the rest trains
    * (q149/q152). q153 trains and scores on everything. */
  val HOLDOUT_MOD = 5L

  /** Per-(scored doc, class) NB scores + the per-doc argmax surface:
    * columns (doc_id, label, cls, score, rk, nxt, lbl_score) where rk
    * ranks (score DESC, cls ASC) within the doc, nxt is the runner-up
    * score and lbl_score the score of the doc's RECORDED label — computed
    * with window functions over the one doc-keyed exchange, no join-back.
    * `trainSide`/`scoreSide` carve the persisted doc-term frame. */
  private def scoredBest(spark: SparkSession, dir: String,
      trainSide: Column => Column, scoreSide: Column => Column,
      cacheTag: String): DataFrame = {
    import spark.implicits._
    // ONE corpus scan → doc-term grain, persisted: the train counts, the
    // priors and the scoring stream are three consumers whose differing
    // column pruning would otherwise re-derive the scan (q145 rationale).
    val dt = Caches.track(s"classify.docTerms:$cacheTag:$dir",
      docs(spark, dir)
        .select($"doc_id", $"lang", explode(split($"text", " ")).as("term"))
        .groupBy($"doc_id", $"lang", $"term")
        .agg(count(lit(1)).cast("long").as("n")))
    val train = dt.filter(trainSide($"doc_id"))
    val score = dt.filter(scoreSide($"doc_id"))

    // model counts at (class, term) grain; T_c as a sum window over the
    // model frame (vocab-grain — never a corpus re-scan), V from the
    // model's own key set as a 1-row broadcast.
    val ct = train.groupBy($"lang".as("cls"), $"term")
      .agg(sum($"n").cast("long").as("c_ct"))
    val ct2 = ct.withColumn("t_c",
      sum($"c_ct").over(Window.partitionBy($"cls")).cast("long"))
    val vocab = ct.agg(countDistinct($"term").cast("long").as("v"))

    // class surface: prior ln(N_c/N) + the unseen-term default
    // ln(1/(T_c+V)) — C rows, broadcast.
    val prior = train.select($"doc_id", $"lang").distinct()
      .groupBy($"lang".as("cls"))
      .agg(count(lit(1)).cast("long").as("n_c"))
    val nAll = prior.agg(sum($"n_c").cast("long").as("n_all"))
    val classes = ct2.groupBy($"cls").agg(max($"t_c").as("t_c"))
      .join(prior, "cls")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(nAll))
      .withColumn("one", lit(1L))
      .withColumn("lb", ($"t_c" + $"v").cast("long"))
      .withColumn("lp0",
        expr(graft.functions.PinnedMath.lnRatioSql("one", "lb")))
      .withColumn("lp_prior",
        expr(graft.functions.PinnedMath.lnRatioSql("n_c", "n_all")))
      .select($"cls", $"lp0", $"lp_prior")

    // scored model surface: lp = ln((c_ct+1)/(T_c+V)) at (class, term)
    // grain — the pinned chain runs once per model cell.
    val model = ct2.crossJoin(broadcast(vocab))
      .withColumn("la", ($"c_ct" + 1L).cast("long"))
      .withColumn("lb", ($"t_c" + $"v").cast("long"))
      .withColumn("lp",
        expr(graft.functions.PinnedMath.lnRatioSql("la", "lb")))
      .select($"cls", $"term", $"lp")

    // scored stream × classes, model-joined; unseen terms take the class
    // default. contrib = lp · n is one correctly rounded product. classes
    // is C rows — always broadcast; the model is (class × vocab)-grain and
    // carries NO hint: Spark's size estimate / AQE broadcasts it while it
    // fits and falls back to a (cls, term)-keyed shuffle join beyond — a
    // forced hint here would be a driver-OOM bet at web-scale vocab.
    val cand = score.select($"doc_id", $"lang".as("label"), $"term", $"n")
      .crossJoin(broadcast(classes))
      .join(model, Seq("cls", "term"), "left")
      .withColumn("contrib", coalesce($"lp", $"lp0") * $"n".cast("double"))

    // ORDER-FREE fixed-point accumulation (see class doc). The round-14
    // version order-pinned a float fold (aggregate(array_sort(
    // collect_list(...)))), which forced Spark into a sort-based
    // aggregation materializing every per-(doc, class) term list — it
    // spilled past a 77 GB ceiling at 1000× corpus scale. Lifting each
    // contribution onto the 1e-12 integer grid makes the per-group
    // reduction an integer SUM: associative + commutative, so it runs as
    // a HASH aggregation with map-side partials and no list, and DuckDB's
    // SUM of the same lifted values matches bit-for-bit with no ordering
    // clause (the Ann decimal-dot device, applied to log space).
    val scored = cand
      .withColumn("fx",
        expr("CAST(floor(contrib * 1e12 + 0.5) AS DECIMAL(38,0))"))
      .groupBy($"doc_id", $"label", $"cls", $"lp_prior")
      .agg(sum($"fx").as("sum_fx"))
      .withColumn("score",
        $"lp_prior" + expr("CAST(sum_fx AS DOUBLE) / 1e12"))

    val w = Window.partitionBy($"doc_id")
      .orderBy($"score".desc, $"cls".asc)
    val wd = Window.partitionBy($"doc_id")
    scored
      .withColumn("rk", row_number().over(w))
      .withColumn("nxt", lead($"score", 1).over(w))
      // the recorded label's own score, aligned without a join-back: a
      // max over the same doc partition of (score when cls = label)
      .withColumn("lbl_score",
        max(when($"cls" === $"label", $"score")).over(wd))
      .select($"doc_id", $"label", $"cls", $"score", $"rk", $"nxt",
        $"lbl_score")
  }

  // ---------------------------------------------------------------- q149

  def nbLangClassifier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scoredBest(spark, dir,
      id => id % HOLDOUT_MOD =!= 0L, id => id % HOLDOUT_MOD === 0L, "split")
      .filter($"rk" === 1)
      .select($"doc_id", $"label", $"cls".as("pred"), $"score",
        ($"score" - $"nxt").as("margin"),
        ($"cls" === $"label").cast("int").as("correct"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- q152

  /** Confusion matrix of q149's holdout predictions: one row per
    * non-empty (label, pred) cell. Marginals (per-class recall/precision,
    * overall accuracy) all derive from these cells; emitting the cells
    * keeps the output C×C-bounded and the oracle single-grained. */
  def nbConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scoredBest(spark, dir,
      id => id % HOLDOUT_MOD =!= 0L, id => id % HOLDOUT_MOD === 0L, "split")
      .filter($"rk" === 1)
      .groupBy($"label", $"cls".as("pred"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .orderBy($"label", $"pred")
  }

  // ---------------------------------------------------------------- q153

  /** Label-consistency audit (confident learning, Northcutt et al. 2021,
    * public): train on the WHOLE corpus, score every document in-sample,
    * and emit the documents whose recorded label the model rejects —
    * pred ≠ label — with the evidence ranked by ln-odds margin
    * score(pred) − score(label) (how strongly the corpus-wide token
    * distribution prefers the predicted class over the recorded one).
    * The high-margin head of this list is where mislabeled provider
    * metadata lives; it is read before q71/q65 trust `lang` as a
    * sampling stratum. */
  def labelAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scoredBest(spark, dir, _ => lit(true), _ => lit(true), "all")
      .filter($"rk" === 1 && $"cls" =!= $"label")
      .select($"doc_id", $"label", $"cls".as("pred"),
        $"score".as("score_pred"), $"lbl_score".as("score_label"),
        ($"score" - $"lbl_score").as("margin"))
      .orderBy($"margin".desc, $"doc_id")
  }

  // ---------------------------------------------------------------- q156

  /** Margin-bin width for [[nbCalibration]] (the margin is an
    * unnormalized ln-odds, so bins are in nats; 5-nat bins split the
    * fixture's margins non-trivially). */
  val CALIB_BIN_W = 5.0

  /** Reliability/calibration report over q149's holdout predictions: bin
    * the argmax ln-odds margin (score of the winner minus the runner-up)
    * into fixed [[CALIB_BIN_W]]-nat bins capped at bin 9, and report
    * per-bin document count, correct count and accuracy. This is the
    * report read BEFORE using the classifier's confidence as a
    * quality-filter threshold (q25/q62's consumers): a well-calibrated
    * model shows accuracy rising monotonically with margin, and the bin
    * where accuracy crosses the pipeline's tolerance IS the filter
    * threshold. Binning is floor of one correctly rounded division on
    * the already-pinned double margin; counts are exact integers;
    * accuracy is one double division — everything bit-replayable.
    *
    * 100 TB shape: rides q149's stream (one documents scan via the
    * persisted doc-term frame); the rollup is 10 rows. */
  def nbCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scoredBest(spark, dir,
      id => id % HOLDOUT_MOD =!= 0L, id => id % HOLDOUT_MOD === 0L, "split")
      .filter($"rk" === 1)
      .withColumn("bin",
        least(lit(9L), floor(($"score" - $"nxt") / CALIB_BIN_W)
          .cast("long")))
      .groupBy($"bin")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        count(when($"cls" === $"label", lit(1))).cast("long")
          .as("n_correct"))
      .withColumn("acc",
        $"n_correct".cast("double") / $"n_docs".cast("double"))
      .orderBy($"bin")
  }

  // ---------------------------------------------------------------- q157

  private val liveNbModelDir =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** T1 for the q149 classifier: incremental MODEL maintenance — the
    * q148 discipline applied to the NB artifact. Both halves of the
    * model are SUM-MERGEABLE summaries: (class, term) occurrence counts
    * and per-class document counts merge by key-summed union, so
    * maintenance needs the stored artifacts plus ONE scan of the
    * arriving batch, never a corpus rescan. Context totals T_c, vocab V,
    * doc total N and every smoothed lp / prior / unseen-default are then
    * RE-DERIVED from the merged frames — the V-shift and N-shift that a
    * "only touched cells change" increment gets wrong (a batch that adds
    * vocabulary or documents changes EVERY cell's smoothed probability;
    * ClassifySpec pins the boundary). The driver oracle is the
    * FULL-CORPUS recompute, so the merge identity is proven per round.
    * Output is the complete serving surface at (class, term) grain with
    * the class columns alongside: exactly what [[scoredBest]]'s scoring
    * join consumes.
    *
    * 100 TB shape: increment cost is batch-sized + model-sized artifact
    * reads; the registered plan scans `documents` once (the batch leg);
    * everything after the merge is model-grain. Split: max(doc_id)·4/5,
    * the q134/q142/q148 stored/batch carve. */
  def nbModelIncrement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = docs(spark, dir)
    val cut = corpus.agg(expr("max(doc_id) * 4 div 5")).head().getLong(0)
    val sk = java.nio.file.Files
      .createTempDirectory("graft_q157_model").toString
    Option(liveNbModelDir.getAndSet(sk)).foreach { old =>
      val p = java.nio.file.Paths.get(old)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    // setup: the stored artifacts, as a prior load would have left them
    nbTermCounts(corpus.filter($"doc_id" < cut))
      .write.mode("overwrite").parquet(s"$sk/q157_terms")
    nbPriorCounts(corpus.filter($"doc_id" < cut))
      .write.mode("overwrite").parquet(s"$sk/q157_prior")
    // ONE batch scan feeds both merges (persisted batch projection)
    val batch = graft.Caches.track(s"classify.nbIncBatch:$dir",
      corpus.filter($"doc_id" >= cut).select($"doc_id", $"lang", $"text"))
    val ct = graft.Caches.track(s"classify.nbIncModel:$dir",
      nbMergeTerms(spark.read.parquet(s"$sk/q157_terms"), batch))
    val prior = nbMergePrior(spark.read.parquet(s"$sk/q157_prior"), batch)
    nbServingSurface(ct, prior)
  }

  /** The two sum-mergeable model halves (shared by q157's batch
    * increment and [[graft.streaming.StreamingNbModel]]'s maintain
    * loop, so the paths cannot drift): per-(class, term) token counts
    * and per-class document counts. */
  private[graft] def nbTermCounts(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select($"lang".as("cls"), explode(split($"text", " ")).as("term"))
      .groupBy($"cls", $"term").agg(count(lit(1)).cast("long").as("c_ct"))
  }
  private[graft] def nbPriorCounts(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy($"lang".as("cls")).agg(count(lit(1)).cast("long").as("n_c"))
  }

  /** Key-summed union merges — the T1 fold for each half. */
  private[graft] def nbMergeTerms(stored: DataFrame,
      batch: DataFrame): DataFrame = {
    import stored.sparkSession.implicits._
    stored.union(nbTermCounts(batch))
      .groupBy($"cls", $"term").agg(sum($"c_ct").cast("long").as("c_ct"))
  }
  private[graft] def nbMergePrior(stored: DataFrame,
      batch: DataFrame): DataFrame = {
    import stored.sparkSession.implicits._
    stored.union(nbPriorCounts(batch))
      .groupBy($"cls").agg(sum($"n_c").cast("long").as("n_c"))
  }

  /** The complete serving surface derived from the two merged halves —
    * V, T_c, N and every smoothed lp / prior / unseen-default RE-DERIVED
    * (the V-shift and N-shift a cell-local increment gets wrong). */
  private[graft] def nbServingSurface(ct: DataFrame,
      prior: DataFrame): DataFrame = {
    import ct.sparkSession.implicits._
    val vocab = ct.agg(countDistinct($"term").cast("long").as("v"))
    val nAll = prior.agg(sum($"n_c").cast("long").as("n_all"))
    ct.withColumn("t_c",
        sum($"c_ct").over(Window.partitionBy($"cls")).cast("long"))
      .crossJoin(broadcast(vocab))
      .join(broadcast(prior), "cls")
      .crossJoin(broadcast(nAll))
      .withColumn("one", lit(1L))
      .withColumn("la", ($"c_ct" + 1L).cast("long"))
      .withColumn("lb", ($"t_c" + $"v").cast("long"))
      .withColumn("lp",
        expr(graft.functions.PinnedMath.lnRatioSql("la", "lb")))
      .withColumn("lp0",
        expr(graft.functions.PinnedMath.lnRatioSql("one", "lb")))
      .withColumn("lp_prior",
        expr(graft.functions.PinnedMath.lnRatioSql("n_c", "n_all")))
      .select($"cls", $"term", $"c_ct", $"t_c", $"lp", $"n_c",
        $"lp_prior", $"lp0")
      .orderBy($"cls", $"term")
  }

  // ------------------------------------------------------------- oracles

  private def ln(a: String, b: String): String =
    graft.functions.PinnedMath.lnRatioSql(a, b)

  /** Shared CTE chain: doc-term counts, the smoothed model over the
    * `trainWhere` side, and per-(doc, class) scores + argmax rank over
    * the `scoreWhere` side — the SQL mirror of [[scoredBest]]. */
  private def scoredCtes(trainWhere: String, scoreWhere: String): String =
    s"""WITH dt AS (
       |  SELECT doc_id, lang, term, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
       |        FROM documents)
       |  GROUP BY 1, 2, 3
       |), train AS (SELECT * FROM dt WHERE $trainWhere),
       |hold AS (SELECT * FROM dt WHERE $scoreWhere),
       |ct AS (
       |  SELECT lang AS cls, term, CAST(SUM(n) AS BIGINT) AS c_ct
       |  FROM train GROUP BY 1, 2
       |), ct2 AS (
       |  SELECT cls, term, c_ct,
       |         CAST(SUM(c_ct) OVER (PARTITION BY cls) AS BIGINT) AS t_c
       |  FROM ct
       |), v AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM ct),
       |prior AS (
       |  SELECT lang AS cls, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_c
       |  FROM train GROUP BY 1
       |), nall AS (SELECT CAST(SUM(n_c) AS BIGINT) AS n_all FROM prior),
       |cb AS (
       |  SELECT t.cls, CAST(1 AS BIGINT) AS one,
       |         CAST(t.t_c + v.v AS BIGINT) AS lb, n_c, n_all
       |  FROM (SELECT cls, MAX(t_c) AS t_c FROM ct2 GROUP BY 1) t
       |  JOIN prior ON t.cls = prior.cls CROSS JOIN v CROSS JOIN nall
       |), classes AS (
       |  SELECT cls, ${ln("one", "lb")} AS lp0,
       |         ${ln("n_c", "n_all")} AS lp_prior
       |  FROM cb
       |), mb AS (
       |  SELECT cls, term, CAST(c_ct + 1 AS BIGINT) AS la,
       |         CAST(t_c + v.v AS BIGINT) AS lb
       |  FROM ct2 CROSS JOIN v
       |), model AS (
       |  SELECT cls, term, ${ln("la", "lb")} AS lp FROM mb
       |), cand AS (
       |  SELECT h.doc_id, h.lang AS label, h.term, h.n,
       |         c.cls, c.lp0, c.lp_prior, m.lp
       |  FROM hold h CROSS JOIN classes c
       |  LEFT JOIN model m ON m.cls = c.cls AND m.term = h.term
       |), sc AS (
       |  SELECT doc_id, label, cls, lp_prior,
       |         SUM(CAST(floor(COALESCE(lp, lp0) * CAST(n AS DOUBLE) * 1e12
       |           + 0.5) AS DECIMAL(38,0))) AS sum_fx
       |  FROM cand GROUP BY 1, 2, 3, 4
       |), sc2 AS (
       |  SELECT doc_id, label, cls,
       |         lp_prior + CAST(sum_fx AS DOUBLE) / 1e12 AS score
       |  FROM sc
       |), rk AS (
       |  SELECT doc_id, label, cls, score,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id
       |           ORDER BY score DESC, cls) AS rk,
       |         LEAD(score, 1) OVER (PARTITION BY doc_id
       |           ORDER BY score DESC, cls) AS nxt,
       |         MAX(CASE WHEN cls = label THEN score END)
       |           OVER (PARTITION BY doc_id) AS lbl_score
       |  FROM sc2
       |)""".stripMargin

  private val splitTrain = s"doc_id % $HOLDOUT_MOD <> 0"
  private val splitHold = s"doc_id % $HOLDOUT_MOD = 0"

  private val nbOracle =
    s"""${scoredCtes(splitTrain, splitHold)}
       |SELECT doc_id, label, cls AS pred, score, score - nxt AS margin,
       |       CAST(CASE WHEN cls = label THEN 1 ELSE 0 END AS INT) AS correct
       |FROM rk WHERE rk = 1 ORDER BY doc_id""".stripMargin

  private val confusionOracle =
    s"""${scoredCtes(splitTrain, splitHold)}
       |SELECT label, cls AS pred, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM rk WHERE rk = 1 GROUP BY 1, 2 ORDER BY label, pred""".stripMargin

  private val auditOracle =
    s"""${scoredCtes("TRUE", "TRUE")}
       |SELECT doc_id, label, cls AS pred, score AS score_pred,
       |       lbl_score AS score_label, score - lbl_score AS margin
       |FROM rk WHERE rk = 1 AND cls <> label
       |ORDER BY margin DESC, doc_id""".stripMargin

  private val calibrationOracle =
    s"""${scoredCtes(splitTrain, splitHold)}
       |SELECT bin, n_docs, n_correct,
       |       CAST(n_correct AS DOUBLE) / CAST(n_docs AS DOUBLE) AS acc
       |FROM (
       |  SELECT LEAST(9, CAST(floor((score - nxt) / $CALIB_BIN_W)
       |           AS BIGINT)) AS bin,
       |         CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(COUNT(CASE WHEN cls = label THEN 1 END) AS BIGINT)
       |           AS n_correct
       |  FROM rk WHERE rk = 1 GROUP BY 1)
       |ORDER BY bin""".stripMargin

  /** Oracle = the FULL-CORPUS model recompute: stored ⊎ batch merge must
    * be indistinguishable from never having split the corpus. */
  private val nbIncrementOracle =
    s"""WITH dt AS (
       |  SELECT lang AS cls, unnest(string_split(text, ' ')) AS term
       |  FROM documents
       |), ct AS (
       |  SELECT cls, term, CAST(COUNT(*) AS BIGINT) AS c_ct
       |  FROM dt GROUP BY 1, 2
       |), ct2 AS (
       |  SELECT cls, term, c_ct,
       |         CAST(SUM(c_ct) OVER (PARTITION BY cls) AS BIGINT) AS t_c
       |  FROM ct
       |), v AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM ct),
       |prior AS (
       |  SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS n_c
       |  FROM documents GROUP BY 1
       |), nall AS (SELECT CAST(SUM(n_c) AS BIGINT) AS n_all FROM prior),
       |mb AS (
       |  SELECT ct2.cls, term, c_ct, t_c, n_c, n_all,
       |         CAST(1 AS BIGINT) AS one,
       |         CAST(c_ct + 1 AS BIGINT) AS la,
       |         CAST(t_c + v.v AS BIGINT) AS lb
       |  FROM ct2 CROSS JOIN v
       |  JOIN prior ON prior.cls = ct2.cls CROSS JOIN nall
       |)
       |SELECT cls, term, c_ct, t_c, ${ln("la", "lb")} AS lp, n_c,
       |       ${ln("n_c", "n_all")} AS lp_prior, ${ln("one", "lb")} AS lp0
       |FROM mb ORDER BY cls, term""".stripMargin

  val all: Seq[Query] = Seq(
    Query("q149_nb_classifier",
      "Naive Bayes lang classifier train->classify->eval: add-one smoothing, deterministic 80/20 split, libm-free pinned-ln scores bit-exact vs DuckDB",
      nbLangClassifier, Some(nbOracle), headline = false),
    Query("q152_nb_confusion",
      "confusion matrix of the q149 holdout predictions: non-empty (label, pred) cells, C x C-bounded",
      nbConfusion, Some(confusionOracle), headline = false),
    Query("q153_label_audit",
      "label-consistency audit (confident-learning): corpus-trained model vs recorded lang, disagreements ranked by exact ln-odds margin",
      labelAudit, Some(auditOracle), headline = false),
    Query("q156_nb_calibration",
      "reliability report: holdout accuracy per ln-odds-margin bin - the confidence-as-quality-filter threshold read",
      nbCalibration, Some(calibrationOracle), headline = false),
    Query("q157_nb_model_increment",
      "maintain->serve for the NB model: stored count artifacts + one batch scan, V/N-shift re-derived == full-corpus recompute (sum-merge identity)",
      nbModelIncrement, Some(nbIncrementOracle), headline = false))
}
