package graft

import graft.ops.Terms

class TermsSpec extends SparkSpec {

  test("repetition signals: hand-computed fractions on a crafted doc") {
    import spark.implicits._
    // "x y x y x y" — 6 tokens, 2 distinct → dup 4/6; top bigram "x y"
    // appears 3× (overlapping windows "y x" appear 2×), len 3; top
    // trigram "x y x" 2× vs "y x y" 2× → tie broken ascending = "x y x".
    val text = "x y x y x y" // n_chars = 11
    val dir = fixtureDir("documents" -> Seq(Doc(1L, text)).toDF)
    val r = Terms.repetitionSignals(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_tokens") == 6L)
    assert(row.getAs[Double]("dup_token_frac") == 4.0 / 6.0)
    assert(row.getAs[String]("top_bigram") == "x y")
    assert(row.getAs[Double]("top_bigram_frac") == 3.0 * 3 / 11)
    assert(row.getAs[String]("top_trigram") == "x y x")
    assert(row.getAs[Double]("top_trigram_frac") == 2.0 * 5 / 11)
    assert(!row.getAs[Boolean]("repetition_ok")) // dup 0.67 > 0.5
  }

  test("repetition signals: single-token doc has null grams, zero fractions") {
    import spark.implicits._
    val dir = fixtureDir("documents" -> Seq(Doc(1L, "solo")).toDF)
    val row = Terms.repetitionSignals(spark, dir).collect().head
    assert(row.getAs[Long]("n_tokens") == 1L)
    assert(row.getAs[Double]("dup_token_frac") == 0.0)
    assert(row.isNullAt(row.fieldIndex("top_bigram")))
    assert(row.getAs[Double]("top_bigram_frac") == 0.0)
    assert(row.getAs[Boolean]("repetition_ok"))
  }

  test("distinctive terms: one corpus scan feeds tf, df and the rank") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    import spark.implicits._
    val dir = fixtureDir("documents" ->
      Seq(Doc(1L, "a a b c"), Doc(2L, "b d")).toDF)
    val df = Terms.distinctiveTerms(spark, dir)
    df.queryExecution.toRdd.foreach(_ => ())
    val executed = scans(df.queryExecution.executedPlan)
      .groupBy(System.identityHashCode(_)).values.map(_.head)
    // the df-as-window shape: the agg+join-back alternative executed TWO
    // corpus scans (measured); the window keys one shuffle instead
    assert(executed.size == 1, df.queryExecution.executedPlan.toString)
  }

  test("chunking: stride windows, overlap, short tail, sub-stride doc") {
    import spark.implicits._
    // 40 tokens → starts 0, 24: chunk0 = t1..t32, chunk1 = t25..t40 (16)
    val t40 = (1 to 40).map(i => s"t$i")
    val dir = fixtureDir("documents" -> Seq(
      Doc(1L, t40.mkString(" ")),
      Doc(2L, "tiny doc")).toDF)
    val r = Terms.chunkDocs(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(2)) -> x).toMap
    assert(r.keySet == Set((1L, 0L), (1L, 1L), (2L, 0L)))
    assert(r((1L, 0L)).getAs[Long]("chunk_tokens") == 32L)
    assert(r((1L, 0L)).getAs[String]("chunk_text").startsWith("t1 t2 "))
    assert(r((1L, 1L)).getAs[Long]("chunk_tokens") == 16L)
    assert(r((1L, 1L)).getAs[String]("chunk_text") ==
      (25 to 40).map(i => s"t$i").mkString(" "))
    // overlap: tokens 25..32 appear in both chunks
    assert(r((1L, 0L)).getAs[String]("chunk_text").endsWith("t32"))
    assert(r((2L, 0L)).getAs[String]("chunk_text") == "tiny doc")
  }

  test("distinctive terms: tf desc, df asc, term asc rank order") {
    import spark.implicits._
    // doc 1: "a a b c"; doc 2: "b d". df: a=1 b=2 c=1 d=1.
    // doc 1 rank: a (tf 2), then tf-1 ties c (df 1) before b (df 2).
    val dir = fixtureDir("documents" ->
      Seq(Doc(1L, "a a b c"), Doc(2L, "b d")).toDF)
    val r = Terms.distinctiveTerms(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.toSeq == Seq((1L, 1L, "a"), (1L, 2L, "c"), (1L, 3L, "b"),
      (2L, 1L, "d"), (2L, 2L, "b")))
  }

  test("collocations: hand-computed lift, min-count floor, pinned order") {
    import spark.implicits._
    // "a b a b … a b" ×12 → bigrams: (a,b)×12, (b,a)×11, N=23;
    // c(a)=c(b)=12. lift(a,b) = 23·12/(12·12), lift(b,a) = 23·11/(12·12).
    // A once-off pair ("x y") sits below COLLOC_MIN_PAIR and must vanish.
    val text = Seq.fill(12)("a b").mkString(" ")
    val dir = fixtureDir("documents" ->
      Seq(Doc(1L, text), Doc(2L, "x y")).toDF)
    val r = Terms.collocations(spark, dir).collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq ==
      Seq(("a", "b"), ("b", "a"))) // (w1, w2) — lift desc
    // N counts ALL bigrams incl. the filtered pair: 12 + 11 + 1 = 24
    assert(r(0).getAs[Double]("lift") == 24.0 * 12 / 12 / 12)
    assert(r(1).getAs[Double]("lift") == 24.0 * 11 / 12 / 12)
    assert(r(0).getAs[Long]("pair_count") == 12L)
  }

  test("vocab coverage: top-V vocabulary, per-stratum OOV rate") {
    import spark.implicits._
    // 24 terms seen twice fill the VOCAB_SIZE=24 vocabulary; the de doc's
    // two once-off terms lose the frequency cut → its stratum is 100% OOV.
    assert(Terms.VOCAB_SIZE == 24)
    val common = (0 until 24).map(i => s"t$i").mkString(" ")
    val dir = fixtureDir("documents" -> Seq(
      Doc(1L, s"$common $common"),
      Doc(2L, "r1 r2", lang = "de")).toDF)
    val r = Terms.vocabCoverage(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5))).toSeq
    assert(r == Seq(("de", 1L, 2L, 2L, 1.0), ("en", 1L, 48L, 0L, 0.0)))
  }

  test("bpe merges: tie-break, greedy overlap, multi-round composition") {
    import spark.implicits._
    // words: "aaaa" ×1, "ab" ×3.
    //  round 1: (a,a)=3 (three adjacent positions in aaaa) ties (a,b)=3
    //           → (a,a) wins the (left,right) ascending tie-break;
    //           greedy left-to-right merge: aaaa → [aa, aa] (NOT [aa,a,a])
    //  round 2: (a,b)=3 beats (aa,aa)=1
    //  round 3: (aa,aa)=1 — composition of round 1's symbol
    val dir = fixtureDir("documents" ->
      Seq(Doc(1L, "aaaa"), Doc(2L, "ab ab ab")).toDF)
    val r = graft.ops.Terms.bpeMerges(spark, dir).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4))).toSeq
    assert(r == Seq(
      (1L, "a", "a", "aa", 3L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "aa", "aaaa", 1L)))
  }

  test("bpe tokenize: trained merges apply in rank order, exact accounting") {
    import spark.implicits._
    // same fixture as the training test: learned merges aa, ab, aaaa.
    // "aaaa" → [aa,aa] → [aaaa]: ONE token (needs rank-2 composition);
    // each "ab" → [ab]: one token per word.
    val dir = fixtureDir("documents" ->
      Seq(Doc(1L, "aaaa"), Doc(2L, "ab ab ab")).toDF)
    val r = graft.ops.Terms.bpeTokenize(spark, dir).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r(1L) == ((4L, 1L, 1L, 4.0)))
    assert(r(2L) == ((8L, 3L, 3L, 8.0 / 3)))
  }

  test("bpe fertility: per-language rollup of the doc-grain accounting") {
    import spark.implicits._
    // q121's fixture with languages attached: en = {aaaa, ab ab ab}
    // (12 chars, 4 words, 4 tokens under merges aa/ab/aaaa), de = {ab}
    // (2 chars, 1 word, 1 token). Fertility en = 4/4 = 1.0, de = 1.0;
    // chars_per_token en = 3.0, de = 2.0 — the per-lang disparity the
    // report exists to surface.
    val dir = fixtureDir("documents" -> Seq(
      Doc(1L, "aaaa", lang = "en"), Doc(2L, "ab ab ab", lang = "en"),
      Doc(3L, "ab", lang = "de")).toDF)
    val r = graft.ops.Terms.bpeFertility(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5), x.getDouble(6))).toMap
    assert(r("en") == ((2L, 12L, 4L, 4L, 3.0, 1.0)))
    assert(r("de") == ((1L, 2L, 1L, 1L, 2.0, 1.0)))
  }

  test("token typicality: exact mean-corpus-frequency score") {
    import spark.implicits._
    // counts: a=2 b=1 c=1, T=4. doc1 "a a b": (2+2+1)/3/4; doc2 "c": 1/1/4.
    val dir = fixtureDir("documents" ->
      Seq(Doc(1L, "a a b"), Doc(2L, "c")).toDF)
    val r = Terms.tokenTypicality(spark, dir).collect()
    assert(r(0).getAs[Double]("typicality") == 5.0 / 3 / 4)
    assert(r(1).getAs[Double]("typicality") == 1.0 / 1 / 4)
    // both far above the corpus-tuned cuts → class is 'common' here; the
    // non-trivial 3-way split is pinned by the sf0.01 oracle, not this
    // micro-fixture
    assert(r.forall(_.getAs[String]("typicality_class") == "common"))
  }

  test("bigram perplexity: hand-computed smoothing, singleton count, duplicate docs score identically") {
    import spark.implicits._
    // corpus bigrams: (a,b)×2 from docs 1/2, (a,c)×1 from doc 3.
    // model: c2(a,b)=2, c2(a,c)=1, c1(a)=3, V={a,b,c}=3.
    // lp(a,b) = ln((2+1)/(3+3)) = ln(1/2); lp(a,c) = ln((1+1)/(3+3)) = ln(1/3).
    val dir = fixtureDir("documents" ->
      Seq(Doc(1L, "a b"), Doc(2L, "a b"), Doc(3L, "a c")).toDF)
    val r = Terms.bigramPerplexity(spark, dir).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    assert(r.forall(_.getAs[Long]("n_bigrams") == 1L))
    // only (a,c) occurs exactly once corpus-wide
    assert(r.map(_.getAs[Long]("n_singleton")).toSeq == Seq(0L, 0L, 1L))
    val nll = r.map(_.getAs[Double]("nll"))
    // ln(1/2) rides the exact power-of-two path of the pinned ln; the
    // order-free accumulator then quantizes each lp onto the 1e-12 grid
    // (floor(lp·1e12 + 0.5)/1e12), so nll is LN2 rounded to that grid —
    // pin the EXACT quantized value, not a tolerance
    val q = (x: Double) => math.floor(x * 1e12 + 0.5) / 1e12
    assert(nll(0) == -q(-0.6931471805599453))
    // identical docs must score bit-identically (determinism, not luck)
    assert(nll(0) == nll(1))
    assert(math.abs(nll(2) - math.log(3.0)) < 1e-9)
    assert(r.forall(row =>
      row.getAs[Double]("nll_per_tok") == row.getAs[Double]("nll")))
  }

  test("bigram model increment: batch vocabulary changes EVERY smoothed lp, merge ≡ full recompute") {
    import spark.implicits._
    // cut = max(doc_id)·4/5 = 4 → stored: docs 1–3, batch: docs 4–5.
    // stored model alone: (a,b) c2=3, V={a,b}=2 → lp(a,b)=ln(4/5).
    // batch doc 4 "a c" adds NEW word c (V 2→3) and a new bigram;
    // batch doc 5 "a b" increments the stored bigram.
    // merged truth: (a,b) c2=4, (a,c) c2=1, c1(a)=5, V=3:
    //   lp(a,b) = ln(5/8), lp(a,c) = ln(2/8) = −2·ln2 (exact pow-2 path)
    val dir = fixtureDir("documents" -> Seq(
      Doc(1L, "a b"), Doc(2L, "a b"), Doc(3L, "a b"),
      Doc(4L, "a c"), Doc(5L, "a b")).toDF)
    val r = Terms.bigramModelIncrement(spark, dir).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r.keySet == Set(("a", "b"), ("a", "c")))
    val ab = r(("a", "b"))
    assert(ab.getAs[Long]("c2") == 4L && ab.getAs[Long]("c1") == 5L)
    // the naive "only touched bigrams change" increment would have kept
    // the stored V=2 smoothing ln(4/5+…); the re-derived value is ln(5/8)
    assert(math.abs(ab.getAs[Double]("lp") - math.log(5.0 / 8)) < 1e-14)
    assert(math.abs(ab.getAs[Double]("lp") - math.log(4.0 / 5)) > 0.1)
    val ac = r(("a", "c"))
    assert(ac.getAs[Long]("c2") == 1L)
    assert(ac.getAs[Double]("lp") == -2 * 0.6931471805599453)
    spark.catalog.clearCache()
  }
  test("vocab growth: new-term deciles and exact cumulative curve") {
    import spark.implicits._
    // ids 0..9 dense -> n_keys=10, bucket = doc_id. New vocabulary:
    // b0 {a,b}=2, b1 {c}=1, later buckets introduce nothing.
    val docsFx = Seq(Doc(0L, "a b a"), Doc(1L, "b c"), Doc(2L, "c")) ++
      (3L to 9L).map(i => Doc(i, "a"))
    val dir = fixtureDir("documents" -> docsFx.toDF)
    val rows = Terms.vocabGrowth(spark, dir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (0L to 9L))
    val byB = rows.map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(byB(0L).getAs[Long]("n_tokens") == 3L)
    assert(byB(0L).getAs[Long]("new_terms") == 2L)
    assert(byB(1L).getAs[Long]("new_terms") == 1L)
    assert((2L to 9L).forall(b => byB(b).getAs[Long]("new_terms") == 0L))
    assert(byB(9L).getAs[Long]("vocab_cum") == 3L)
    assert(byB(9L).getAs[Long]("tokens_cum") == 13L)
    assert(byB(9L).getAs[Long]("docs_cum") == 10L)
    // monotone cumulative
    val vc = rows.map(_.getAs[Long]("vocab_cum")).toSeq
    assert(vc == vc.sorted)
    spark.catalog.clearCache()
  }

  test("vocab growth: buckets carve the dense keyspace (5 docs -> even buckets)") {
    import spark.implicits._
    // n_keys = 5: bucket = id*10 div 5 = 2*id -> only even buckets exist;
    // the curve reports the buckets that HAVE data, no phantom rows.
    val dir = fixtureDir("documents" ->
      (0L to 4L).map(i => Doc(i, "t")).toDF)
    val rows = Terms.vocabGrowth(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    assert(rows.head.getAs[Long]("new_terms") == 1L)
    assert(rows.last.getAs[Long]("vocab_cum") == 1L)
    spark.catalog.clearCache()
  }
}
