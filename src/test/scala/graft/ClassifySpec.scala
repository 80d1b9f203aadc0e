package graft

import graft.ops.Classify

/** Pins q149's Naive Bayes semantics on hand-computed fixtures: the
  * smoothed class-conditional model, the unseen-term default, the
  * deterministic holdout carve, and the argmax/margin surface. Scores are
  * checked against `Math.log` at 1e-9 — the pinned-ln chain is a ~1-ulp
  * approximation of ln (FunctionsSpec pins the chain itself; here only
  * the model arithmetic feeding it is under test). */
class ClassifySpec extends SparkSpec {

  test("classifier learns class-conditional token frequencies (hand model)") {
    import spark.implicits._
    // train (ids % 5 != 0): en docs 1,2 = "aa aa bb"; de docs 3,4 =
    // "cc cc bb" → c(en,aa)=4, c(en,bb)=2, T_en=6; c(de,cc)=4, c(de,bb)=2,
    // T_de=6; V=3; priors 2/4 each.
    // holdout: doc 0 "aa bb" (en), doc 5 "cc" (de).
    val dir = fixtureDir("documents" -> Seq(
      Doc(0L, "aa bb", lang = "en"),
      Doc(1L, "aa aa bb", lang = "en"), Doc(2L, "aa aa bb", lang = "en"),
      Doc(3L, "cc cc bb", lang = "de"), Doc(4L, "cc cc bb", lang = "de"),
      Doc(5L, "cc", lang = "de")).toDF)
    val rows = Classify.nbLangClassifier(spark, dir).collect()
    Caches.releasePrefix("classify.")
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 5L))

    val r0 = rows(0)
    assert(r0.getAs[String]("pred") == "en")
    assert(r0.getAs[Int]("correct") == 1)
    // score_en(0) = ln(2/4) + ln((4+1)/(6+3)) + ln((2+1)/(6+3))
    val exp0 = math.log(2.0 / 4) + math.log(5.0 / 9) + math.log(3.0 / 9)
    assert(math.abs(r0.getAs[Double]("score") - exp0) < 1e-9)
    // margin vs de: de sees aa unsmoothed (c=0) → lp ln(1/9); bb equal ⇒
    // margin = ln(5/9) − ln(1/9) = ln 5
    assert(math.abs(r0.getAs[Double]("margin") - math.log(5.0)) < 1e-9)

    val r5 = rows(1)
    assert(r5.getAs[String]("pred") == "de")
    assert(r5.getAs[Int]("correct") == 1)
    assert(math.abs(r5.getAs[Double]("margin") - math.log(5.0)) < 1e-9)
  }

  test("unseen-only document falls back to the smoothed default (leaner class wins)") {
    import spark.implicits._
    // en is token-heavy (T_en=16), de lean (T_de=2), V=2; priors 4/6 vs
    // 2/6. Holdout doc 0 is ALL unseen terms → score_c = prior + 2·lp0_c:
    //   en: ln(4/6) + 2·ln(1/18) ≈ −6.19;  de: ln(2/6) + 2·ln(1/4) ≈ −3.87
    // → de wins on the smaller smoothing denominator despite the smaller
    // prior; the doc's true label (en) is NOT predicted → correct = 0.
    val dir = fixtureDir("documents" -> Seq(
      Doc(0L, "zz zz", lang = "en"),
      Doc(1L, "aa aa aa aa", lang = "en"), Doc(2L, "aa aa aa aa", lang = "en"),
      Doc(3L, "aa aa aa aa", lang = "en"), Doc(4L, "aa aa aa aa", lang = "en"),
      Doc(6L, "cc", lang = "de"), Doc(7L, "cc", lang = "de")).toDF)
    val rows = Classify.nbLangClassifier(spark, dir).collect()
    Caches.releasePrefix("classify.")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("pred") == "de")
    assert(r.getAs[Int]("correct") == 0)
    val expDe = math.log(2.0 / 6) + 2 * math.log(1.0 / 4)
    val expEn = math.log(4.0 / 6) + 2 * math.log(1.0 / 18)
    assert(math.abs(r.getAs[Double]("score") - expDe) < 1e-9)
    assert(math.abs(r.getAs[Double]("margin") - (expDe - expEn)) < 1e-9)
  }

  test("holdout carve is exactly doc_id % 5 == 0") {
    import spark.implicits._
    val dir = fixtureDir("documents" ->
      (0L to 12L).map(i => Doc(i, "aa bb",
        lang = if (i % 2 == 0) "en" else "de")).toDF)
    val ids = Classify.nbLangClassifier(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    Caches.releasePrefix("classify.")
    assert(ids == Set(0L, 5L, 10L))
  }

  test("q156 calibration: margin bins, counts and the bin-9 cap") {
    import spark.implicits._
    // hand-model fixture (test 1's): both holdout docs land at margin
    // ln 5 ≈ 1.61 → bin 0, both correct. Doc 10 repeats the
    // discriminative token 40× → margin 40·ln 5 ≈ 64 → raw bin 12,
    // capped at 9.
    val dir = fixtureDir("documents" -> Seq(
      Doc(0L, "aa bb", lang = "en"),
      Doc(1L, "aa aa bb", lang = "en"), Doc(2L, "aa aa bb", lang = "en"),
      Doc(3L, "cc cc bb", lang = "de"), Doc(4L, "cc cc bb", lang = "de"),
      Doc(5L, "cc", lang = "de"),
      Doc(10L, Seq.fill(40)("aa").mkString(" "), lang = "en")).toDF)
    val rows = Classify.nbCalibration(spark, dir).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_correct"),
          r.getAs[Double]("acc"))).toMap
    Caches.releasePrefix("classify.")
    assert(rows.keySet == Set(0L, 9L), s"bins = ${rows.keySet}")
    assert(rows(0L) == ((2L, 2L, 1.0)))
    assert(rows(9L) == ((1L, 1L, 1.0)), "the 40x margin must cap at bin 9")
  }

  test("q157 increment: stored+batch merge == full recompute, V/N-shift included") {
    import spark.implicits._
    // cut = max_id·4 div 5 = 3: stored docs {0,1,2}, batch {3,4}. The
    // batch adds NEW vocabulary (dd) and new documents, so V shifts 3→4
    // and N 3→5 — every lp/lp0/lp_prior must reflect the MERGED state:
    //   merged: en aa=3, bb=1 (T_en=4); de cc=1, dd=2 (T_de=3); V=4;
    //   priors en 3/5, de 2/5.
    val dir = fixtureDir("documents" -> Seq(
      Doc(0L, "aa bb", lang = "en"), Doc(1L, "aa", lang = "en"),
      Doc(2L, "cc", lang = "de"),
      Doc(3L, "dd dd", lang = "de"), Doc(4L, "aa", lang = "en")).toDF)
    val rows = Classify.nbModelIncrement(spark, dir).collect()
    Caches.releasePrefix("classify.")
    assert(rows.map(r => (r.getAs[String]("cls"), r.getAs[String]("term"),
      r.getAs[Long]("c_ct"), r.getAs[Long]("t_c"), r.getAs[Long]("n_c")))
      .toSeq == Seq(
        ("de", "cc", 1L, 3L, 2L), ("de", "dd", 2L, 3L, 2L),
        ("en", "aa", 3L, 4L, 3L), ("en", "bb", 1L, 4L, 3L)))
    def lp(r: org.apache.spark.sql.Row, c: String) = r.getAs[Double](c)
    val byKey = rows.map(r =>
      (r.getAs[String]("cls"), r.getAs[String]("term")) -> r).toMap
    assert(math.abs(lp(byKey(("en", "aa")), "lp") - math.log(4.0 / 8)) < 1e-9)
    assert(math.abs(lp(byKey(("de", "dd")), "lp") - math.log(3.0 / 7)) < 1e-9)
    assert(math.abs(lp(byKey(("en", "aa")), "lp0") - math.log(1.0 / 8)) < 1e-9)
    assert(math.abs(lp(byKey(("de", "cc")), "lp0") - math.log(1.0 / 7)) < 1e-9)
    assert(math.abs(
      lp(byKey(("en", "aa")), "lp_prior") - math.log(3.0 / 5)) < 1e-9)
    assert(math.abs(
      lp(byKey(("de", "cc")), "lp_prior") - math.log(2.0 / 5)) < 1e-9)
  }
}
