package graft

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {

  test("stratified sample: deterministic, stratum-bounded, unknown lang dropped") {
    import spark.implicits._
    val docsDf = (0L until 400L).map { i =>
      val lang = Seq("en", "de", "xx")((i % 3).toInt)
      Doc(i, s"doc $i", lang = lang)
    }.toDF
    val dir = fixtureDir("documents" -> docsDf)
    val a = Sampling.stratifiedSample(spark, dir).collect()
    val b = Sampling.stratifiedSample(spark, dir).collect()
    // pure hash function of the row: byte-stable across runs
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    val byLang = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(!byLang.contains("xx")) // unconfigured stratum → rate 0
    // en rate 0.25 vs de 0.75: md5 is uniform, so on ~133 docs/strata the
    // realized counts sit near the target with generous slack
    assert(byLang("en") < byLang("de"))
    assert(byLang("en") > 10 && byLang("en") < 60)
    assert(byLang("de") > 70 && byLang("de") < 130)
  }

  test("length quantiles: type-7 interpolation on a hand-computed stratum") {
    import spark.implicits._
    // n_chars 10,20,30,40 (n=4): h=(n-1)p → p=.25: h=.75 → 10+(20-10)*.75=17.5
    // p=.5: h=1.5 → 25.0; p=.75: h=2.25 → 32.5; p=.9: h=2.7 → 37.0
    val docsDf = Seq(
      Doc(1L, "a" * 10), Doc(2L, "b" * 20), Doc(3L, "c" * 30),
      Doc(4L, "d" * 40)).toDF
    val dir = fixtureDir("documents" -> docsDf)
    val r = Sampling.lengthQuantiles(spark, dir).collect()
      .map(x => x.getDouble(1) -> x.getDouble(2)).toMap
    assert(r(0.25) == 17.5)
    assert(r(0.5) == 25.0)
    assert(r(0.75) == 32.5)
    assert(math.abs(r(0.9) - 37.0) < 1e-12)
  }

  test("length quantiles: single-value stratum returns that value at all p") {
    import spark.implicits._
    val dir = fixtureDir("documents" -> Seq(Doc(1L, "e" * 7)).toDF)
    val r = Sampling.lengthQuantiles(spark, dir).collect()
    assert(r.length == Sampling.QUANTILES.length)
    assert(r.forall(_.getDouble(2) == 7.0))
  }
}
