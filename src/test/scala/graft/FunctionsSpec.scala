package graft

import graft.functions.{DotProduct, WeightedAvg}
import org.apache.spark.sql.functions._

/** Pins the custom-function surface: the codegen'd DotProduct expression
  * against a hand computation and the HOF formulation, and the typed
  * WeightedAvg Aggregator against the builtin-expression ratio. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct matches hand computation, HOF result, and handles edges") {
    val df = Seq(
      (1L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (2L, Seq(0.5f, -0.5f), Seq(2f, 2f)),
      (3L, Seq.empty[Float], Seq.empty[Float]),
      (4L, Seq(1f, 2f, 3f), Seq(1f)) // ragged: scores common prefix
    ).toDF("id", "a", "b")
    val got = df.select($"id", DotProduct($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == (4.0 + 10.0 + 18.0))
    assert(got(2L) == 0.0)
    assert(got(3L) == 0.0)
    assert(got(4L) == 1.0)
    // equivalent higher-order-function formulation agrees
    val hof = df.filter($"id" === 1).select(expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (acc, z) -> acc + z)")).head().getDouble(0)
    assert(hof == got(1L))
    // null propagation
    val n = Seq((Option.empty[Seq[Float]], Option(Seq(1f))))
      .toDF("a", "b").select(DotProduct($"a", $"b")).head()
    assert(n.isNullAt(0))
  }

  test("NfcNormalize pins planted Unicode classes and the q130 cleanup") {
    import graft.functions.NfcNormalize
    // planted classes, all via EXPLICIT escapes (source-literal Unicode
    // could be silently normalized by tooling): decomposed Latin
    // (e + U+0301), decomposed Hangul jamo, already-composed text (fast
    // path), NFC-invariant ligature (U+FB01 must SURVIVE -- NFC, not
    // NFKC), and non-BMP (astral) text
    val decomposed = "cafe\u0301"
    val jamo = "\u1100\u1161"
    val ligature = "\ufb01le"
    val astral = "a\ud83d\ude00b"
    val rows = Seq(
      (1L, decomposed), (2L, jamo), (3L, "plain ascii"),
      (4L, ligature), (5L, astral)).toDF("id", "t")
    val got = rows.select($"id", NfcNormalize($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def jdk(s: String) =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    assert(got(1L) == "caf\u00e9" && got(1L) == jdk(decomposed))
    assert(got(2L) == "\uac00" && got(2L) == jdk(jamo))
    assert(got(3L) == "plain ascii")
    assert(got(4L) == ligature, "NFC must not decompose ligatures (NFKC would)")
    assert(got(5L) == astral)
    // null propagation + analysis-time type check
    assert(Seq(Option.empty[String]).toDF("t")
      .select(NfcNormalize($"t")).head().isNullAt(0))
    val err = intercept[Exception] {
      Seq(1L).toDF("t").select(NfcNormalize($"t")).head()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
    // the q130 composition on a planted messy row: NFC + ws collapse
    val messy = Seq((9L, " cafe\u0301  y\tz \n")).toDF("doc_id", "text")
    val q = messy
      .withColumn("t_nfc", NfcNormalize($"text"))
      .select(trim(regexp_replace($"t_nfc", ops.Scrub.WS_RE, " ")).as("c"))
      .head().getString(0)
    assert(q == "caf\u00e9 y z")
  }

  test("DotProduct rejects non-float arrays at analysis time") {
    val doubles = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val err = intercept[Exception] {
      doubles.select(DotProduct($"a", $"b")).head()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>"),
      s"unexpected error: ${err.getMessage}")
  }

  test("cosineMargin bounds |cos_fast − cosine| for arbitrary dims/magnitudes") {
    // Property-pins Ann.cosineMargin's error analysis (round-4 advice: the
    // old 1e-6 margin rested on a fixture measurement). Mirrors both
    // engine formulations exactly: cos_fast = index-ordered double dot /
    // shared decimal-derived norms; cosine = 1e-12 fixed-point decimal dot
    // / the SAME norms. Magnitudes sweep 1e-6…1e3 — small norms are the
    // regime where the old constant margin was unsound.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    def dotFast(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def dotDec(a: Array[Float], b: Array[Float]): BigDecimal =
      a.indices.map { i =>
        BigDecimal(math.floor(a(i).toDouble * b(i).toDouble * 1e12 + 0.5) / 1e12)
          .setScale(15, BigDecimal.RoundingMode.HALF_UP)
      }.foldLeft(BigDecimal(0))(_ + _)
    val gen = for {
      dim <- Gen.chooseNum(2, 64)
      scale <- Gen.oneOf(1e-6, 1e-4, 1e-2, 1.0, 1e2, 1e3)
      a <- Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0))
      b <- Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0))
    } yield (a.map(x => (x * scale).toFloat).toArray,
      b.map(x => (x * scale).toFloat).toArray, dim)
    val prop = Prop.forAll(gen) { case (a, b, dim) =>
      val na = dotDec(a, a).toDouble
      val nb = dotDec(b, b).toDouble
      // zero decimal norm ⇒ both cosines are NaN in both engines; the
      // near-dup path never emits such pairs (nothing passes >= threshold)
      (na > 0 && nb > 0) ==> {
        val denom = math.sqrt(na) * math.sqrt(nb)
        val cosFast = dotFast(a, b) / denom
        val cosine = dotDec(a, b).toDouble / denom
        val margin = dim * 1e-12 / denom + (2 * dim + 16) * 2.3e-16
        math.abs(cosFast - cosine) <= margin
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("WeightedAvg Aggregator equals the builtin ratio and guards zero weight") {
    val lines = Seq(
      (1L, 100.0, 4.0), (1L, 200.0, 6.0), // part 1: (400+1200)/10 = 160
      (2L, 50.0, 0.0)) // part 2: zero total weight → 0.0
      .toDF("part_id", "value", "weight")
      .as[(Long, Double, Double)]
    val typed = lines
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(WeightedAvg.toColumn.name("wavg"))
      .collect().toMap
    assert(typed(1L) == 160.0)
    assert(typed(2L) == 0.0)
    val builtin = lines.toDF("part_id", "value", "weight")
      .groupBy($"part_id")
      .agg(when(sum($"weight") === 0.0, 0.0)
        .otherwise(sum($"value" * $"weight") / sum($"weight")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(typed(1L) == builtin(1L))
  }

  test("PinnedMath.lnRatioSql: libm-free ln accurate to ~1e-15, exact at powers of two, shift-safe at count widths") {
    import graft.functions.PinnedMath
    import spark.implicits._
    // small-operand sweep (the sf-scale count regime) + large-operand
    // probes (the 100 TB count widths: the a<<k intermediate must stay
    // inside BIGINT while b is in the 1e13 class)
    val pairs = (for { a <- 1L to 48L; b <- a to a + 64L } yield (a, b)) ++
      Seq((2L, 4000000000000L), (999999999999L, 1000000000000L),
        (3L, 9999999999999L), (1L, 1L << 50))
    pairs.toDF("a", "b").createOrReplaceTempView("lnpairs")
    val got = spark.sql(
      s"SELECT a, b, ${PinnedMath.lnRatioSql("a", "b")} AS lp " +
        "FROM lnpairs").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b, lp) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val truth = math.log(a.toDouble / b.toDouble)
      if (a == b) assert(lp == 0.0, s"ln($a/$a) must be exactly 0")
      else if (java.lang.Long.bitCount(b) == 1 && a == 1)
        // p = 2^-n: m = 1 exactly, so lp = -n*LN2, one rounded product
        assert(lp == -((63 - java.lang.Long.numberOfLeadingZeros(b)) *
          0.6931471805599453), s"ln(1/$b) power-of-two path")
      else {
        // absolute ~ulp(ln m ≤ 0.7) + k·ulp(LN2) Horner/cancellation
        // budget; relative term for the large-|truth| regime
        val tol = 1e-14 + 4e-16 * math.abs(truth)
        assert(math.abs(lp - truth) <= tol,
          s"ln($a/$b): pinned=$lp libm=$truth diff=${lp - truth}")
      }
    }
    // the fragment is pure +-*/ over exact integers: re-evaluating yields
    // bit-identical doubles (the property the q145 oracle compare rests
    // on; cross-ENGINE identity is proven by the driver's DuckDB hash)
    val again = spark.sql(
      s"SELECT ${PinnedMath.lnRatioSql("a", "b")} AS lp FROM lnpairs")
      .collect().map(_.getDouble(0))
    assert(got.map(_.getDouble(2)).sameElements(again))
  }
}
