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
}
