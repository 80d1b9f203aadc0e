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
