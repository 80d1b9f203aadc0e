package graft

import graft.ops.Scale
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property for the distributed two-pass prefix sum: for any
  * value list and any input partitioning, [[Scale.prefixSum]] equals the
  * sequential running sum (and the grand total equals the plain sum) —
  * the invariant that makes it a drop-in for the single-task
  * `sum().over(Window.orderBy)` at any scale. */
class ScaleSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("prefixSum ≡ sequential cumsum for arbitrary inputs and partitionings") {
    val gen = for {
      vs <- Gen.listOf(Gen.chooseNum(-1000000L, 1000000L))
      parts <- Gen.chooseNum(1, 5)
    } yield (vs, parts)

    val prop = Prop.forAll(gen) { case (vs, parts) =>
      val df = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, BigDecimal(v)) }
        .toDF("k", "v")
        .repartition(parts)
      // exercise BOTH physical paths — the caller-declared smallInput flag
      // picks the plan; the contract is that they are bit-identical.
      val expectCum = vs.map(BigDecimal(_)).scanLeft(BigDecimal(0))(_ + _).tail
      val total = vs.map(BigDecimal(_)).sum
      val ok = Seq(false, true).forall { small =>
        val out = Scale.prefixSum(df, Seq($"k".asc), $"v", "cum", "tot", small)
          .orderBy($"k")
          .select($"k", $"cum", $"tot")
          .collect()
        spark.catalog.clearCache() // prefixSum caller contract
        val cumOk = out.map(r => BigDecimal(r.getDecimal(1)))
          .zip(expectCum).forall { case (a, b) => a.compare(b) == 0 }
        val totOk = out.forall(r => BigDecimal(r.getDecimal(2)).compare(total) == 0)
        cumOk && totOk && out.length == vs.length
      }
      ok
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("prefixSum respects a descending order with tiebreaker") {
    val df = Seq((1L, BigDecimal(10)), (2L, BigDecimal(10)), (3L, BigDecimal(5)))
      .toDF("k", "v")
    // distributed path (smallInput = false) must honor the total order too
    val out = Scale.prefixSum(df, Seq($"v".desc, $"k".asc), $"v", "cum", "tot")
      .orderBy($"v".desc, $"k".asc)
      .collect()
    spark.catalog.clearCache()
    assert(out.map(r => BigDecimal(r.getDecimal(2)).toInt).toSeq == Seq(10, 20, 25))
    assert(out.forall(r => BigDecimal(r.getDecimal(3)).toInt == 25))
  }
}
