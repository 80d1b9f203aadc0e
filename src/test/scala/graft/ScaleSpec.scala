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

  test("saltedJoin ≡ plain inner join for arbitrary key distributions") {
    // keys drawn from a tiny domain so generated facts go HOT on some key
    // (the case the device exists for); dim keys cover a superset so some
    // fact rows also MISS (inner-join drop must match exactly)
    val gen = for {
      facts <- Gen.listOf(Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(-99L, 99L)))
      nSalts <- Gen.chooseNum(1, 5)
    } yield (facts, nSalts)

    val prop = Prop.forAll(gen) { case (facts, nSalts) =>
      val fact = facts.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "id")
      val dim = (0L to 3L).map(k => (k, s"payload$k")).toDF("k", "p")
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select($"k", $"v", $"id", $"p")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sorted.toSeq
      rows(Scale.saltedJoin(fact, dim, Seq("k"), $"id", nSalts)) ==
        rows(fact.join(dim, Seq("k")))
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("saltedJoin plans a shuffled hash join, not a broadcast") {
    // the device exists for the non-broadcastable-dim regime; the hint
    // must survive planning or the demo silently degenerates to the plan
    // it is meant to replace
    val fact = (0L until 100L).map(i => (i % 3, i)).toDF("k", "id")
    val dim = (0L to 3L).map(k => (k, s"p$k")).toDF("k", "p")
    val out = Scale.saltedJoin(fact, dim, Seq("k"), $"id", 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected ShuffledHashJoin in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "salted dim must not be broadcast")
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

  test("minLabelComponents: pointer jumping converges a long chain in O(log d) rounds") {
    // round 16: the capped mega-cluster evidence is CHAIN-shaped, so the
    // fixpoint must converge in O(log diameter) — a 2000-link path needs
    // ~11 doubling rounds where plain hash-min propagation would need
    // 2000 (and previously failed the 16-round bound on megadup). The
    // same call also pins correctness on a multi-component graph.
    val chain = (0L until 2000L).sliding(2).map(p => (p(0), p(1))).toSeq
    val other = Seq((5000L, 5001L), (5001L, 5002L)) // a second component
    val comp = Scale.minLabelComponents(
      (chain ++ other).toDF("a", "b"), 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Scale.lastComponentRounds <= 16,
      s"doubling must beat the bound (took ${Scale.lastComponentRounds})")
    assert((0L until 2000L).forall(comp(_) == 0L),
      "every chain node must label to the component minimum")
    assert(Seq(5000L, 5001L, 5002L).forall(comp(_) == 5000L))
    spark.catalog.clearCache()
  }
}
