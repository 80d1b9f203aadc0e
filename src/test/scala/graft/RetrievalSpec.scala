package graft

import graft.ops.Retrieval

/** Pins q161's context-assembly semantics against the q123 ranking it
  * consumes, on the real sf0.001 testdata (the retrieval family's
  * correctness is driver-oracle-verified per round; this spec keeps the
  * PACKING contract — prefix fill, exact running totals, budget
  * boundary — under `sbt test`). */
class RetrievalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q161 packing: prefix fill, exact running totals, budget respected") {
    val ctx = Retrieval.ragContext(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(ctx.nonEmpty)
    val byQ = ctx.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      // prefix semantics: positions are exactly 1..m — a skipped rank
      // would mean greedy-knapsack semantics leaked in
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"query $q ctx positions not contiguous: ${sorted.map(_._2).toSeq}")
      // cum_tokens is the exact running dl sum and stays within budget
      var cum = 0L
      sorted.foreach { case (_, _, _, dl, cumGot) =>
        cum += dl
        assert(cumGot == cum, s"query $q running total drifted")
      }
      assert(cum <= Retrieval.RAG_BUDGET)
    }
    // the cut is real: where the q123 ranking has a NEXT candidate, it
    // would not have fit (otherwise it should have been included)
    val ranked = Retrieval.bm25Batch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))) // (q, rnk, dl)
    byQ.foreach { case (q, rows) =>
      val m = rows.length.toLong
      val cum = rows.map(_._4).sum
      ranked.find(r => r._1 == q && r._2 == m + 1).foreach { next =>
        assert(cum + next._3 > Retrieval.RAG_BUDGET,
          s"query $q: rank ${m + 1} fits the budget but was excluded")
      }
    }
    spark.catalog.clearCache()
  }
}
