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

  test("q167: one budget number admits fewer docs in BPE units than in words") {
    // round-13 verdict item 2 (q161 wrong-units): fertility > 1 means a
    // whitespace-word budget OVERCOMMITS a BPE-denominated model window.
    // Under the SAME numeric budget, packing by real token counts must
    // admit a per-query PREFIX of the word-packed list, strictly shorter
    // in total — the measurable statement of "q161 overflows the model".
    def perQ(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).max).toMap
    val byWords = perQ(
      Retrieval.ragContextBy(spark, dir, bpe = false, Retrieval.RAG_BUDGET))
    val byBpe = perQ(
      Retrieval.ragContextBy(spark, dir, bpe = true, Retrieval.RAG_BUDGET))
    assert(byWords.nonEmpty)
    byBpe.foreach { case (q, m) =>
      assert(m <= byWords(q),
        s"query $q: BPE packing admitted $m docs > word packing ${byWords(q)}")
    }
    assert(byBpe.values.sum < byWords.values.sum,
      "fertility > 1 must make the BPE-denominated context strictly smaller")
    // and the registered q167 budget packs a real (non-degenerate) context
    val ctx = Retrieval.ragContextBpe(spark, dir).collect()
    assert(ctx.nonEmpty)
    ctx.foreach { r =>
      assert(r.getLong(5) <= Retrieval.RAG_BUDGET_BPE) // cum_tokens
      assert(r.getLong(4) >= r.getLong(3), // n_tokens >= dl: fertility >= 1
        s"BPE tokens below word count for doc ${r.getLong(2)}")
    }
    spark.catalog.clearCache()
  }

  test("q167 budget is a real parameter: a smaller budget packs a per-query prefix") {
    // the budget-parameter contract (round-14 verdict item 7): packing
    // is a rank-order prefix fill, so halving the budget must yield, per
    // query, exactly the rows of the full packing whose cum_tokens fit —
    // never a different candidate set or order
    def rows(b: Long) = Retrieval.ragContextBpe(spark, dir, b).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    val full = rows(Retrieval.RAG_BUDGET_BPE)
    val half = rows(Retrieval.RAG_BUDGET_BPE / 2)
    assert(half.nonEmpty && half.length < full.length)
    val fullSet = full.toSet
    half.foreach { r =>
      assert(fullSet.contains(r),
        s"row $r of the half-budget packing is not in the full packing")
      assert(r._4 <= Retrieval.RAG_BUDGET_BPE / 2)
    }
    // prefix, not subset: every full-packing row under the half budget
    // is present
    val halfSet = half.toSet
    full.filter(_._4 <= Retrieval.RAG_BUDGET_BPE / 2).foreach { r =>
      assert(halfSet.contains(r), s"row $r fits the half budget but was cut")
    }
    spark.catalog.clearCache()
  }
}
