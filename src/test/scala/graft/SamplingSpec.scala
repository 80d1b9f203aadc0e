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

  test("mix allocation: availability cap, untargeted stratum gets zero") {
    import spark.implicits._
    // en: 100 tokens, zh: 2, xx: 10 → total 112, budget 112*2 div 5 = 44.
    // en 30% → 13 (≤ 100, rate 0.13); zh 15% → 6 capped at 2 (rate 1.0);
    // xx untargeted → 0.
    val tenTok = (1 to 10).map(i => s"w$i").mkString(" ")
    val docsDf = ((0L until 10L).map(i => Doc(i, tenTok)) :+
      Doc(10L, "ni hao", lang = "zh") :+
      Doc(11L, tenTok, lang = "xx")).toDF
    val dir = fixtureDir("documents" -> docsDf)
    val r = Sampling.mixAllocation(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("en").getLong(3) == 44L) // budget on every row
    assert(r("en").getLong(4) == 13L && r("en").getDouble(5) == 0.13)
    assert(r("zh").getLong(4) == 2L && r("zh").getDouble(5) == 1.0)
    assert(r("xx").getLong(2) == 0L && r("xx").getLong(4) == 0L)
  }

  test("length quartiles: ntile division and tie placement are pinned") {
    import spark.implicits._
    // 6 docs, lengths 10,10,20,30,40,50 → NTILE(4) groups sizes 2,2,1,1:
    // tier1 = {10,10}, tier2 = {20,30}, tier3 = {40}, tier4 = {50}
    val docsDf = Seq(
      Doc(1L, "a" * 10), Doc(2L, "b" * 10), Doc(3L, "c" * 20),
      Doc(4L, "d" * 30), Doc(5L, "e" * 40), Doc(6L, "f" * 50)).toDF
    val dir = fixtureDir("documents" -> docsDf)
    val r = Sampling.lengthQuartiles(spark, dir).collect()
      .map(x => x.getLong(1) -> (x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r(1L) == ((2L, 10L, 10L)))
    assert(r(2L) == ((2L, 20L, 30L)))
    assert(r(3L) == ((1L, 40L, 40L)))
    assert(r(4L) == ((1L, 50L, 50L)))
  }

  test("length quantiles: single-value stratum returns that value at all p") {
    import spark.implicits._
    val dir = fixtureDir("documents" -> Seq(Doc(1L, "e" * 7)).toDF)
    val r = Sampling.lengthQuantiles(spark, dir).collect()
    assert(r.length == Sampling.QUANTILES.length)
    assert(r.forall(_.getDouble(2) == 7.0))
  }

  test("sequence packing: boundary split, whole-doc count, token conservation") {
    import spark.implicits._
    // "w " * n ⇒ exactly n BPE letter-run tokens. Layout (SEQ_LEN=2048):
    //   doc1: 2000 tokens → [0, 2000)        wholly in seq 0
    //   doc2:  100 tokens → [2000, 2100)     SPLIT across seqs 0/1
    //   doc3:   48 tokens → [2100, 2148)     wholly in seq 1
    //   doc4: empty text  → 0 tokens, contributes to no sequence
    val dir = fixtureDir("documents" -> Seq(
      Doc(1L, "w " * 2000), Doc(2L, "w " * 100),
      Doc(3L, "w " * 48), Doc(4L, "")).toDF)
    val r = Sampling.sequencePacking(spark, dir).collect()
    assert(r.length == 2)
    val bySeq = r.map(x => x.getLong(0) ->
      (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
        x.getLong(5), x.getDouble(6))).toMap
    // seq 0: docs 1+2, only doc1 whole, exactly full (2000 + 48 head of doc2)
    assert(bySeq(0L) == ((2L, 1L, 2048L, 1L, 2L, 1.0)))
    // seq 1: docs 2+3, only doc3 whole, 52-token tail of doc2 + 48
    assert(bySeq(1L) == ((2L, 1L, 100L, 2L, 3L, 100.0 / 2048)))
    // conservation: packed tokens == corpus tokens (nothing lost at a cut)
    assert(r.map(_.getLong(3)).sum == 2148L)
  }

  test("temperature mix: hand-computed α=0.5 weights, floor-division epoch alloc") {
    import spark.implicits._
    // srcA: 4 docs → w = floor(sqrt(4·10⁶)) = 2000
    // srcB: 1 doc  → w = floor(sqrt(1·10⁶)) = 1000; total_w 3000, docs 5
    val docsDf = (Seq.fill(4)("srcA") :+ "srcB").zipWithIndex
      .map { case (s, i) => Doc(i.toLong, "text", "en", s) }.toDF
    val dir = fixtureDir("documents" -> docsDf)
    val r = Sampling.temperatureMix(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getLong(4), x.getDouble(5))).toMap
    assert(r("srcA") == ((4L, 2000L, 2000.0 / 3000, 6666L, (2000.0 / 3000) / 0.8)))
    assert(r("srcB") == ((1L, 1000L, 1000.0 / 3000, 3333L, (1000.0 / 3000) / 0.2)))
    // α=0.5 flattens: the head is downweighted (<1), the tail boosted (>1)
    assert(r("srcA")._5 < 1.0 && r("srcB")._5 > 1.0)
    // floor division never over-commits the epoch
    assert(r.values.map(_._4).sum <= Sampling.EPOCH_DOCS)
  }

  test("epoch plan: cap binds on the upweighted tail source, unmet budget surfaced") {
    import spark.implicits._
    // big: one 10,000-token doc → w = floor(sqrt(1e4·1e6)) = 100000
    // tiny: one 4-token doc     → w = floor(sqrt(4·1e6))   = 2000
    // B = 2·10004 = 20008; target_tiny = 20008·2000 div 102000 = 392
    // ⌈392/4⌉ = 98 epochs → capped at 4 → planned 16, unmet 376
    val bigText = Seq.fill(10000)("tok").mkString(" ")
    val dir = fixtureDir("documents" -> Seq(
      Doc(1L, bigText, "en", "big"),
      Doc(2L, "a b c d", "en", "tiny")).toDF)
    val r = Sampling.epochPlan(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val tiny = r("tiny")
    assert(tiny.getAs[Long]("w") == 2000L)
    assert(tiny.getAs[Long]("target_tokens") == 392L)
    assert(tiny.getAs[Long]("epochs") == Sampling.MAX_EPOCHS)
    assert(tiny.getAs[Long]("planned_tokens") == 16L)
    assert(tiny.getAs[Long]("unmet_tokens") == 376L)
    val big = r("big")
    // head source: target 2·10004·100000 div 102000 = 19615 → 2 epochs,
    // epoch ceiling does NOT bind → target fully planned
    assert(big.getAs[Long]("target_tokens") == 19615L)
    assert(big.getAs[Long]("epochs") == 2L)
    assert(big.getAs[Long]("unmet_tokens") == 0L)
    // floor division + the cap never over-commit the budget
    assert(r.values.map(_.getAs[Long]("planned_tokens")).sum <=
      Sampling.EPOCH_TOKEN_MULT * 10004L)
    assert(big.getAs[Double]("planned_share") == 19615.0 / 20008.0)
  }

  test("sequence packing: distributed prefix sum ≡ doc_id-ordered layout") {
    import spark.implicits._
    // 40 docs with varying token counts over the 4 shuffle partitions the
    // suite runs with — enough rows that the range partitioner actually
    // splits the corpus, so partition-offset reassembly is exercised.
    val docsDf = (0L until 40L)
      .map(i => Doc(i, "w " * (i % 7 + 1).toInt)).toDF
    val dir = fixtureDir("documents" -> docsDf)
    val r = Sampling.sequencePacking(spark, dir).collect()
    // total tokens = sum over i of (i%7+1) = 5 full cycles of 28 + ...
    val total = (0L until 40L).map(_ % 7 + 1).sum
    assert(r.map(_.getLong(3)).sum == total)
    // docs land in doc_id order: the first sequence starts at doc 0 and
    // doc ranges of consecutive sequences are contiguous and increasing
    val ordered = r.sortBy(_.getLong(0))
    assert(ordered.head.getLong(4) == 0L)
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        // next sequence starts at (split doc) or after the previous one's
        // last doc — never behind it
        assert(a.getLong(5) <= b.getLong(4))
      case _ =>
    }
  }

  test("training shuffle: md5 shard, dense positions, exact token offsets") {
    import graft.ops.Sampling
    import spark.implicits._
    val docsIn = (0L until 20L).map(i =>
      Doc(i, (0 to (i % 5).toInt).map(j => s"w$j").mkString(" ")))
    val dir = fixtureDir("documents" -> docsIn.toDF)
    val r = Sampling.trainingShuffle(spark, dir).collect()
    assert(r.length == 20)
    // shard is the md5 hash-key mod N_SHARDS — recomputed independently
    def key(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Sampling.SHUFFLE_SALT}$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16)
    }
    r.foreach { x =>
      assert(x.getLong(1) == key(x.getLong(0)) % Sampling.N_SHARDS)
    }
    // per shard: positions dense from 0 in (key, doc_id) order; offsets
    // are the exclusive running token sum
    r.groupBy(_.getLong(1)).values.foreach { shard =>
      val ordered = shard.sortBy(_.getLong(2))
      assert(ordered.map(_.getLong(2)).toSeq == ordered.indices.map(_.toLong))
      assert(ordered.map(x => key(x.getLong(0))).toSeq ==
        ordered.map(x => key(x.getLong(0))).sortBy(identity).toSeq)
      var off = 0L
      ordered.foreach { x =>
        assert(x.getLong(4) == off)
        off += x.getLong(3)
      }
    }
    // determinism: a re-run yields the identical assignment
    val again = Sampling.trainingShuffle(spark, dir).collect()
    assert(r.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("weighted sample: clamp at 256 chars, exact integer threshold") {
    import graft.ops.Sampling
    import spark.implicits._
    def key(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${Sampling.WSAMPLE_SALT}$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16)
    }
    val long = "x" * 300 // >= 256 chars: keep_prob clamps to 1, always kept
    val docsIn = Doc(100L, long) +:
      (0L until 40L).map(i => Doc(i, "y" * (8 * (i.toInt + 1))))
    val dir = fixtureDir("documents" -> docsIn.toDF)
    val r = Sampling.lengthWeightedSample(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.contains(100L) && r(100L).getAs[Double]("keep_prob") == 1.0)
    (0L until 40L).foreach { i =>
      val n = 8 * (i + 1)
      val kept = key(i) < math.min(1L << 32, n * (1L << 24))
      assert(r.contains(i) == kept, s"doc $i n_chars=$n")
      if (kept && n < 256)
        assert(r(i).getAs[Double]("keep_prob") == n.toDouble / 256.0)
    }
    // the threshold actually splits the fixture
    assert(r.size > 5 && r.size < 41)
  }

  test("source cap: mega-source cut to cap, small source survives whole, rank order by quality") {
    import spark.implicits._
    // srcA: 25 docs (over the cap), srcB: 3 docs (under — survives whole)
    val docsIn = (0L until 25L).map(i =>
      Doc(i, "a" * (10 + i.toInt), source = "srcA")) ++
      (100L until 103L).map(i => Doc(i, "b" * 50, source = "srcB"))
    val dir = fixtureDir("documents" -> docsIn.toDF)
    val r = Sampling.sourceCap(spark, dir).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getAs[Long]("src_rank")))
    val bySrc = r.groupBy(_._2)
    assert(bySrc("srcA").length == Sampling.SOURCE_CAP)
    assert(bySrc("srcB").length == 3) // rank bound, not a quota
    // quality order: srcA keeps its 10 LONGEST docs (ids 15..24),
    // rank 1 = the longest (id 24)
    val keptA = bySrc("srcA").sortBy(_._3)
    assert(keptA.map(_._1).toSeq == (24L to 15L by -1L).toSeq)
    // srcB ties on n_chars=50 break by doc_id ascending
    assert(bySrc("srcB").sortBy(_._3).map(_._1).toSeq == Seq(100L, 101L, 102L))
  }

  test("source cap increment: batch docs displace stored keepers from the bottom only") {
    import spark.implicits._
    // ids 0..29 in one source, cut = 29*4/5 = 23: stored prefix holds
    // ids 0..22 (n_chars 10+i, top-10 kept = ids 13..22), batch holds
    // ids 23..29 ALL LONGER than every stored doc — the adversarial
    // boundary: 7 displacements in one batch.
    val docsIn = (0L until 23L).map(i => Doc(i, "a" * (10 + i.toInt))) ++
      (23L until 30L).map(i => Doc(i, "b" * (100 + i.toInt)))
    val dir = fixtureDir("documents" -> docsIn.toDF)
    val inc = Sampling.sourceCapIncrement(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getAs[Long]("src_rank")).toMap
    // ranks 1..7: the batch docs by length desc (29 longest)
    (0 until 7).foreach(k => assert(inc(29L - k) == k + 1L))
    // ranks 8..10: the three longest SURVIVING stored keepers
    assert(inc(22L) == 8L && inc(21L) == 9L && inc(20L) == 10L)
    assert(inc.size == Sampling.SOURCE_CAP)
    // the merge identity the oracle proves at sf0.01, pinned here at the
    // displacement boundary: increment == full recompute
    val full = Sampling.sourceCap(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getAs[Long]("src_rank")).toMap
    assert(inc == full)
  }

  test("interleave: run length 1 until a source exhausts, positions contiguous") {
    import spark.implicits._
    // uneven sources: A has 5 docs, B has 3, C has 1 — rounds 1-1 hold
    // {A,B,C}, rounds 2-3 {A,B}, rounds 4-5 {A} (the only legal runs)
    val docsIn = (0L until 5L).map(i => Doc(i, s"a $i", source = "srcA")) ++
      (10L until 13L).map(i => Doc(i, s"b $i", source = "srcB")) ++
      Seq(Doc(20L, "c", source = "srcC"))
    val dir = fixtureDir("documents" -> docsIn.toDF)
    val r = Sampling.sourceInterleave(spark, dir).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
      .sortBy(_._4)
    // global positions are exactly 0..n-1
    assert(r.map(_._4).toSeq == (0L until 9L).toSeq)
    // every round holds each alive source exactly once, in name order
    val byRound = r.groupBy(_._3)
    assert(byRound(1L).map(_._2).toSeq.sorted == Seq("srcA", "srcB", "srcC"))
    assert(byRound(4L).map(_._2).toSeq == Seq("srcA"))
    byRound.foreach { case (_, rows) =>
      assert(rows.map(_._2).distinct.length == rows.length)
      assert(rows.sortBy(_._4).map(_._2).toSeq == rows.map(_._2).toSeq.sorted)
    }
    // rounds are contiguous blocks: all of round r before all of round r+1
    val roundOf = r.map(x => x._4 -> x._3).toMap
    (0L until 8L).foreach(p => assert(roundOf(p) <= roundOf(p + 1)))
    // the headline property: no two same-source docs adjacent while
    // another source still has docs remaining
    r.sliding(2).foreach { case Array(x, y) =>
      if (x._2 == y._2) {
        val remaining = r.filter(z => z._4 > x._4 && z._2 != x._2)
        assert(remaining.isEmpty,
          s"source ${x._2} ran back-to-back at ${x._4} with others alive")
      }
    }
  }

  test("weighted reservoir: exactly k per stratum, weight dominance, stable replay") {
    import graft.ops.Sampling
    import spark.implicits._
    // en: 30 short docs + one (id 200) with n_chars far above the rest —
    // its key ln(u)/w sits within 1e-9·|ln u| of 0 and must beat every
    // unit-weight key (which is ≤ ln(u) ≈ -0.69 in expectation); de has
    // only 3 docs — fewer than k, so the whole stratum survives (the
    // reservoir is a rank bound, not a quota).
    val docsIn =
      Doc(200L, "z", lang = "en").copy(n_chars = 1000000000L) +:
        ((0L until 30L).map(i => Doc(i, "y" * 20, lang = "en")) ++
          (300L until 303L).map(i => Doc(i, "w" * 9, lang = "de")))
    val dir = fixtureDir("documents" -> docsIn.toDF)
    def run() = Sampling.weightedReservoir(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getLong(4)))
    val rows = run()
    val byLang = rows.groupBy(_._1)
    assert(byLang("en").length == Sampling.RSAMPLE_K,
      s"en must keep exactly k, got ${byLang("en").length}")
    assert(byLang("de").length == 3, "a stratum smaller than k survives whole")
    assert(byLang("en").minBy(_._4)._2 == 200L,
      "the giant-weight doc must rank first in its stratum")
    assert(rows.forall(_._3 <= 0.0), "A-ES keys are ln(u)/w <= 0")
    // membership is a pure function of the rows: byte-stable replay
    assert(run().toSeq == rows.toSeq)
  }

  test("reservoir increment ≡ full recompute (intrinsic-key rank-cap identity)") {
    import graft.ops.Sampling
    import spark.implicits._
    // 40 en + 15 de docs with varied weights; cut = 54·4 div 5 = 43, so
    // the batch spans both strata and displaces stored keepers in en.
    val docsIn = (0L until 40L).map(i =>
      Doc(i, "y" * (5 * (i.toInt % 7 + 1)), lang = "en")) ++
      (40L until 55L).map(i => Doc(i, "w" * (3 * (i.toInt % 5 + 1)),
        lang = "de"))
    val dir = fixtureDir("documents" -> docsIn.toDF)
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).sortBy(x => (x._1, x._5))
    val inc = canon(Sampling.reservoirIncrement(spark, dir).collect())
    val full = canon(Sampling.weightedReservoir(spark, dir).collect())
    assert(inc.toSeq == full.toSeq,
      "stored ⊎ batch re-rank must equal the full-corpus reservoir")
  }
}
