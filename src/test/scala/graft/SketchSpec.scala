package graft

import graft.ops.{Ann, Sketch}
import org.apache.spark.sql.Row

/** Pins for the sketch family (q128/q131/q133/q134) and the quantized
  * ANN screen (q132): the properties the scaladocs argue from, checked
  * at the boundary — CMS never underestimates (and matches an
  * independent JDK-MD5 replay), HLL max-merge is exactly the full-scan
  * sketch, and the int8 screen + exact rerank reproduces brute force
  * when the candidate budget covers the corpus. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  /** JDK-side replay of the Tables.Dx 32-bit md5 prefix key. */
  private def hashKey(salt: String, id: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((salt + id).getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("q131 CMS: overestimate invariant + independent JDK-MD5 replay") {
    // 300 distinct singleton terms force bucket collisions (300 terms
    // into 64 counters per row) around one hot term with count 40.
    val words =
      Seq.fill(40)("hot") ++ (0 until 300).map(i => f"t$i%03d")
    val docsRows = words.grouped(20).zipWithIndex.map { case (g, i) =>
      Doc(i.toLong, g.mkString(" "))
    }.toSeq
    val dir = fixtureDir("documents" -> docsRows.toDF)
    val got = Sketch.cmsHarness(spark, dir).collect()
    assert(got.length == Sketch.CMS_TOPK)
    // the construction's one-sided error bound, on every emitted row
    got.foreach { r =>
      assert(r.getAs[Long]("over_err") >= 0L,
        s"CMS underestimated ${r.getAs[String]("term")}")
      assert(r.getAs[Long]("n_total") == words.length.toLong)
    }
    // independent replay: exact counts + md5 bucket sums in plain Scala
    val exact = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val counters = Array.ofDim[Long](Sketch.CMS_D, Sketch.CMS_W)
    for ((t, c) <- exact; r <- 0 until Sketch.CMS_D)
      counters(r)((hashKey(s"cms$r", t) % Sketch.CMS_W).toInt) += c
    def cms(t: String): Long =
      (0 until Sketch.CMS_D)
        .map(r => counters(r)((hashKey(s"cms$r", t) % Sketch.CMS_W).toInt))
        .min
    got.foreach { r =>
      val t = r.getAs[String]("term")
      assert(r.getAs[Long]("c_exact") == exact(t))
      assert(r.getAs[Long]("est") == cms(t),
        s"CMS estimate for $t drifted from the JDK replay")
    }
    // the hot term leads the exact ranking
    assert(got.head.getAs[String]("term") == "hot")
  }

  test("q134 HLL increment: stored+batch max-merge == the full-scan sketch") {
    val docsRows = (0 until 120).map(i => Doc(i.toLong, s"text body $i"))
    val dir = fixtureDir("documents" -> docsRows.toDF)
    val inc = Sketch.hllIncrement(spark, dir).head()
    val full = Sketch.hllHarness(spark, dir).collect()
      .find(_.getAs[String]("source") == "ALL").get
    assert(inc.getAs[Long]("n_regs") == full.getAs[Long]("n_regs"))
    assert(inc.getAs[Long]("z_scaled") == full.getAs[Long]("z_scaled"))
    assert(inc.getAs[Double]("est") == full.getAs[Double]("est"))
  }

  test("q132 quantized ANN == brute force when candidates cover the corpus") {
    // 12 vectors (< SQ_CAND) with a CONSTANT dimension exercising the
    // zero-range guard: every vector survives the screen, so the exact
    // rerank must reproduce q29's brute-force result row for row.
    val vecs = (0 until 12).map { i =>
      val a = i / 11.0f
      Emb(i.toLong, Seq(a, 1.0f - a, 0.5f, (i % 3) / 2.0f), i % 3)
    }
    val dir = fixtureDir("embeddings" -> vecs.toDF)
    val sq = Ann.sqTopK(spark, dir)
      .select("query_id", "neighbor_id", "cosine", "rnk").collect()
    val bf = Ann.bruteForceTopK(spark, dir).collect()
    assert(sq.length == bf.length && sq.nonEmpty)
    sq.zip(bf).foreach { case (a, b) => assert(a == b) }
  }

  test("q133 sampled quantiles: exact leg matches q69; error is |est-exact|") {
    val docsRows = (0 until 80).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      Doc(i.toLong, "x" * (10 + i), lang)
    }
    val dir = fixtureDir("documents" -> docsRows.toDF)
    val got = Sketch.sampledQuantiles(spark, dir).collect()
    val exact = ops.Sampling.lengthQuantiles(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Double]("p")) ->
        r.getAs[Double]("q")).toMap
    assert(got.length == exact.size)
    got.foreach { r =>
      val k = (r.getAs[String]("lang"), r.getAs[Double]("p"))
      assert(r.getAs[Double]("q_exact") == exact(k))
      assert(r.getAs[Long]("n_samp") <= r.getAs[Long]("n_full"))
      if (!r.isNullAt(r.fieldIndex("q_est")))
        assert(r.getAs[Double]("abs_err") ==
          math.abs(r.getAs[Double]("q_est") - r.getAs[Double]("q_exact")))
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The q136 gram-key set of a token stream, replayed in plain Scala. */
  private def kmvKeys(toks: Seq[String]): Set[String] =
    toks.sliding(Sketch.KMV_GRAM_K).map(g =>
      md5hex("kmv" + g.mkString(" "))).toSet

  test("q136 KMV saturation: sketches below K are exact sets") {
    // two sources, one doc each, 55 tokens, sharing a 15-token middle
    // segment -> 48 distinct grams per source (all < K=256: SATURATED),
    // 15-8+1 = 8 shared grams (boundary grams mix unique tokens).
    val s = (0 until 15).map(i => s"s$i")
    val ta = (0 until 20).map(i => s"a$i") ++ s ++ (20 until 40).map(i => s"a$i")
    val tb = (0 until 20).map(i => s"b$i") ++ s ++ (20 until 40).map(i => s"b$i")
    val dir = fixtureDir("documents" -> Seq(
      Doc(0L, ta.mkString(" "), source = "sa"),
      Doc(1L, tb.mkString(" "), source = "sb")).toDF)
    val r = Sketch.kmvOverlap(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("src_a") == "sa")
    assert(row.getAs[Long]("n_a") == 48L && row.getAs[Long]("n_b") == 48L)
    // saturation: est IS the exact count, no estimator involved
    assert(row.getAs[Double]("est_a") == 48.0)
    assert(row.getAs[Double]("est_b") == 48.0)
    assert(row.getAs[Long]("k_eff") == 88L) // 48+48-8 < K
    assert(row.getAs[Double]("est_union") == 88.0)
    assert(row.getAs[Long]("n_match") == 8L)
    assert(row.getAs[Long]("n_exact_overlap") == 8L)
    assert(math.abs(row.getAs[Double]("est_overlap") - 8.0) < 1e-9)
  }

  test("q136 KMV above saturation: full JDK signature replay") {
    // 500 tokens per source, shared 120-token middle -> 493 grams each
    // (> K: estimation regime), 113 truly shared.
    val s = (0 until 120).map(i => s"s$i")
    val ta = (0 until 190).map(i => s"a$i") ++ s ++ (190 until 380).map(i => s"a$i")
    val tb = (0 until 190).map(i => s"b$i") ++ s ++ (190 until 380).map(i => s"b$i")
    val dir = fixtureDir("documents" -> Seq(
      Doc(0L, ta.mkString(" "), source = "sa"),
      Doc(1L, tb.mkString(" "), source = "sb")).toDF)
    val row = Sketch.kmvOverlap(spark, dir).collect().head
    // independent replay: sets, bottom-K signatures, signature-level
    // union merge, and the (K-1)*2^60/u estimate in plain Scala — the
    // identical IEEE ops, so doubles compare EXACTLY.
    val (ka, kb) = (kmvKeys(ta), kmvKeys(tb))
    assert(ka.size == 493 && (ka intersect kb).size == 113)
    val sigA = ka.toSeq.sorted.take(Sketch.KMV_K)
    val sigB = kb.toSeq.sorted.take(Sketch.KMV_K)
    def est(sig: Seq[String], n: Int): Double =
      if (sig.length < Sketch.KMV_K) sig.length.toDouble
      else Sketch.KMV_NUM /
        java.lang.Long.parseLong(sig.last.take(15), 16).toDouble
    val uSig = (sigA ++ sigB).distinct.sorted.take(Sketch.KMV_K)
    val nMatch = uSig.count(k => sigA.contains(k) && sigB.contains(k))
    // rank containment: every union-bottom-K member of A B is in both
    // SIGNATURES, so matches are true intersection members
    assert(uSig.filter(k => ka(k) && kb(k)).forall(k =>
      sigA.contains(k) && sigB.contains(k)))
    assert(row.getAs[Long]("n_match") == nMatch.toLong)
    assert(row.getAs[Long]("n_match") <= row.getAs[Long]("n_exact_overlap"))
    assert(row.getAs[Long]("n_exact_overlap") == 113L)
    assert(row.getAs[Long]("k_eff") == Sketch.KMV_K.toLong)
    assert(row.getAs[Double]("est_a") == est(sigA, ka.size))
    assert(row.getAs[Double]("est_union") == est(uSig, 0))
    val expOverlap = nMatch.toDouble / Sketch.KMV_K * est(uSig, 0)
    assert(row.getAs[Double]("est_overlap") == expOverlap)
    // the estimator is in the right regime: within 35% of truth here
    assert(math.abs(row.getAs[Double]("est_a") - 493.0) < 493.0 * 0.35)
  }
}
