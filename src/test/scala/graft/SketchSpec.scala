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
}
