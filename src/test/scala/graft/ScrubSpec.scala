package graft

import graft.ops.Scrub

/** Planted-PII semantics for q72: the driver corpus is PII-free (its
  * oracle proves identity), so the actual redaction behavior is pinned
  * here, the same pattern as the language-ID suite. */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("planted email, phone and IP are redacted with correct counts") {
    val dir = fixtureDir("documents" -> Seq(
      Doc(1, "reach bob.smith+x@mail.example.org or +1 555-123-4567 now"),
      Doc(2, "server 10.0.0.1 and 192.168.254.3 up"),
      Doc(3, "clean text with no identifiers at all")).toDF)
    val r = Scrub.piiScrub(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[String]("text_clean") ==
      "reach <EMAIL> or <PHONE> now")
    assert(r(1L).getAs[Long]("n_emails") == 1L)
    assert(r(1L).getAs[Long]("n_phones") == 1L)
    assert(!r(1L).getAs[Boolean]("pii_free"))
    assert(r(2L).getAs[String]("text_clean") == "server <IP> and <IP> up")
    assert(r(2L).getAs[Long]("n_ips") == 2L)
    assert(r(3L).getAs[String]("text_clean") ==
      "clean text with no identifiers at all")
    assert(r(3L).getAs[Boolean]("pii_free"))
  }

  test("a digit-run inside a redacted email never counts as a phone") {
    // evidence is taken per PASS (phones counted after email redaction),
    // so the 12-digit local part below yields n_emails=1, n_phones=0
    val dir = fixtureDir("documents" ->
      Seq(Doc(1, "contact 123456789012@corp.com now")).toDF)
    val row = Scrub.piiScrub(spark, dir).collect().head
    assert(row.getAs[String]("text_clean") == "contact <EMAIL> now")
    assert(row.getAs[Long]("n_emails") == 1L)
    assert(row.getAs[Long]("n_phones") == 0L)
  }

  test("decontamination: shared shingle with an eval doc flags the train doc") {
    def isEval(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((Scrub.EVAL_SALT + id.toString).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) < Scrub.EVAL_THRESHOLD
    }
    val evalId = (0L until 1000L).find(isEval).get
    val Seq(dirty, clean) = (0L until 1000L).filterNot(isEval).take(2)
    val dir = fixtureDir("documents" -> Seq(
      Doc(evalId, "secret eval answer tokens here"),
      Doc(dirty, "prefix words secret eval answer suffix"), // shares a shingle
      Doc(clean, "wholly unrelated training content")).toDF)
    val r = Scrub.decontaminate(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(dirty, clean), "eval docs never appear in output")
    assert(r(dirty).getAs[Long]("n_eval_hits") >= 1L)
    assert(!r(dirty).getAs[Boolean]("clean"))
    assert(r(clean).getAs[Long]("n_eval_hits") == 0L)
    assert(r(clean).getAs[Boolean]("clean"))
  }

  test("contamination provenance: per-eval-item containment, wholesale copy scores 1.0") {
    def isEval(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((Scrub.EVAL_SALT + id.toString).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) < Scrub.EVAL_THRESHOLD
    }
    val Seq(evalA, evalB) = (0L until 3000L).filter(isEval).take(2)
    val Seq(wholesale, partial, clean) =
      (0L until 3000L).filterNot(isEval).take(3)
    // evalA: 5 tokens → 3 distinct shingles; evalB disjoint vocabulary
    val dir = fixtureDir("documents" -> Seq(
      Doc(evalA, "secret eval answer tokens here"),
      Doc(evalB, "zulu yankee xray whiskey victor"),
      // contains ALL of evalA's text → containment 3/3; none of evalB's
      Doc(wholesale, "intro secret eval answer tokens here outro"),
      // shares exactly one 3-gram with evalA ("secret eval answer")
      Doc(partial, "prefix words secret eval answer"),
      Doc(clean, "wholly unrelated training content")).toDF)
    val r = Scrub.contaminationProvenance(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    // pair grain: only train docs sharing ≥1 shingle with an eval item
    assert(r.keySet == Set((wholesale, evalA), (partial, evalA)))
    val w = r((wholesale, evalA))
    assert(w.getAs[Long]("n_shared") == 3L)
    assert(w.getAs[Long]("eval_n") == 3L)
    assert(w.getAs[Double]("containment") == 1.0)
    val p = r((partial, evalA))
    assert(p.getAs[Long]("n_shared") == 1L)
    assert(p.getAs[Double]("containment") == 1.0 / 3)
  }

  test("bloom prescreen ≡ exact decontamination, even saturated") {
    // a corpus big enough that eval docs exist and shingles collide
    def isEval(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((Scrub.EVAL_SALT + id.toString).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) < Scrub.EVAL_THRESHOLD
    }
    val docs = (0L until 400L).map { id =>
      val fam = id % 7
      Doc(id, s"family $fam shared boilerplate line plus unique token u$id tail")
    }
    assert(docs.exists(d => isEval(d.doc_id)), "fixture must contain eval docs")
    val dir = fixtureDir("documents" -> docs.toDF)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
      .sorted.toSeq
    val exact = rows(Scrub.decontaminate(spark, dir))
    // well-sized filter AND a deliberately saturated one (capacity 1 →
    // 2 bits: essentially every probe comes back "maybe"): no false
    // negatives at any sizing + the exact confirm join ⇒ identical output
    for ((cap, fpp) <- Seq((Scrub.EVAL_SHINGLE_CAPACITY, 0.01), (1L, 0.5))) {
      assert(rows(Scrub.decontaminateBloom(spark, dir, cap, fpp)) == exact,
        s"bloom variant diverged at capacity=$cap fpp=$fpp")
      spark.catalog.clearCache() // decontaminateBloom cache contract
    }
  }

  test("an IPv4 is not half-eaten by the phone pattern") {
    // "10.0.0.1" is too short for PHONE_RE's {7,} interior, so the IP
    // pass sees it intact; a longer dotted-digit run WOULD be a phone
    // (dialect ambiguity resolved by the fixed email→phone→ip order).
    val dir = fixtureDir("documents" ->
      Seq(Doc(1, "host 10.0.0.1 rest")).toDF)
    val row = Scrub.piiScrub(spark, dir).collect().head
    assert(row.getAs[String]("text_clean") == "host <IP> rest")
    assert(row.getAs[Long]("n_phones") == 0L)
  }

  test("k-anonymity: small quasi-identifier groups flagged, bands split") {
    import spark.implicits._
    // en/src0 band 0: 6 docs (safe); en/src0 band 1: 2 docs (at risk);
    // de/src1 band 0: 1 doc (at risk)
    val docsIn =
      (0L until 6L).map(i => Doc(i, "x" * 30)) ++
        Seq(Doc(10L, "y" * 60), Doc(11L, "y" * 70),
          Doc(12L, "z" * 20, lang = "de", source = "src1"))
    val dir = fixtureDir("documents" -> docsIn.toDF)
    val r = graft.ops.Scrub.kAnonymity(spark, dir).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)) ->
        (x.getLong(3), x.getBoolean(4))).toMap
    assert(r(("en", "src0", 0L)) == ((6L, false)))
    assert(r(("en", "src0", 1L)) == ((2L, true)))
    assert(r(("de", "src1", 0L)) == ((1L, true)))
    assert(r.size == 3)
  }
}
