package graft

import graft.ops.Quality

/** Pins the DQ rule ladder's FIRST-MATCH precedence (the reference's
  * sequential `loc` assignments never overwrite an earlier tag —
  * `wsm/etl_pipeline/extract/data_extractor.py:80-103`) and that the
  * valid filter is idempotent. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  // Quality.AS_OF = 2024-01-28; "future" rows are after it.
  private lazy val dir = fixtureDir(
    "events" -> Seq(
      // matches ALL THREE rules → first match (invalid_reference) wins.
      Ev(1, ts("2024-06-01 00:00:00"), 10, "purchase", 0.5, """{"k": 99}"""),
      // matches invalid_value AND future_date → invalid_value wins.
      Ev(2, ts("2024-06-01 00:00:00"), 11, "signup", 0.2, """{"k": 1}"""),
      // future only.
      Ev(3, ts("2024-06-01 00:00:00"), 12, "view", 50.0, """{"k": 2}"""),
      // value < 1 but event_type not in (purchase, signup) → valid.
      Ev(4, ts("2024-01-01 00:00:00"), 13, "click", 0.1, """{"k": 3}"""),
      // clean.
      Ev(5, ts("2024-01-01 00:00:00"), 14, "purchase", 9.9, """{"k": 4}""")
    ).toDF())

  test("asOf is caller-parameterized (C2): an earlier as-of reclassifies rows") {
    import org.apache.spark.sql.functions.{lit, to_timestamp}
    // with as-of rolled back before every event, the previously-valid rows
    // become future_date; first-match precedence is unchanged (event 2 is
    // still invalid_value, not future_date).
    val tags = Quality.tagged(spark, dir,
      asOf = to_timestamp(lit("2023-01-01 00:00:00")))
      .select("event_id", "dq_issue").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tags == Map(
      1L -> "invalid_reference", 2L -> "invalid_value",
      3L -> "future_date", 4L -> "future_date", 5L -> "future_date"))
  }

  test("one-pass DQ fan-out writes valid + per-rule quarantine partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft-dq").toString + "/fanout"
    graft.sources.Sinks.writeDqFanout(Quality.tagged(spark, dir), out)
    val back = spark.read.parquet(out)
    // the valid partition IS the valid stream (and reading it prunes to
    // one directory — check the pushed partition filter ran: counts match)
    val valid = back.filter($"dq_issue" === "valid")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(valid == Set(4L, 5L))
    val perRule = back.groupBy("dq_issue").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perRule == Map(
      "invalid_reference" -> 1L, "invalid_value" -> 1L,
      "future_date" -> 1L, "valid" -> 2L))
  }

  test("streaming DQ fan-out matches the batch fan-out per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files.createTempDirectory("graft-dqs").toString
    val input = MemoryStream[Ev]
    val tagged = input.toDF().withColumn("dq_issue", Quality.dqIssue)
    val q = graft.streaming.StreamingLedger.dqFanoutStream(
      tagged, s"$base/out", s"$base/ckpt")
    try {
      input.addData(
        Ev(1, ts("2024-06-01 00:00:00"), 10, "purchase", 0.5, """{"k": 99}"""),
        Ev(5, ts("2024-01-01 00:00:00"), 14, "purchase", 9.9, """{"k": 4}"""))
      q.processAllAvailable()
      input.addData(
        Ev(3, ts("2024-06-01 00:00:00"), 12, "view", 50.0, """{"k": 2}"""))
      q.processAllAvailable()
      val back = spark.read.parquet(s"$base/out")
      val perRule = back.groupBy("dq_issue").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perRule == Map(
        "invalid_reference" -> 1L, "future_date" -> 1L, "valid" -> 1L))
    } finally q.stop()
  }

  test("rule ladder is first-match: earlier rules mask later ones") {
    val tags = Quality.tagged(spark, dir)
      .select("event_id", "dq_issue").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tags == Map(
      1L -> "invalid_reference",
      2L -> "invalid_value",
      3L -> "future_date",
      4L -> "valid",
      5L -> "valid"))
  }

  test("valid stream + quarantine partition the input; filter is idempotent") {
    val valid = Quality.validEvents(spark, dir)
    assert(valid.select("event_id").collect().map(_.getLong(0)).toSet == Set(4L, 5L))
    // Idempotent: re-tagging the valid stream never quarantines a row.
    val retagged = valid.withColumn("dq_issue", Quality.dqIssue)
    assert(retagged.filter($"dq_issue" =!= "valid").count() == 0)
    val counts = Quality.quarantineSummary(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(
      "invalid_reference" -> 1L, "invalid_value" -> 1L,
      "future_date" -> 1L, "valid" -> 2L))
  }

  test("column profile: nulls, exact distincts, type-pinned min/max strings") {
    import org.apache.spark.sql.functions.{col, lit, when}
    import spark.implicits._
    val base = Seq(
      Li(part = 1, supp = 1, qty = 10, price = 100.5, flag = "A", ts("2001-01-01 00:00:00")),
      Li(part = 2, supp = 1, qty = 20, price = 250.25, flag = "R", ts("2001-06-15 00:00:00")),
      Li(part = 3, supp = 1, qty = 10, price = 99.0, flag = "N", ts("2001-12-31 00:00:00"))
    ).toDF
      // one null discount — case-class fixtures can't express it directly
      .withColumn("l_discount",
        when(col("l_partkey") === 2, lit(null)).otherwise(col("l_discount")))
    val dir = fixtureDir("lineitem" -> base)
    val r = graft.ops.Quality.columnProfile(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == graft.ops.Quality.PROFILE_COLS.map(_._1).toSet)
    assert(r("l_quantity").getLong(1) == 3L) // n_rows everywhere
    assert(r("l_discount").getLong(2) == 1L) // the injected null
    assert(r("l_discount").getLong(3) == 1L) // distinct ignores null: {0.0}
    assert(r("l_quantity").getLong(3) == 2L) // {10, 20}
    assert(r("l_quantity").getString(4) == "10.000000")
    assert(r("l_quantity").getString(5) == "20.000000")
    assert(r("l_extendedprice").getString(4) == "99.000000")
    assert(r("l_extendedprice").getString(5) == "250.250000")
    assert(r("l_returnflag").getString(4) == "A")
    assert(r("l_returnflag").getString(5) == "R")
    assert(r("l_shipdate").getString(4) == "2001-01-01")
    assert(r("l_shipdate").getString(5) == "2001-12-31")
  }

  test("value histogram: floor binning, exact extremes and shares") {
    import spark.implicits._
    val dir = fixtureDir("events" -> Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 10.0, "{}"),
      Ev(2, ts("2024-01-01 10:01:00"), 1, "view", 60.0, "{}"),
      Ev(3, ts("2024-01-01 10:02:00"), 1, "view", 75.5, "{}"),
      Ev(4, ts("2024-01-01 10:03:00"), 2, "view", 160.0, "{}")).toDF)
    val r = graft.ops.Quality.valueHistogram(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(0L, 1L, 3L)) // empty bins not emitted
    assert(r(0L).getAs[Double]("bin_lo") == 0.0)
    assert(r(1L).getAs[Double]("bin_lo") == 50.0)
    assert(r(1L).getAs[Long]("n_events") == 2L)
    assert(r(1L).getAs[Double]("min_value") == 60.0)
    assert(r(1L).getAs[Double]("max_value") == 75.5)
    assert(r(1L).getAs[Double]("share") == 0.5)
    assert(r(3L).getAs[Double]("share") == 0.25)
  }

  test("fk orphans: both directions, distinct-key probe, exact rates") {
    import spark.implicits._
    val li = Seq(1L, 1L, 2L, 99L).toDF("l_orderkey")
    val orders = Seq(1L, 2L, 3L).toDF("o_orderkey")
    val dir = fixtureDir("lineitem" -> li, "orders" -> orders)
    val r = graft.ops.Quality.fkOrphans(spark, dir).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r("lineitem_orphans") == ((4L, 1L, 0.25))) // the key-99 row
    assert(r("orders_childless") == ((3L, 1L, 1.0 / 3))) // order 3
  }

  test("profile drift: baseline slice vs current, growth ratios and flags") {
    import spark.implicits._
    // checkpoint 2024-01-15 (Incremental.CHECKPOINT): base = 2 events,
    // current adds 2 more with a NEW event type and a higher max value
    val dir = fixtureDir("events" -> Seq(
      Ev(1, ts("2024-01-10 10:00:00"), 1, "view", 10.0, "{}"),
      Ev(2, ts("2024-01-12 10:00:00"), 2, "view", 20.0, "{}"),
      Ev(3, ts("2024-01-20 10:00:00"), 1, "click", 30.0, "{}"),
      Ev(4, ts("2024-01-21 10:00:00"), 3, "view", 20.0, "{}")).toDF)
    val r = graft.ops.Quality.profileDrift(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("value", "user_id", "event_type", "ts"))
    val v = r("value")
    assert(v.getAs[Long]("n_rows_base") == 2L)
    assert(v.getAs[Long]("n_rows_cur") == 4L)
    assert(v.getAs[Double]("row_growth") == 2.0)
    assert(v.getAs[Long]("n_distinct_base") == 2L) // {10, 20}
    assert(v.getAs[Long]("n_distinct_cur") == 3L) // {10, 20, 30}
    assert(v.getAs[Double]("distinct_growth") == 1.5)
    assert(!v.getAs[Boolean]("min_changed"))
    assert(v.getAs[Boolean]("max_changed")) // 20 -> 30
    val t = r("event_type")
    assert(t.getAs[Long]("n_distinct_base") == 1L)
    assert(t.getAs[Long]("n_distinct_cur") == 2L) // click arrived
    assert(t.getAs[Boolean]("min_changed")) // 'click' < 'view'
  }
}
