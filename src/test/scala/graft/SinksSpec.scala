package graft

import java.nio.file.Files
import graft.sources.Sinks

/** Round-trip tests for the output surface (S3/S4/S6/S7/S8). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").toString

  test("parquet and CSV sinks round-trip the report") {
    val report = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "k", "v")
    val p = tmp() + "/report_parquet"
    Sinks.writeParquet(report, p)
    assert(spark.read.parquet(p).collect().toSet == report.collect().toSet)
    val c = tmp() + "/report_csv"
    Sinks.writeCsv(report, c)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(c)
    // inferSchema types small ids as Int — compare through an explicit cast.
    assert(back.select($"id".cast("long")).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("append summary sink accumulates one row per run") {
    val p = tmp() + "/summary"
    Sinks.appendSummary(Sinks.liftSummary(spark,
      Seq("run" -> 1L, "rows" -> 100L)), p)
    Sinks.appendSummary(Sinks.liftSummary(spark,
      Seq("run" -> 2L, "rows" -> 120L)), p)
    val all = spark.read.parquet(p)
    assert(all.count() == 2)
    assert(all.select("run").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("snapshot writer stamps updated_at on every row (P5 analog)") {
    val before = System.currentTimeMillis() - 1000
    val p = tmp() + "/snapshot"
    Sinks.writeSnapshot(Seq((1L, 10L), (2L, 20L)).toDF("id", "qoh"), p)
    val back = spark.read.parquet(p)
    assert(back.columns.contains("updated_at"))
    val stamps = back.select("updated_at").collect()
      .map(_.getTimestamp(0).getTime)
    assert(stamps.length == 2)
    // one batch → one stamp (current_timestamp is per-query constant)
    assert(stamps.distinct.length == 1)
    assert(stamps.forall(t => t >= before && t <= System.currentTimeMillis()))
  }

  test("bucketed tables join with zero shuffle exchanges (co-located join)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val a = (1 to 200).map(i => (i.toLong % 40, i.toDouble)).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong % 40, i * 2.0)).toDF("k", "vb")
    Sinks.writeBucketed(a, "bkt_a", Seq("k"), 4)
    Sinks.writeBucketed(b, "bkt_b", Seq("k"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val rows = joined.collect()
      assert(rows.length == 200 * 100 / 40) // 5 x_a * ~2.5 x_b per key... sanity below
      def shuffles(p: SparkPlan): Int = p match {
        case adaptive: AdaptiveSparkPlanExec => shuffles(adaptive.executedPlan)
        case stage: QueryStageExec => shuffles(stage.plan)
        case s: ShuffleExchangeLike => 1 + s.children.map(shuffles).sum
        case other => other.children.map(shuffles).sum
      }
      assert(shuffles(joined.queryExecution.executedPlan) == 0,
        joined.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("dict lift produces a typed one-row table") {
    val df = Sinks.liftSummary(spark, Seq(
      "total_value" -> 123.75,
      "n_rows" -> 42,
      "label" -> "full",
      "ok" -> true))
    assert(df.count() == 1)
    val r = df.head()
    assert(r.getAs[Double]("total_value") == 123.75)
    assert(r.getAs[Long]("n_rows") == 42L)
    assert(r.getAs[String]("label") == "full")
    assert(r.getAs[Boolean]("ok"))
  }

  test("chunked export caps rows per file without a driver-side count") {
    val p = tmp() + "/chunks"
    Sinks.chunkedExport(spark.range(10000).toDF("id").coalesce(1), p,
      rowsPerFile = 1000)
    val files = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 10) // 10k rows / 1k per file
    assert(spark.read.parquet(p).count() == 10000)
  }
}
