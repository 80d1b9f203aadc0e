package graft

import org.apache.spark.sql.SaveMode
import graft.sources.Sinks

/** S1/S6 JDBC pass-through, executed for real against in-process Derby
  * (ships with Spark — `/opt/spark/jars/derby-*.jar`; `memory:` databases
  * live and die inside this JVM, no files, no network). The environment
  * has no external warehouse, so Derby IS the integration target; against
  * PostgreSQL et al. only the URL changes — the reference's extract
  * (`data_extractor.py:27-36`) and summary append (`data_loader.py:86-94`)
  * are the same `format("jdbc")` calls.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("S1: Tables() reads a jdbc: dir as a warehouse connection") {
    import spark.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "value")
    Sinks.writeJdbc(df, url, "t_read", SaveMode.Overwrite)
    // the same call shape every operator uses for parquet dirs
    val back = Tables(spark, url, "t_read")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet == Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    // predicate reaches the remote scan (the S2 incremental shape works
    // over JDBC too): the v1 JDBC relation reports PushedFilters
    val plan = back.filter($"id" > 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"filter not pushed into the JDBC scan:\n$plan")
  }

  test("S6: appendSummary over a jdbc: path accumulates run rows") {
    val s1 = Sinks.liftSummary(spark, Seq(
      "load_type" -> "full", "n_reports" -> 12L, "total_rows" -> 100L))
    val s2 = Sinks.liftSummary(spark, Seq(
      "load_type" -> "incremental_recompute", "n_reports" -> 12L,
      "total_rows" -> 7L))
    Sinks.writeJdbc(s1, url, "run_summary", SaveMode.Overwrite)
    Sinks.appendSummary(s2, url, table = "run_summary")
    val back = Tables(spark, url, "run_summary")
    assert(back.count() == 2L)
    assert(back.select("load_type").collect().map(_.getString(0)).toSet ==
      Set("full", "incremental_recompute"))
  }

  test("S1 scale path: range-partitioned extract slices the table") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("id", "v")
    Sinks.writeJdbc(df, url, "t_part", SaveMode.Overwrite)
    val part = Tables.jdbcPartitioned(spark, url, "t_part", "id", 1L, 100L, 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100L)
    assert(part.agg(Dx.dsum(part("v"))).as[Double].head() == 2.0 * 5050)
  }
}
