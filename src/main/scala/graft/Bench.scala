package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every headline query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is FULLY materialized via a noop-format
  * write (every column computed, nothing collected) — `.count()` would let
  * Catalyst prune the aggregate/window work out of the measurement. Failures
  * are reported per-query as -1 and make the process exit nonzero: a broken
  * query must never read as a fast one.
  *
  * One untimed warm-up run precedes the loop (JVM/codegen/parquet-footer
  * warm-up would otherwise land entirely on whichever query happens to run
  * first — ~6 s of noise in round 2), and the cache is cleared between
  * queries (Scale.prefixSum's caller contract) so no query benefits from a
  * predecessor's persisted intermediates.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val headline = SparkEntry.registry.filter(_.headline)
    // Untimed warm-up: the first headline query end-to-end.
    try {
      headline.headOption.foreach(
        _.fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    } catch { case _: Throwable => () }
    var failed = List.empty[String]
    val results = headline.map { q =>
      val t0 = System.nanoTime()
      try {
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        q.name -> dt
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: $e")
          failed ::= q.name
          spark.catalog.clearCache()
          q.name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
