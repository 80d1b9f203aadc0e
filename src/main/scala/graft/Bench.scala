package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every headline query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is FULLY materialized via a noop-format
  * write (every column computed, nothing collected) — `.count()` would let
  * Catalyst prune the aggregate/window work out of the measurement. Failures
  * are reported per-query as -1 and make the process exit nonzero: a broken
  * query must never read as a fast one.
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
    var failed = List.empty[String]
    val results = SparkEntry.registry.filter(_.headline).map { q =>
      val t0 = System.nanoTime()
      try {
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        q.name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: $e")
          failed ::= q.name
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
