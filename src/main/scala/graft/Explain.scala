package graft
import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of the named queries
  * (all headline queries if none given) plus a parquet-scan count per plan —
  * the per-round check that no query re-reads the fact table more often
  * than its design claims (VERDICT round-2 wrongs #3/#4).
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the standard extensions path: native expressions as SQL functions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.registry
      .filter(q => names.isEmpty || names(q.name))
      .foreach { q =>
        val df = q.fn(spark, sfDir)
        // Execute first, then read each scan node's numOutputRows metric:
        // static plan text over-counts (cached-plan lineage is printed but
        // not re-executed; AQE reuses identical stages at runtime). Must run
        // THIS QueryExecution's plan instances — df.foreach would build a
        // separate deserializing execution and the metrics would land there.
        df.queryExecution.toRdd.foreach(_ => ())
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
        def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case s: QueryStageExec => scans(s.plan)
          case c: InMemoryTableScanExec => scans(c.relation.cachedPlan)
          case f: FileSourceScanExec => Seq(f)
          case other => other.children.flatMap(scans)
        }
        // Dedupe by node identity: a reused stage appears at several tree
        // positions but executed once; two distinct scans with equal counts
        // must still both be reported.
        val executed = scans(df.queryExecution.executedPlan)
          .groupBy(System.identityHashCode(_)).values.map(_.head)
          .map(f => f.relation.location.rootPaths.headOption
            .map(_.getName).getOrElse("?")
            -> f.metrics("numOutputRows").value)
          .toSeq.sorted
        val desc = executed
          .map { case (t, n) => s"$t=$n" }.mkString(", ")
        println(s"==== ${q.name}: rows actually read per scan: $desc")
        if (sys.env.get("EXPLAIN_FULL").contains("1")) df.explain("formatted")
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
