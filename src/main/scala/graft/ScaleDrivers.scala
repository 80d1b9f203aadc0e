package graft
import org.apache.spark.sql.SparkSession

/** Scale-driver measurement for the SCALING.md curvature analysis
  * (round-9): for each dir, print the near-dup operators' documented COST
  * DRIVERS — SRP candidate-pair volume (q88/q89's bucket-join
  * cardinality, from occupancy alone) and df-bounded posting-pair volume
  * (q27's candidate-join cardinality, from the df histogram alone) — so
  * per-decade wall-time slopes can be judged against the quantity the
  * operator actually processes, not against corpus rows. On the
  * generated corpora the planted cluster/class count is FIXED (10 labels;
  * fixed dup-class arithmetic), so in-cluster pair volume grows
  * quadratically with corpus size BY CONSTRUCTION — this tool measures
  * exactly how much of a super-linear wall-time segment that explains.
  *
  * Usage: runMain graft.ScaleDrivers <dir> [dir...]
  */
object ScaleDrivers {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleDrivers <dir> [dir...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val c = ops.Ann.candidateStats(spark, dir).head()
      val p = ops.TextPipeline.postingStats(spark, dir).head()
      println(
        s"""{"dir":"$dir","srp":{"n":${c.getLong(0)},""" +
          s""""nplanes":${c.getInt(1)},"n_buckets":${c.getLong(2)},""" +
          s""""max_occ":${c.getLong(3)},"cand_pairs":${c.getLong(4)},""" +
          s""""capped_pairs":${c.getLong(5)}},""" +
          s""""shingle":{"n_docs":${p.getLong(0)},""" +
          s""""rare_shingles":${p.getLong(1)},""" +
          s""""posting_pairs":${p.getLong(2)},""" +
          s""""cand_pairs":${p.getLong(3)},""" +
          s""""rerank_rows":${p.getLong(4)}}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
