package graft
import org.apache.spark.sql.SparkSession
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(',').foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"ORACLE_SQL $n <<<${SparkEntry.oracleSql.getOrElse(n, "")}>>>")
    }
    spark.stop()
  }
}
