package graft
import org.apache.spark.sql.SparkSession

/** Cross-master result-identity check (round-11 verdict item 1's hash
  * half): runs the named registered queries under whatever master
  * `SPARK_GRAFT_MASTER` selects and prints ONE canonical digest per
  * query — every row rendered to a field-delimited string, the row
  * multiset sorted, md5 over the sorted stream. A `local[32]` run and a
  * `local-cluster[w,c,mem]` run of the same build can then be diffed
  * line for line: equal digests prove the SERIALIZED cross-JVM
  * exchanges (real worker JVMs, loopback shuffle, kryo/java round
  * trips) produce byte-identical results — the multi-JVM claim
  * SCALING.md's A/B table makes about wall time, extended to
  * correctness. Sorting makes the digest partitioning-independent
  * (cross-mode plans legitimately differ in output order); duplicates
  * are preserved (multiset, not set).
  *
  * Usage: `SPARK_GRAFT_MASTER=local-cluster[4,8,2048]
  * runMain graft.HashCheck <sfDir> <q1,q2,...>` (local-cluster needs
  * the packaged jar, same contract as [[Bench]]).
  */
object HashCheck {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    if (master.startsWith("local-cluster")) {
      val jar = sys.env.get("SPARK_GRAFT_JAR").orElse {
        val dir = new java.io.File("target/scala-2.13")
        Option(dir.listFiles()).flatMap(_.find(f =>
          f.getName.endsWith(".jar") && !f.getName.contains("sources")))
          .map(_.getAbsolutePath)
      }.getOrElse(sys.error(
        "local-cluster master needs the packaged graft jar: run `sbt " +
          "package` or set SPARK_GRAFT_JAR"))
      builder.config("spark.jars", jar)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query $n"))
      val rows = q.fn(spark, sfDir).collect().map(_.toSeq.map {
        case null => "∅"
        case d: java.math.BigDecimal => d.toPlainString
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case x => x.toString
      }.mkString("")).sorted
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
      println(s"HASH $n ${md.digest().map("%02x".format(_)).mkString}" +
        s" rows=${rows.length} master=$master")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
