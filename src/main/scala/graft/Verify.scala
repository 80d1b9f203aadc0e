package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the standard extensions path: native expressions as SQL functions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional subset for local iteration (comma-separated names); the
    // driver never sets it, so the driver dump stays the full registry.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter {
      case (name, _) => only.forall(_.contains(name))
    }
    // Per-query dump status, recorded for the durable machine-readable
    // result file below (round-15 verdict item 1: the driver's log-tail
    // parse zeroed two consecutive rounds' correctness records; a FILE
    // the driver — and the committed repo — can read cannot be truncated
    // away). Row counts come from the written parquet's footer metadata
    // (no second execution of the query).
    val status = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val rows = spark.read.parquet(s"$outDir/$name").count()
        status(name) = s"""{"status":"dumped","rows":$rows}"""
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        status(name) = s"""{"status":"failed"}"""
      }
      // Scale.prefixSum caller contract: release per-query persisted blocks.
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Durable result record, the BENCH_LAST.json pattern: written to the
    // dump dir AND (full-registry runs only) a repo-root VERIFY_LAST.json,
    // then printed as ONE stdout line — whichever channel the driver
    // captures, the record survives log truncation.
    val nFail = status.valuesIterator.count(_.contains("failed"))
    val result =
      s"""{"n_queries":${status.size},"n_failed":$nFail,"sf":${q(sfDir)},""" +
        s""""queries":${status.map { case (k, v) => s"${q(k)}:$v" }
          .mkString("{", ",", "}")}}"""
    Files.writeString(Paths.get(s"$outDir/verify_result.json"), result)
    // Root-file placement (round-16 ADVICE): a bare relative path landed
    // wherever the JVM was launched; resolve against the repo root — the
    // nearest ancestor of CWD holding build.sbt — so a wrapper launched
    // from a subdirectory still refreshes the committed VERIFY_LAST.json.
    // SPARK_GRAFT_VERIFY_OUT (absolute or relative-to-CWD) overrides.
    def repoRoot: java.nio.file.Path = {
      var d = Paths.get("").toAbsolutePath
      while (d != null && !Files.exists(d.resolve("build.sbt")))
        d = d.getParent
      if (d == null) Paths.get("").toAbsolutePath else d
    }
    val rootOut = sys.env.getOrElse("SPARK_GRAFT_VERIFY_OUT",
      if (only.isEmpty) repoRoot.resolve("VERIFY_LAST.json").toString else "")
    if (rootOut.nonEmpty)
      try Files.writeString(Paths.get(rootOut), result + "\n")
      catch { case e: Exception =>
        System.err.println(s"[verify] could not write $rootOut: $e") }
    println(result)
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
