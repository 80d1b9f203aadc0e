package graft

import org.apache.spark.sql.SparkSession

/** Round-16 scale harnesses.
  *
  * [[ComponentsScale]]: the dedup-components fixpoint family (q60/q93/
  * q138) measured at generated decades — wall time per operator, the
  * fixpoint's rounds-to-convergence ([[ops.Scale.lastComponentRounds]]),
  * the CAPPED evidence volume actually joined ([[ops.TextPipeline
  * .shingleEvidence]]) and the hot-fallback driver histogram
  * (driver_pairs vs capped_pairs) — the verdict-item-3/4 record: the
  * components family must finish a planted mega-cluster corpus WITHOUT
  * materializing C(d,2) pairs, and the fixpoint's decade behavior
  * (rounds stay diameter-bounded) needs a measured 1000× point.
  *
  * [[ComposedScale]]: the composed [[CurationPipeline.run]] DAG (verdict
  * → cap → sample → shards → manifest) as ONE run — wall time, total
  * file-input volume from task metrics (ground-truth IO, immune to plan
  * double-counting), and the same for the pipeline's PARTS run
  * standalone — the verdict-item-5 evidence that composition shares
  * scans (composed ≪ Σ parts).
  */
object ComponentsScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ComponentsScale <dir> [dir...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    args.foreach { dir =>
      // evidence leg first: the capped near-dup edge stream the family
      // consumes, counted (the measured "edge volume <= K*n" claim)
      val (evSec, nearEdges) =
        timed(ops.TextPipeline.shingleEvidence(spark, dir))
      spark.catalog.clearCache()
      val (s60, n60) = timed(ops.TextPipeline.dedupComponents(spark, dir))
      val r60 = ops.Scale.lastComponentRounds
      spark.catalog.clearCache()
      val (s93, n93) =
        timed(ops.TextPipeline.componentRepresentatives(spark, dir))
      val r93 = ops.Scale.lastComponentRounds
      spark.catalog.clearCache()
      val (s138, n138) = timed(ops.TextPipeline.dedupImpact(spark, dir))
      val r138 = ops.Scale.lastComponentRounds
      spark.catalog.clearCache()
      val h = ops.TextPipeline.hotFallbackStats(spark, dir).head()
      spark.catalog.clearCache()
      println(
        s"""{"dir":"$dir","near_edges":$nearEdges,"evidence_s":$evSec,""" +
          f""""q60":{"secs":$s60%.1f,"rounds":$r60,"rows":$n60},""" +
          f""""q93":{"secs":$s93%.1f,"rounds":$r93,"rows":$n93},""" +
          f""""q138":{"secs":$s138%.1f,"rounds":$r138,"rows":$n138},""" +
          s""""hot_fallback":{"n_docs":${h.getLong(0)},""" +
          s""""qualifying_docs":${h.getLong(1)},""" +
          s""""max_bucket_occ":${h.getLong(3)},""" +
          s""""driver_pairs":${h.getLong(4)},""" +
          s""""capped_pairs":${h.getLong(5)}}}""")
    }
    spark.stop()
  }
}

/** See [[ComponentsScale]] scaladoc. Usage:
  * runMain graft.ComposedScale <dir> <outDir> — prints one JSON line
  * with the composed CurationPipeline.run wall/IO and the standalone
  * parts' wall/IO. */
object ComposedScale {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ComposedScale <dir> <outDir>")
    val Array(dir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // ground-truth IO: task-level file-input bytes/records — counts real
    // reads only (a cache hit or reused exchange adds nothing), so the
    // shared-scan claim cannot be faked by plan-shape accounting
    val inBytes = new java.util.concurrent.atomic.AtomicLong
    val inRecs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            inBytes.addAndGet(m.inputMetrics.bytesRead)
            inRecs.addAndGet(m.inputMetrics.recordsRead)
            ()
          }
        }
      })
    def measure[A](f: => A): (Double, Long, Long, A) = {
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val b0 = inBytes.get(); val r0 = inRecs.get()
      val t0 = System.nanoTime()
      val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      (dt, inBytes.get() - b0, inRecs.get() - r0, a)
    }
    // composed: the one-call DAG a real run ships
    val (cSec, cBytes, cRecs, _) =
      measure(CurationPipeline.run(spark, dir, s"$outDir/composed"))
    spark.catalog.clearCache()
    // parts, standalone: verdict, cap, sample each materialized from
    // scratch (the per-query registry entries a naive caller would run
    // one by one), plus the shard write from a re-derived sample
    val (vSec, vBytes, vRecs, _) = measure {
      ops.TextPipeline.curationVerdict(spark, dir).count()
      Caches.release(ops.TextPipeline.dedupBaseTag(dir)); ()
    }
    spark.catalog.clearCache()
    val (capSec, capBytes, capRecs, _) = measure {
      ops.Sampling.capFilter(
        ops.TextPipeline.curationVerdict(spark, dir),
        $"n_tokens", ops.Sampling.SOURCE_CAP).count()
      Caches.release(ops.TextPipeline.dedupBaseTag(dir)); ()
    }
    spark.catalog.clearCache()
    val (smpSec, smpBytes, smpRecs, _) = measure {
      val sampled = ops.Sampling.sampleFilter(
        ops.Sampling.capFilter(
          ops.TextPipeline.curationVerdict(spark, dir),
          $"n_tokens", ops.Sampling.SOURCE_CAP), "lang_pred")
      val shardInput = Tables(spark, dir, "documents")
        .join(sampled.select($"doc_id"), Seq("doc_id"), "left_semi")
      sources.Sinks.writeShards(shardInput, s"$outDir/parts_shards",
        "doc_id", 8)
      Caches.release(ops.TextPipeline.dedupBaseTag(dir)); ()
    }
    spark.catalog.clearCache()
    val pSec = vSec + capSec + smpSec
    val pBytes = vBytes + capBytes + smpBytes
    val pRecs = vRecs + capRecs + smpRecs
    println(
      f"""{"dir":"$dir","composed":{"secs":$cSec%.1f,""" +
        s""""input_bytes":$cBytes,"input_records":$cRecs},""" +
        f""""parts":{"secs":$pSec%.1f,"input_bytes":$pBytes,""" +
        s""""input_records":$pRecs,""" +
        f""""stage_secs":{"verdict":$vSec%.1f,"cap":$capSec%.1f,""" +
        f""""sample_shard":$smpSec%.1f}}}""")
    spark.stop()
  }
}
