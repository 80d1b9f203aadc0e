package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the per-stratum A-ES weighted reservoir —
  * the q155/q159 sample kept CURRENT as documents arrive, the way
  * [[StreamingCap]] keeps the per-source keep list current: each
  * micro-batch is folded into the stored reservoir with
  * [[graft.ops.Sampling.reservoirMerge]], the same mergeable-summary
  * core the batch increment (q159) runs and the full-corpus oracle
  * proves.
  *
  * Scale design (the [[StreamingCap]] contract, inherited verbatim):
  *  - State is DIMENSION-sized (≤ strata·k rows) — the reservoir
  *    property itself — so it lives as a plain parquet dir rewritten per
  *    batch; no state store, no eviction, the corpus never rescanned.
  *  - Delivery: `foreachBatch` replays a failed batch at-least-once; the
  *    A-ES key is ROW-INTRINSIC, so the rank-cap merge identity is exact
  *    and reservoirMerge(reservoirMerge(S,B),B) = reservoirMerge(S,B)
  *    (the set-union dedup inside the core absorbs re-delivered rows) —
  *    the sink is exactly-once WITHOUT a batch-id fence. The spec pins
  *    the replay identity directly.
  *  - Publication is versioned-dir + atomic pointer swap (crash at any
  *    point leaves LATEST on the previous consistent version).
  */
/** A document arriving on the reservoir-maintenance stream. */
final case class ResDoc(doc_id: Long, lang: String, n_chars: Long)

object StreamingReservoir {

  /** Fold one (micro-)batch into the stored reservoir — pure plan, the
    * spec's equivalence/idempotence surface. Delegates to the SHARED
    * q159 core so the streaming and batch maintenance paths cannot
    * drift. */
  def mergeBatch(stored: DataFrame, batch: DataFrame): DataFrame =
    graft.ops.Sampling.reservoirMerge(stored, batch)

  private def latestVersion(stateDir: String): Option[String] = {
    val ptr = java.nio.file.Paths.get(stateDir, "LATEST")
    if (java.nio.file.Files.exists(ptr))
      Some(new String(java.nio.file.Files.readAllBytes(ptr), "UTF-8").trim)
    else None
  }

  /** Current reservoir at `stateDir`, or an empty frame before the first
    * batch lands. */
  def readState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    latestVersion(stateDir) match {
      case Some(v) => spark.read.parquet(s"$stateDir/$v")
      case None =>
        import spark.implicits._
        Seq.empty[(String, Long, Long, Double, Long)]
          .toDF("lang", "doc_id", "n_chars", "smp_key", "rk")
    }

  /** The maintain loop: arriving documents (doc_id, lang, n_chars) →
    * merged reservoir published at `stateDir` (read it back with
    * [[readState]]). */
  def ingestStream(docs: DataFrame, stateDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val prev = latestVersion(stateDir)
        val v = s"state_v$batchId"
        mergeBatch(readState(spark, stateDir), batch)
          .write.mode("overwrite").parquet(s"$stateDir/$v")
        val tmp = java.nio.file.Paths.get(stateDir, s".LATEST_$batchId")
        java.nio.file.Files.write(tmp, v.getBytes("UTF-8"))
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get(stateDir, "LATEST"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        prev.filter(_ != v).foreach { old =>
          val p = java.nio.file.Paths.get(stateDir, old)
          if (java.nio.file.Files.exists(p)) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
              .foreach(java.nio.file.Files.deleteIfExists(_))
          }
        }
        ()
      }
}
