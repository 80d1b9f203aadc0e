package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A document arriving on the curation stream (fixture-schema subset plus
  * an arrival event-time, which the batch `documents` table lacks). */
final case class StreamDoc(
    doc_id: Long, text: String, arrived: java.sql.Timestamp)

/** Streaming exact dedup — the streaming twin of the q21/q70 batch
  * verdicts: documents arrive continuously and the FIRST-SEEN document
  * per content digest passes; later duplicates are dropped by keyed
  * state, so downstream consumers (quality scoring, sampling, training
  * shards) only ever see novel content.
  *
  * State design for 100 TB streams: state is one row per DISTINCT digest
  * — 32 bytes + overhead, keyed by the same md5 the batch path shuffles
  * on, never by text. Unbounded corpus ⇒ unbounded digest state, so the
  * same two knobs the ledger suite pins apply: the RocksDB state store
  * (state off-heap, per-key access) and WATERMARK EVICTION via
  * [[dedupStreamWithin]] — state older than the watermark is dropped,
  * trading "exactly once ever" for "at most once per watermark window",
  * the right trade when re-crawls arrive months apart and the batch
  * increment (q70) sweeps the long tail anyway.
  */
object StreamingDedup {

  /** First-seen-wins dedup with UNBOUNDED digest state (exact forever,
    * state grows with distinct content — the small-corpus mode). */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicates("content_hash")

  /** Bounded-state dedup: duplicates are dropped only while the first
    * copy's event time is within `delay` of the stream's watermark;
    * older state is evicted, after which a re-arriving copy is ADMITTED
    * again (the documented trade). Uses Spark's
    * `dropDuplicatesWithinWatermark` so eviction is engine-managed. */
  def dedupStreamWithin(docs: DataFrame, delay: String): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("arrived", delay)
      .dropDuplicatesWithinWatermark("content_hash")
}
