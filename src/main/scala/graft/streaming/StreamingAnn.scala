package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** A vector arriving on the ingest stream (fixture-schema embedding plus
  * an arrival event-time, which the batch `embeddings` table lacks). */
final case class StreamVec(
    vec_id: Long, embedding: Seq[Float], arrived: java.sql.Timestamp)

/** Streaming ANN ingest — closes the train → serve → MAINTAIN lifecycle
  * the way q70 closed dedup's: [[graft.ops.Ann.ivfKmeans]]/q83 trains the
  * coarse quantizer, q48/q85 serve top-k over cell-bucketed candidates,
  * and this module keeps the cell index CURRENT between retrains: vectors
  * arriving on a stream are assigned to their nearest trained centroid in
  * `foreachBatch` — the exact [[graft.ops.Ann.assignTo]] argmin the batch
  * trainer's E-step uses, same broadcast, same tie-break — and appended
  * to a `cent_id`-partitioned parquet index, the layout an IVF probe
  * partition-prunes to its nprobe cells.
  *
  * Scale design:
  *  - STATELESS stream: given trained centroids, assignment is a pure
  *    per-row function, so there is no state store at all — cost scales
  *    with micro-batch size, never corpus size (contrast the ledger's
  *    keyed running state, which must be RocksDB-backed and evicted).
  *  - The centroid set is k rows, broadcast into every batch (k ≈
  *    `ncentroidsFor(n)` — thousands at 1e9 vectors, still broadcast
  *    range).
  *  - The sink appends one parquet dir per cell (`partitionBy`), so the
  *    serve path's cell filter stays PartitionFilters-only — no index
  *    rebuild between retrains, and a retrain swaps the centroid frame
  *    and (optionally) starts a fresh index dir.
  *  - Delivery: `foreachBatch` replays a failed batch, so the append sink
  *    is at-least-once; re-assigned duplicates carry identical
  *    (vec_id, cent_id) rows and the serve path's top-k rerank is
  *    idempotent under them (same candidate, same score). An
  *    exactly-once upgrade is the ledger sink's batchId-dedup pattern,
  *    orthogonal to assignment.
  */
object StreamingAnn {

  /** Assign one (micro-)batch to the trained centroids — `(vec_id,
    * cent_id)`. Exposed for the spec's batch-equivalence pin.
    * `exactMetric`: false (default) scores the argmin in double — deploy
    * ingest throughput; true runs the decimal leg (the metric q90/q91's
    * oracles replay — see [[graft.ops.Ann.assignTo]]'s flag contract). */
  def assignBatch(batch: DataFrame, centroids: DataFrame,
      exactMetric: Boolean = false): DataFrame =
    graft.ops.Ann.assignTo(batch, centroids, exactMetric)

  /** [[assignBatch]] carrying the vector payload — `(vec_id, embedding,
    * cent_id)`, the SELF-CONTAINED index row [[ingestStream]] appends:
    * the serve path reranks straight from the pruned cell read, no join
    * back to a corpus table. q91 writes its index through THIS function
    * (decimal leg) and oracle-proves the result end to end. */
  def indexBatch(batch: DataFrame, centroids: DataFrame,
      exactMetric: Boolean = false): DataFrame =
    graft.ops.Ann.assignVectors(batch, centroids, exactMetric)

  /** The maintain loop: arriving vectors → argmin assignment → appended
    * cell-partitioned parquet index at `indexDir` (self-contained rows
    * via [[indexBatch]]). Start with `.start()` / stop via the returned
    * query handle. */
  def ingestStream(
      vecs: DataFrame, centroids: DataFrame,
      indexDir: String): DataStreamWriter[Row] =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        indexBatch(batch, centroids)
          .write.mode("append").partitionBy("cent_id").parquet(indexDir)
        ()
      }

  /** Serve-side read of the maintained index: candidates of the probe's
    * cells only — `cent_id` is a partition column, so the filter prunes
    * directories (PartitionFilters), reading none of the other cells'
    * bytes. */
  def readCells(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      cells: Seq[Long]): DataFrame =
    spark.read.parquet(indexDir).filter(col("cent_id").isin(cells: _*))
}
