package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** The curation analog of [[Pipeline]] — one call runs the full
  * training-data flow a 100 TB corpus run ships:
  *
  *   1. CURATE: the q62 verdict (dedup keep ∩ quality thresholds ∩
  *      recognized language) selects the documents worth training on;
  *   2. CAP: the q139 per-source ceiling ([[ops.Sampling.capFilter]],
  *      ranked by the verdict's own n_tokens evidence) stops any single
  *      source dominating the mix — the stage between dedup and rate
  *      sampling in a RefinedWeb/FineWeb-style run;
  *   3. SAMPLE: the deterministic md5-threshold mix ([[ops.Sampling]])
  *      downsamples each predicted-language stratum to its target rate;
  *   4. SHARD: survivors' full rows land in `shards/shard=K/` by a
  *      deterministic id hash ([[Sinks.writeShards]]) for round-robin
  *      loader consumption;
  *   5. MANIFEST: a one-row summary (S7 dict-lift shape) records the
  *      stage counts, so a run is auditable without re-scanning shards.
  *
  * Every stage is a pure function of the input corpus — re-running the
  * pipeline reproduces byte-identical shard membership (the property the
  * q65 oracle pins for the sampler and SinksSpec pins for the writer).
  * The driver-side actions are the manifest counts only (1-row
  * aggregates, the Pipeline.run precedent); documents stream scan→shard
  * without collecting. */
object CurationPipeline {

  /** Runs curate → sample → shard under `outDir`; returns the manifest
    * (also written to `<outDir>/manifest`). */
  def run(
      spark: SparkSession, dir: String, outDir: String,
      nShards: Int = 8,
      sourceCap: Int = ops.Sampling.SOURCE_CAP): DataFrame = {
    import spark.implicits._
    // the verdict is the pipeline's dominant plan (the q62 dedup
    // composition) and is consumed twice — by the shard write and by the
    // manifest count — so persist it for the run's duration; id-and-
    // metadata-sized, never the text
    val verdict = ops.TextPipeline.curationVerdict(spark, dir).persist()
    try {
      val capped =
        ops.Sampling.capFilter(verdict, $"n_tokens", sourceCap)
      val sampled = ops.Sampling.sampleFilter(capped, "lang_pred")
      // shards carry the FULL document row (the loader wants text, not
      // verdict metadata): id-keyed left-semi against the sample survivors
      val shardInput = Tables(spark, dir, "documents")
        .join(sampled.select($"doc_id"), Seq("doc_id"), "left_semi")
      Sinks.writeShards(shardInput, s"$outDir/shards", "doc_id", nShards)
      // counts AFTER the write: n_sharded reads back what the loader will
      // see, so the manifest can never overstate the shipped artifact
      val nCorpus = Tables(spark, dir, "documents").count()
      val nCurated = verdict.count()
      val nCapped = capped.count()
      val nSharded = spark.read.parquet(s"$outDir/shards").count()
      val manifest = Seq(
        (nCorpus, nCurated, nCapped, nSharded, nShards.toLong)
      ).toDF("n_corpus", "n_curated", "n_capped", "n_sampled", "n_shards")
      manifest.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/manifest")
      manifest
    } finally {
      verdict.unpersist()
      // the verdict's dedup stage pins its own (id, digest) projection;
      // release exactly that tracked handle — a library caller's own
      // caches stay intact (round-7 ADVICE: clearCache here dropped
      // caches the caller owned)
      Caches.release(ops.TextPipeline.dedupBaseTag(dir))
    }
  }
}
