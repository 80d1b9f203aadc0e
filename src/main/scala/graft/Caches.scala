package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracked persist() handles for library entry points.
  *
  * Several operators persist an intermediate that MULTIPLE subtrees of
  * their (lazy) returned plan consume — the dedup digest base, the
  * k-means embedding projection, the bloom eval-shingle carve, the q84
  * stored-history fixture. The persist must still be registered when the
  * CALLER finally materializes the plan, so the operator cannot
  * `unpersist()` in a `finally` before returning; and `spark.catalog
  * .clearCache()` (the harness mains' per-query contract) is too blunt
  * for a long-lived user session — it drops caches the caller owns
  * (round-7 ADVICE).
  *
  * This registry is the middle path: operators `track(tag, df)` their
  * persisted handles, and a caller releases exactly the caches a module
  * created — [[release]] by tag, or a module-scoped [[releasePrefix]]
  * (e.g. `Caches.releasePrefix("ann.")` after an IVF session) — without
  * touching anything else in the session. Tags embed the source dir so
  * two dirs' caches never alias. Re-tracking an identical plan is safe:
  * Spark's CacheManager dedupes cached plans, and the registry keeps the
  * newest handle. The harness mains keep their `clearCache()` contract
  * unchanged (it also empties this registry's storage; stale registry
  * entries then unpersist as no-ops).
  */
object Caches {
  private val reg = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Drop registry entries whose plan has NO live cache entry (round-16
    * ADVICE: a tag left behind by `spark.catalog.clearCache()` would
    * otherwise keep `aliased` true for a freshly tracked same-plan frame
    * forever, turning the live tag's release into a permanent no-op —
    * a leak in long sessions mixing clearCache with track/release).
    *
    * The purge MUST run before a new `persist()` re-creates the cache
    * entry: `Dataset.storageLevel` is a CacheManager lookup keyed by the
    * canonical PLAN, not by handle, so once a same-plan frame is
    * re-persisted the stale tag's handle reports the new entry's level
    * and becomes indistinguishable from a live alias — which is why the
    * check sits at the top of [[track]] (pre-persist) and [[release]]
    * rather than inside the alias predicate. */
  private def purgeStale(): Unit =
    reg.foreach { case (t, h) =>
      if (h.storageLevel == StorageLevel.NONE) { reg.remove(t, h); () }
    }

  /** Persist `df` (if not already persisted) and track the handle under
    * `tag`; returns `df`. A displaced handle whose plan DIFFERS from the
    * incoming one is unpersisted here (round-13 ADVICE: repeat-callable
    * track sites would otherwise accumulate orphaned persisted frames
    * over a long session). Same-plan displacement must NOT unpersist:
    * Spark's CacheManager dedupes by canonical plan, so dropping the old
    * handle would evict the cache entry the incoming frame relies on —
    * and that protection extends across TAGS (round-14 ADVICE): the same
    * frame tracked under two tags and displaced under one stays cached
    * while any OTHER registry entry still resolves to the same result,
    * so the surviving tag's consumers keep their cache and its later
    * release() stays meaningful. */
  def track(tag: String, df: DataFrame): DataFrame = {
    purgeStale()
    if (df.storageLevel == StorageLevel.NONE) df.persist()
    reg.put(tag, df).foreach { old =>
      def same(a: DataFrame, b: DataFrame) =
        a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed)
      if ((old ne df) && !same(old, df) &&
          !reg.exists { case (t, h) => t != tag && same(h, old) })
        old.unpersist()
    }
    df
  }

  /** Unpersist and forget the handle tracked under `tag` (no-op when
    * absent or already cleared by the harness's clearCache). Mirrors
    * [[track]]'s cross-tag guard (round-15 ADVICE): when another
    * registry entry's handle is sameResult with the removed one — e.g.
    * `ann.recall_base:<dir>` and `ann.pq_base:<dir>` both tracking the
    * withNorm plan — releasing ONE tag must not unpersist the shared
    * CacheManager entry out from under the surviving tag's consumers;
    * the block is freed when the LAST aliasing tag releases. */
  def release(tag: String): Unit = {
    purgeStale()
    reg.remove(tag).foreach { old =>
      val aliased = reg.values.exists(h =>
        h.queryExecution.analyzed.sameResult(old.queryExecution.analyzed))
      if (!aliased) old.unpersist()
    }
  }

  /** Release every tracked handle whose tag starts with `prefix` — the
    * module-scoped cleanup (`"textpipeline."`, `"ann."`, …). */
  def releasePrefix(prefix: String): Unit =
    reg.keys.filter(_.startsWith(prefix)).foreach(release)

  /** Tags currently tracked (diagnostics/tests). */
  def tracked: Set[String] = reg.keySet.toSet
}
