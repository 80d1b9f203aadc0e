package graft

import org.apache.spark.storage.StorageLevel

/** Pins [[Caches.track]]'s displacement rules — the registry invariants
  * every operator's persist lifecycle rides on:
  *  1. displacing a tag with a DIFFERENT plan unpersists the orphan;
  *  2. same-plan displacement keeps the cache (CacheManager dedupes by
  *     canonical plan — unpersisting would evict the incoming frame's
  *     entry);
  *  3. (round-14 ADVICE) a handle still registered under ANOTHER tag is
  *     NOT unpersisted when one of its tags is displaced — the surviving
  *     tag's consumers keep their cache and its release() stays
  *     meaningful. */
class CachesSpec extends SparkSpec {

  private def df(n: Int) = {
    import spark.implicits._
    (1 to n).toDF("x")
  }

  test("displacing a tag with a different plan unpersists the orphan") {
    val a = df(3)
    Caches.track("cachesspec.t1", a)
    assert(a.storageLevel != StorageLevel.NONE)
    val b = df(4)
    Caches.track("cachesspec.t1", b)
    assert(a.storageLevel == StorageLevel.NONE, "orphan must unpersist")
    assert(b.storageLevel != StorageLevel.NONE)
    Caches.releasePrefix("cachesspec.")
  }

  test("same-plan displacement keeps the cache entry alive") {
    val a = df(5)
    Caches.track("cachesspec.t2", a)
    val twin = df(5) // distinct object, same canonical plan
    Caches.track("cachesspec.t2", twin)
    assert(a.storageLevel != StorageLevel.NONE,
      "same-result displacement must not evict the shared cache entry")
    Caches.releasePrefix("cachesspec.")
  }

  test("a frame tracked under two tags survives displacement of one") {
    val shared = df(7)
    Caches.track("cachesspec.a", shared)
    Caches.track("cachesspec.b", shared)
    // displace tag a with a different plan: the old handle is still
    // registered under tag b, so it must stay persisted
    Caches.track("cachesspec.a", df(8))
    assert(shared.storageLevel != StorageLevel.NONE,
      "handle still held by another tag must not be unpersisted")
    // releasing the surviving tag is then the real release
    Caches.release("cachesspec.b")
    assert(shared.storageLevel == StorageLevel.NONE)
    Caches.releasePrefix("cachesspec.")
    spark.catalog.clearCache()
  }

  test("release() keeps a plan another tag still aliases (r15 ADVICE)") {
    // the Ann pattern: two DISTINCT frames with the SAME canonical plan
    // tracked under two tags (ann.recall_base / ann.pq_base both track
    // the withNorm projection) — releasing one tag must not unpersist
    // the shared CacheManager entry under the survivor
    val a = df(9)
    val twin = df(9) // distinct object, same canonical plan
    Caches.track("cachesspec.r1", a)
    Caches.track("cachesspec.r2", twin)
    Caches.release("cachesspec.r1")
    assert(twin.storageLevel != StorageLevel.NONE,
      "releasing one tag must not evict a plan another tag still holds")
    assert(a.storageLevel != StorageLevel.NONE,
      "the shared cache entry must survive the single-tag release")
    // the LAST aliasing tag's release frees the block
    Caches.release("cachesspec.r2")
    assert(twin.storageLevel == StorageLevel.NONE)
    Caches.releasePrefix("cachesspec.")
    spark.catalog.clearCache()
  }
}
