package graft

import graft.ops.{MediaAsset, MediaMeta, Multimodal, StubDecoder}

/** Pins the multimodal plumbing: schema round-trip, deterministic stub
  * decode, frame shapes, and frame sampling. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = fixtureDir(
    "documents" -> Seq(
      Doc(1, "abcdefgh"), // bytes 97..104
      Doc(2, "zz"),
      Doc(3, "abcdefgh") // same payload as 1
    ).toDF())

  test("assets carry opaque bytes + typed metadata") {
    val a = Multimodal.assets(spark, dir).collect().sortBy(_.asset_id)
    assert(a.map(_.asset_id).toSeq == Seq(1L, 2L, 3L))
    assert(a.head.media.sameElements("abcdefgh".getBytes("UTF-8")))
    assert(a.head.meta == MediaMeta("text/plain", 8, 1, Multimodal.FRAMES))
  }

  test("stub decoder is deterministic and frame-shaped") {
    val bytes = "abcdefgh".getBytes("UTF-8")
    val meta = MediaMeta("text/plain", 8, 1, 4)
    val f1 = StubDecoder.decode(bytes, meta)
    assert(f1.length == 4)
    // frames of 2 bytes: means of (97,98),(99,100),(101,102),(103,104)
    assert(f1.toSeq == Seq(97.5f, 99.5f, 101.5f, 103.5f))
    assert(f1.toSeq == StubDecoder.decode(bytes, meta).toSeq)
  }

  test("feature extraction runs distributed and matches local decode") {
    val rows = Multimodal.extractFeatures(Multimodal.assets(spark, dir))
      .collect().map(f => f.asset_id -> f).toMap
    assert(rows(1L).features.toSeq == Seq(97.5f, 99.5f, 101.5f, 103.5f))
    assert(rows(1L).features.toSeq == rows(3L).features.toSeq) // same bytes
    assert(rows(1L).n_bytes == 8L)
    assert(rows(1L).mean_byte == (97 to 104).sum / 8.0)
    // short payload: frames shorter than n_frames still well-defined
    assert(rows(2L).features.length == Multimodal.FRAMES)
  }

  test("frame sampling keeps every k-th frame") {
    val df = Multimodal.mediaFeaturesFull(spark, dir)
    val r = df.filter($"asset_id" === 1).head()
    val full = r.getAs[scala.collection.Seq[Float]]("features").toSeq
    val sampled = r.getAs[scala.collection.Seq[Float]]("sampled_frames").toSeq
    assert(sampled == full.zipWithIndex.filter(_._2 % 2 == 0).map(_._1))
  }

  test("q41b frame means: ASCII-only subset, per-frame rows, hand-checked") {
    // mixed fixture: doc 4 is non-ASCII (é is 2 UTF-8 bytes) and must be
    // excluded by the byte-length==char-length gate, NOT decoded wrongly
    val mixed = fixtureDir(
      "documents" -> Seq(
        Doc(1, "abcdefgh"),
        Doc(2, "zz"),
        Doc(4, "café")
      ).toDF())
    val rows = Multimodal.mediaFrameMeans(spark, mixed).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getFloat(2)).toMap
    assert(rows.keys.map(_._1).toSet == Set(1L, 2L), "non-ASCII doc leaked in")
    // doc 1: frames of 2 bytes over 97..104
    assert((0 to 3).map(f => rows((1L, f))) == Seq(97.5f, 99.5f, 101.5f, 103.5f))
    // doc 2 ("zz", n=2 < FRAMES): size=1 → frames (122),(122),empty,empty
    assert((0 to 3).map(f => rows((2L, f))) == Seq(122f, 122f, 0f, 0f))
  }

  test("registered q41 emits only scalar columns with faithful digests") {
    // raw array columns crash the harness's sort-and-hash compare
    // (CORRECTNESS_r03 q41) — the registered entry must stay scalar.
    val df = Multimodal.mediaFeatures(spark, dir)
    assert(df.schema.fields.forall(f =>
      !f.dataType.typeName.startsWith("array")), df.schema.simpleString)
    val rows = df.collect().map(r =>
      r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows(1L)._1 == Multimodal.FRAMES.toLong) // n_frames
    assert(rows(1L)._3 == 2L) // 4 frames sampled at step 2
    // identical payloads → identical digests; digest pins the bytes
    val sig = df.collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(sig(1L) == sig(3L))
    assert(sig(1L) != sig(2L))
  }
}
