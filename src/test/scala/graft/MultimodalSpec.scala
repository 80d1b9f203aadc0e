package graft

import graft.ops.{HeaderDecoder, MediaAsset, MediaMeta, Multimodal, StubDecoder}

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

  test("HeaderDecoder parses real PNG/BMP/GIF headers from bytes") {
    // hand-built minimal containers, laid out per the public specs
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++ be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(640) ++ be32(480) ++ Array[Byte](8, 6, 0, 0, 0) ++ be32(0)
    val bmp = "BM".getBytes("US-ASCII") ++ le32(146) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(320) ++ le32(-200) ++ // top-down height
      Array.fill[Byte](100)(0)
    val gif = "GIF89a".getBytes("US-ASCII") ++ le16(12) ++ le16(34) ++
      Array.fill[Byte](8)(0)
    assert(HeaderDecoder.probe(png).contains(("png", 640, 480)))
    assert(HeaderDecoder.probe(bmp).contains(("bmp", 320, 200)))
    assert(HeaderDecoder.probe(gif).contains(("gif", 12, 34)))
    val meta = MediaMeta("image/png", 0, 0, 4)
    assert(HeaderDecoder.decode(png, meta).toSeq == Seq(640f, 480f))
    // container payloads decode through the distributed path too
    val ds = Seq(
      MediaAsset(1L, png, MediaMeta("image/png", 0, 0, 1)),
      MediaAsset(2L, "abcdefgh".getBytes("UTF-8"),
        MediaMeta("text/plain", 8, 1, 4))).toDS()
    val out = Multimodal.extractFeatures(ds, HeaderDecoder)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    assert(out(1L) == Seq(640f, 480f))
    assert(out(2L) == Seq(97.5f, 99.5f, 101.5f, 103.5f))
  }

  test("HeaderDecoder fallback is bit-identical to StubDecoder on text") {
    // the q41/q41b oracle contract: on non-container payloads the REAL
    // default decoder and the stub must emit the same bytes
    for (s <- Seq("abcdefgh", "zz", "", "a b c d e f g h i j")) {
      val bytes = s.getBytes("UTF-8")
      val meta = MediaMeta("text/plain", s.length, 1, Multimodal.FRAMES)
      assert(HeaderDecoder.decode(bytes, meta).toSeq ==
        StubDecoder.decode(bytes, meta).toSeq, s"payload '$s'")
      assert(HeaderDecoder.probe(bytes).isEmpty, s"payload '$s'")
    }
  }

  test("registered q41 emits scalar per-frame rows covering the full decode") {
    // raw array columns crash the harness's sort-and-hash compare
    // (CORRECTNESS_r03 q41) — the registered entry must stay scalar, and
    // since round 10 it carries the FULL decode output as per-frame rows
    // (asset_id, n_bytes, mean_byte, frame_idx, frame_mean,
    // n_sampled_frames) so the hex-byte DuckDB oracle can replay it.
    val df = Multimodal.mediaFeatures(spark, dir)
    assert(df.schema.fields.forall(f =>
      !f.dataType.typeName.startsWith("array")), df.schema.simpleString)
    assert(df.columns.toSeq == Seq("asset_id", "n_bytes", "mean_byte",
      "frame_idx", "frame_mean", "n_sampled_frames"))
    val rows = df.collect()
    // one row per (asset, frame)
    assert(rows.length == 3 * Multimodal.FRAMES)
    val byAsset = rows.groupBy(_.getLong(0))
    // doc 1 "abcdefgh": frame means hand-checked, identical to doc 3
    def frames(id: Long): Seq[Float] =
      byAsset(id).sortBy(_.getInt(3)).map(_.getFloat(4)).toSeq
    assert(frames(1L) == Seq(97.5f, 99.5f, 101.5f, 103.5f))
    assert(frames(1L) == frames(3L))
    assert(frames(1L) != frames(2L))
    val r1 = byAsset(1L).head
    assert(r1.getLong(1) == 8L) // n_bytes
    assert(r1.getDouble(2) == (97 to 104).sum / 8.0) // mean_byte
    assert(r1.getLong(5) == 2L) // 4 frames sampled at step 2
  }
}
