package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal._

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decode: images yield 1 frame, videos frame-sample by duration") {
    val media = Multimodal.syntheticMedia(spark, 9).repartition(4)
    val frames = Multimodal.decode(media, FakeCodec).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(0L).length === 1)  // image
    assert(byId(2L).length === 3)  // 3000 ms video at 1 fps
    assert(frames.forall(f => f.pixels.length === f.width * f.height * 3))
  }

  test("decode is deterministic across partitionings (fake codec contract)") {
    val a = Multimodal.decode(Multimodal.syntheticMedia(spark, 6).repartition(1), FakeCodec)
      .collect().map(f => (f.media_id, f.frame_index, f.pixels.toSeq)).sortBy(x => (x._1, x._2))
    val b = Multimodal.decode(Multimodal.syntheticMedia(spark, 6).repartition(5), FakeCodec)
      .collect().map(f => (f.media_id, f.frame_index, f.pixels.toSeq)).sortBy(x => (x._1, x._2))
    assert(a.toSeq === b.toSeq)
  }

  test("resize produces exact nearest-neighbour output") {
    val media = Multimodal.syntheticMedia(spark, 3)
    val frames = Multimodal.decode(media, FakeCodec)
    val small = Multimodal.resize(frames, 4, 3).collect()
    assert(small.forall(f => f.width === 4 && f.height === 3 && f.pixels.length === 36))
    // spot-check one pixel against the direct mapping
    val full = frames.collect().find(f => f.media_id == 0L && f.frame_index == 0).get
    val out = small.find(f => f.media_id == 0L && f.frame_index == 0).get
    val (x, y) = (2, 1)
    val (sx, sy) = (x * full.width / 4, y * full.height / 3)
    assert(out.pixels((y * 4 + x) * 3) === full.pixels((sy * full.width + sx) * 3))
  }

  test("dHash fingerprints group exact-content media; dedup picks min-id canonical") {
    import spark.implicits._
    // media 0 and 5 share identical content bytes → identical frames →
    // identical dHashes → one dedup group; everything else is singleton
    val base = Multimodal.syntheticMedia(spark, 5).collect()
    val dup = base(0).copy(media_id = 5L)
    val media = spark.createDataset(base.toSeq :+ dup).repartition(3)
    val hashes = Multimodal.dhash(Multimodal.decode(media, FakeCodec))
    val fps = Multimodal.dedupByFingerprint(hashes).collect()
    assert(fps.length === 6)
    val byId = fps.map(f => f.media_id -> f).toMap
    assert(byId(5L).media_fp === byId(0L).media_fp)
    assert(byId(5L).canonical_media === 0L) // dup resolves to the min id
    assert(byId(0L).canonical_media === 0L)
    assert(fps.filter(f => f.media_id != 5L).forall(f => f.canonical_media == f.media_id))
    // dhash shape: (w−1)×h bits per frame
    val h = hashes.collect()
    assert(h.forall(x => x.dhash.length === 7 * 6 && x.dhash.forall(c => c == '0' || c == '1')))
    // deterministic across partitionings (groupBy order independence)
    val fps2 = Multimodal.dedupByFingerprint(
      Multimodal.dhash(Multimodal.decode(media.repartition(1), FakeCodec)))
      .collect().map(f => (f.media_id, f.media_fp, f.canonical_media)).sortBy(_._1)
    assert(fps2.toSeq === fps.map(f => (f.media_id, f.media_fp, f.canonical_media)).sortBy(_._1).toSeq)
  }

  test("ImageIoCodec decodes real PNGs; dHash collides for near-identical frames") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def png(f: Int => Int): Array[Byte] = {
      val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32) {
        val v = f(x) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val meta = MediaMeta("image", "image/png", Some(8), Some(6), None, None)
    val media = spark.createDataset(Seq(
      MediaRow(0L, meta, png(x => (x * 37) % 200)),
      // visually near-identical: uniform +2 brightness preserves every
      // adjacent-pixel ordering, so the PERCEPTUAL hash must not move
      // even though the content bytes (and any cryptographic hash) differ
      MediaRow(1L, meta, png(x => (x * 37) % 200 + 2)),
      // visually different: reversed ramp flips every ordering
      MediaRow(2L, meta, png(x => 200 - (x * 37) % 200)))).repartition(2)
    val hs = Multimodal.dhash(Multimodal.decode(media, ImageIoCodec))
      .collect().map(h => h.media_id -> h.dhash).toMap
    assert(hs(0L).length === 7 * 6)
    assert(hs(0L) === hs(1L), "near-identical images must collide under dHash")
    val dist = hs(0L).zip(hs(2L)).count { case (a, b) => a != b }
    assert(dist > 20, s"dissimilar images must be Hamming-distant (got $dist)")
    // the d6 pigeonhole bridge: near-dups collide, distinct content does not
    val fps = Multimodal.dedupByFingerprint(
      Multimodal.dhash(Multimodal.decode(media, ImageIoCodec))).collect()
    assert(fps.find(_.media_id == 1L).get.canonical_media === 0L)
    assert(fps.find(_.media_id == 2L).get.canonical_media === 2L)
  }

  test("features: 11-dim vector, channel means in [0,1], histogram sums to 1") {
    val media = Multimodal.syntheticMedia(spark, 6)
    val feats = Multimodal.features(Multimodal.decode(media, FakeCodec)).collect()
    assert(feats.length === 6)
    feats.foreach { f =>
      assert(f.feature.length === 11)
      assert(f.feature.take(3).forall(v => v >= 0f && v <= 1f))
      assert(math.abs(f.feature.drop(3).sum - 1f) < 1e-3)
    }
    assert(feats.find(_.media_id == 2L).get.modality === "video")
    assert(feats.find(_.media_id == 0L).get.modality === "image")
  }
}
