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
