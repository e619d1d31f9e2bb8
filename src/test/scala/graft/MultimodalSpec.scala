package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def assets = Multimodal.syntheticAssets(spark, sf)

  test("image features: one row per image asset, fixed embedding dims") {
    val imgs = assets.filter(_.kind == "image")
    val feats = Multimodal.imageFeatures(assets, embedDims = 16)
    assert(feats.count() == imgs.count())
    val f = feats.head()
    assert(f.embedding.length == 16)
    assert(f.mean_luma > 0.0)
  }

  test("feature extraction is deterministic (stub codec is pure)") {
    val a = Multimodal.imageFeatures(assets).collect().map(f => f.asset_id -> f.mean_luma).toMap
    val b = Multimodal.imageFeatures(assets).collect().map(f => f.asset_id -> f.mean_luma).toMap
    assert(a == b)
  }

  test("resize updates metadata and bounds bytes") {
    val resized = Multimodal.resize(assets, 32, 24).collect()
    resized.foreach { a =>
      assert(a.width == 32 && a.height == 24)
      assert(a.bytes.length <= 32 * 24)
    }
  }

  test("frame sampling explodes videos at the requested stride") {
    val vids = assets.filter(_.kind == "video").collect()
    val frames = Multimodal.sampleFrames(assets, everyN = 4).collect()
    val expected = vids.map(v => (v.n_frames + 3) / 4).sum
    assert(frames.length == expected)
    assert(frames.forall(_.frame_bytes.length <= 16))
  }
}
