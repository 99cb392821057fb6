package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  private lazy val assets =
    synthesizeAssets(graft.Tables.documents(spark, sf("documents")))

  test("synthesized assets carry binary content + typed metadata") {
    val a = assets.filter(col("asset_id") === 3).head()
    assert(a.kind == "image") // 3 % 3 == 0 → first kind
    assert(a.content.nonEmpty)
    assert(a.width >= 64 && a.height >= 64)
  }

  test("extractFeatures: deterministic fake decode, content dropped") {
    val f = extractFeatures(assets, parallelism = 4)
    assert(!f.columns.contains("content")) // shrink-early: no bytes past decode
    val rows = f.collect()
    assert(rows.length == assets.count())
    rows.foreach { r =>
      assert(r.n_bytes > 0)
      assert(r.entropy >= 0.0 && r.entropy <= 4.0) // 16 bins → ≤ log2(16)
      assert(r.histogram.sum == r.n_bytes)
    }
    // deterministic: same input → same features
    val again = extractFeatures(assets, parallelism = 2).collect()
      .map(r => r.asset_id -> r.entropy).toMap
    rows.foreach(r => assert(again(r.asset_id) == r.entropy))
  }

  test("resizeMeta rewrites dimensions without touching content") {
    val r = resizeMeta(assets, 224, 224).head()
    assert(r.width == 224 && r.height == 224 && r.content.nonEmpty)
  }

  test("sampleFrames: video-only, strided fixed-size chunks") {
    val frames = sampleFrames(assets, frameBytes = 32, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 2 == 0))
    assert(frames.forall(_.frame_bytes.length <= 32))
    val videoIds = assets.filter(col("kind") === "video")
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.asset_id).toSet.subsetOf(videoIds))
  }
}
