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

  test("extractImageStats decodes real PNGs via javax.imageio; junk bytes drop, not crash") {
    import spark.implicits._
    // render real PNGs in memory: a solid-red 8x4 and a half-black/
    // half-white 4x4 (known channel means), plus one junk-bytes asset
    def png(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val red = png(8, 4, (_, _) => 0xff0000)
    val bw = png(4, 4, (x, _) => if (x < 2) 0x000000 else 0xffffff)
    val in = Seq(
      Asset(1L, "image", red, 8, 4, 0),
      Asset(2L, "image", bw, 4, 4, 0),
      Asset(3L, "image", "not a png".getBytes("UTF-8"), 0, 0, 0),
      Asset(4L, "video", red, 8, 4, 0)) // wrong kind: filtered, not decoded
      .toDS()
    val stats = extractImageStats(in, parallelism = 2).collect()
      .map(s => s.asset_id -> s).toMap
    assert(stats.keySet == Set(1L, 2L)) // junk dropped, video filtered
    val r = stats(1L)
    assert(r.px_width == 8 && r.px_height == 4 && r.n_pixels == 32)
    assert(r.mean_r == 255.0 && r.mean_g == 0.0 && r.mean_b == 0.0)
    assert(math.abs(r.mean_luma - 0.2126 * 255) < 1e-9)
    val m = stats(2L)
    assert(m.mean_r == 127.5 && m.mean_g == 127.5 && m.mean_b == 127.5)
    assert(math.abs(m.mean_luma - 127.5) < 1e-9)
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
