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

  test("extractFeatures: byte-level triage features, content dropped") {
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

  test("extractAudioStats decodes real WAVs via javax.sound.sampled; junk bytes drop, not crash") {
    import spark.implicits._
    // in-memory WAVs with known sample content: a constant +1000 mono
    // signal (rms = peak = 1000 exactly) and a stereo ±2000 square
    def wav(samples: Array[Short], channels: Int, rate: Int): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong / channels)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val mono = wav(Array.fill[Short](160)(1000), channels = 1, rate = 16000)
    val stereo = wav(
      Array.tabulate[Short](200)(i => if (i % 2 == 0) 2000 else -2000),
      channels = 2, rate = 8000)
    val in = Seq(
      Asset(1L, "audio", mono, 0, 0, 16000),
      Asset(2L, "audio", stereo, 0, 0, 8000),
      Asset(3L, "audio", "not a wav".getBytes("UTF-8"), 0, 0, 0),
      Asset(4L, "image", mono, 0, 0, 16000)) // wrong kind: filtered
      .toDS()
    val stats = extractAudioStats(in, parallelism = 2).collect()
      .map(s => s.asset_id -> s).toMap
    assert(stats.keySet == Set(1L, 2L)) // junk dropped, image filtered
    val m = stats(1L)
    assert(m.sample_rate == 16000 && m.channels == 1 && m.n_frames == 160)
    assert(m.duration_s == 160.0 / 16000.0)
    assert(m.rms == 1000.0 && m.peak == 1000.0)
    val st = stats(2L)
    assert(st.channels == 2 && st.n_frames == 100)
    assert(st.rms == 2000.0 && st.peak == 2000.0)
  }

  // --- ISO BMFF helpers for the video-metadata tests: build headers
  // byte-by-byte at their ISO/IEC 14496-12 offsets
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def mkBox(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
  }
  private val unity = be32(0x00010000L) ++ be32(0) ++ be32(0) ++
    be32(0) ++ be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L)
  private def mvhdV0(ts: Long, dur: Long) = mkBox("mvhd", be32(0),
    be32(0), be32(0), be32(ts), be32(dur), be32(0x00010000L), be16(0x0100), be16(0),
    be32(0), be32(0), unity, Array.fill(24)(0.toByte), be32(2))
  private def mvhdV1(ts: Long, dur: Long) = mkBox("mvhd", be32(0x01000000L),
    be64(0), be64(0), be32(ts), be64(dur), be32(0x00010000L), be16(0x0100), be16(0),
    be32(0), be32(0), unity, Array.fill(24)(0.toByte), be32(2))
  private def tkhdV0(w: Int, h: Int) = mkBox("tkhd", be32(7),
    be32(0), be32(0), be32(1), be32(0), be32(0), be32(0), be32(0),
    be16(0), be16(0), be16(0), be16(0), unity,
    be32(w.toLong << 16), be32(h.toLong << 16))
  private def tkhdV1(w: Int, h: Int) = mkBox("tkhd", be32(0x01000007L),
    be64(0), be64(0), be32(1), be32(0), be64(0), be32(0), be32(0),
    be16(0), be16(0), be16(0), be16(0), unity,
    be32(w.toLong << 16), be32(h.toLong << 16))
  private val ftyp = mkBox("ftyp",
    "isom".getBytes("US-ASCII"), be32(512), "mp41".getBytes("US-ASCII"))

  test("decodeVideoMeta parses v0 and v1 ISO BMFF layouts, skips mdat by size") {
    val v0 = ftyp ++ mkBox("moov", mvhdV0(1000, 45000), mkBox("trak", tkhdV0(640, 360))) ++
      mkBox("mdat", Array.fill(64)(0x77.toByte))
    val m0 = decodeVideoMeta(v0).get
    assert(m0.brand == "isom" && m0.timescale == 1000 && m0.duration_units == 45000)
    assert(m0.duration_s == 45.0 && m0.n_tracks == 1)
    assert(m0.width == 640 && m0.height == 360)
    // v1: 64-bit creation/modification/duration fields shift every offset
    val v1 = ftyp ++ mkBox("moov", mvhdV1(90000, 5400000L),
      mkBox("trak", tkhdV1(1920, 1080)), mkBox("trak", tkhdV1(0, 0)))
    val m1 = decodeVideoMeta(v1).get
    assert(m1.timescale == 90000 && m1.duration_units == 5400000L)
    assert(m1.duration_s == 60.0 && m1.n_tracks == 2)
    assert(m1.width == 1920 && m1.height == 1080) // zero-size audio track skipped
  }

  test("decodeVideoMeta handles 64-bit largesize boxes and refuses malformed bytes") {
    // mdat with size==1 + largesize BEFORE moov: the walk must use the
    // 64-bit length to hop over it
    val body = Array.fill(32)(0x11.toByte)
    val large = be32(1) ++ "mdat".getBytes("US-ASCII") ++ be64(16L + body.length) ++ body
    val bytes = ftyp ++ large ++ mkBox("moov", mvhdV0(600, 1200), mkBox("trak", tkhdV0(320, 240)))
    val m = decodeVideoMeta(bytes).get
    assert(m.duration_s == 2.0 && m.width == 320)
    // malformed: junk, truncated moov, zero-size box loop, no mvhd
    assert(decodeVideoMeta("not an mp4 at all".getBytes("UTF-8")).isEmpty)
    decodeVideoMeta(bytes.take(bytes.length - 20)) // truncated: must not throw
    assert(decodeVideoMeta(mkBox("moov", Array.empty[Byte])).isEmpty)
    assert(decodeVideoMeta(Array[Byte](0, 0, 0, 0, 'm', 'o', 'o', 'v')).isEmpty)
  }

  test("extractVideoMeta: video-only, shrink-early, junk drops not crashes") {
    import spark.implicits._
    val good = ftyp ++ mkBox("moov", mvhdV0(1000, 30000), mkBox("trak", tkhdV0(854, 480)))
    val in = Seq(
      Asset(1L, "video", good, 854, 480, 0),
      Asset(2L, "video", "garbage".getBytes("UTF-8"), 0, 0, 0),
      Asset(3L, "image", good, 854, 480, 0)) // wrong kind: filtered
      .toDS()
    val metas = extractVideoMeta(in, parallelism = 2).collect()
    assert(metas.map(_.asset_id).toSet == Set(1L))
    assert(metas.head.duration_s == 30.0 && metas.head.width == 854)
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
