package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batch-shaped partition
  * functions.
  *
  * Three format families, all REAL, behind the same mapPartitions
  * boundary:
  *  - [[decodeImage]] — `javax.imageio` (public JDK; PNG/JPEG/
  *    BMP/GIF readers ship with the JRE) decodes pixels and emits
  *    dimensions + channel statistics; undecodable bytes yield no row
  *    instead of a task failure.
  *  - [[decodeAudio]] — `javax.sound.sampled` (public JDK; the
  *    WAV/AIFF/AU readers ship with the JRE) decodes PCM samples and
  *    emits duration/rate/RMS/peak; non-PCM payloads convert through
  *    `AudioSystem` where a converter exists, or yield no row.
  *  - [[decodeVideoMeta]] — an ISO BMFF (MP4/MOV, ISO/IEC 14496-12)
  *    container-box walk: brand, movie timescale/duration, track
  *    count, and presentation dimensions from ftyp/mvhd/tkhd. No
  *    public-JDK video *pixel* codec exists, so the pixel plane stays
  *    out of scope on purpose — but container metadata is what a
  *    training-data pipeline filters and routes on (duration caps,
  *    aspect buckets, track sanity), and that part is real parsing of
  *    the real format.
  *  - [[byteFeatures]] — format-agnostic byte-level statistics
  *    (histogram, Shannon entropy, mean byte): the triage features a
  *    pipeline computes BEFORE any codec runs (corrupt-content and
  *    encrypted/random-payload screening), applicable to every kind.
  *
  * Scale notes: assets are repartitioned by id before decode so a
  * 1000-executor cluster decodes in parallel regardless of input file
  * layout; features are small fixed-width rows, so the decode stage is
  * the classic "shrink early" projection — never carry `content` past
  * it.
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Int,
      entropy: Double, mean_byte: Double, histogram: Array[Long])

  case class Frame(asset_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Deterministic fake assets derived from the documents table (text
    * bytes as content; metadata derived from doc stats) — the test/
    * bench corpus for the multimodal path.
    */
  def synthesizeAssets(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      (pmod(col("doc_id"), lit(64)) * 16 + 64).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 64).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(44100).as("sample_rate"))
      .as[Asset]
  }

  /** Format-agnostic byte-level features: byte histogram (16 bins),
    * Shannon entropy over the bins, mean byte value. This is the
    * pre-codec triage stage of a real asset pipeline — near-8-bit
    * entropy flags already-compressed/encrypted payloads, near-zero
    * entropy flags padding/corruption — and it applies uniformly to
    * every kind, which is why [[extractFeatures]] runs it unfiltered.
    */
  private[multimodal] def byteFeatures(content: Array[Byte]): (Double, Double, Array[Long]) = {
    val hist = new Array[Long](16)
    var sum = 0.0
    content.foreach { b => hist((b & 0xff) >> 4) += 1; sum += (b & 0xff) }
    val n = content.length.toDouble
    val entropy =
      if (n == 0) 0.0
      else -hist.filter(_ > 0).map { c => val p = c / n; p * math.log(p) / math.log(2) }.sum
    (entropy, if (n == 0) 0.0 else sum / n, hist)
  }

  /** Decode/feature-extract stage: batched per-partition processing
    * (the `mapInPandas` shape — bytes in, fixed-width features out),
    * with an explicit repartition so decode parallelism is independent
    * of the source file layout.
    */
  def extractFeatures(assets: Dataset[Asset], parallelism: Int = 0): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    val repart =
      if (parallelism > 0) assets.repartition(parallelism, col("asset_id"))
      else assets
    repart.mapPartitions { batch =>
      batch.map { a =>
        val (entropy, mean, hist) = byteFeatures(a.content)
        AssetFeatures(a.asset_id, a.kind, a.content.length, entropy, mean, hist)
      }
    }
  }

  case class ImageStats(asset_id: Long, px_width: Int, px_height: Int,
      n_pixels: Long, mean_luma: Double, mean_r: Double, mean_g: Double, mean_b: Double)

  /** Images above this pixel count are rejected before the pixel scan
    * — a decompression bomb (a few KB of PNG inflating to gigapixels)
    * must not OOM the executor; 64 Mpx is far above real training
    * assets and costs ~256 MB of int buffer at the default scan.
    */
  private val MaxPixels = 64L * 1024 * 1024

  /** The REAL codec: decode `content` with `javax.imageio` and reduce
    * to fixed-width pixel statistics (dimensions, per-channel means,
    * Rec.709 mean luminance). Returns None when no installed reader
    * accepts the bytes — corrupt or non-image content produces no row,
    * never a task failure (at 10⁹ assets some WILL be corrupt). Only
    * NonFatal decode errors are swallowed: an OutOfMemoryError or
    * LinkageError must fail the task, not be misfiled as "undecodable
    * bytes" and silently shrink stats coverage.
    */
  private[multimodal] def decodeImage(content: Array[Byte]): Option[ImageStats] = {
    // header-first: dimensions come from the ImageReader BEFORE any
    // pixel buffer allocates, so the bomb never inflates
    val img: java.awt.image.BufferedImage =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(content))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            if (reader.getWidth(0).toLong * reader.getHeight(0) > MaxPixels) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var r = 0.0; var g = 0.0; var b = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some(ImageStats(0L, w, h, n,
        (0.2126 * r + 0.7152 * g + 0.0722 * b) / n, r / n, g / n, b / n))
    }
  }

  /** Image decode/stats stage on the real codec — same batched
    * mapPartitions shape (and the same explicit repartition for
    * layout-independent decode parallelism) as [[extractFeatures]];
    * only `image` assets are read, and `content` is dropped at this
    * stage ("shrink early" — fixed-width stats rows travel onward, the
    * bytes never do).
    */
  def extractImageStats(assets: Dataset[Asset], parallelism: Int = 0): Dataset[ImageStats] = {
    val spark = assets.sparkSession
    import spark.implicits._
    val imgs = assets.filter(col("kind") === "image").as[Asset]
    val repart =
      if (parallelism > 0) imgs.repartition(parallelism, col("asset_id"))
      else imgs
    repart.mapPartitions { batch =>
      batch.flatMap(a => decodeImage(a.content).map(_.copy(asset_id = a.asset_id)))
    }
  }

  case class AudioStats(asset_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, duration_s: Double, rms: Double, peak: Double)

  /** The REAL audio codec: decode `content` with `javax.sound.sampled`
    * (WAV/AIFF/AU readers ship with the JRE) and reduce to fixed-width
    * sample statistics — rate, channels, frame count, duration, RMS
    * and peak in RAW 16-bit sample units (integer-exact for integer
    * signals, which is what makes the end-to-end oracle possible).
    * Non-16-bit-PCM payloads convert through `AudioSystem` when a
    * converter exists. Same failure contract as [[decodeImage]]:
    * undecodable bytes yield no row via NonFatal only — fatal JVM
    * errors still fail the task.
    */
  private[multimodal] def decodeAudio(content: Array[Byte]): Option[AudioStats] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = raw.getFormat
      val pcm16 = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, fmt.getSampleRate, 16,
        fmt.getChannels, 2 * fmt.getChannels, fmt.getSampleRate, false)
      val in =
        if (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian) raw
        else AudioSystem.getAudioInputStream(pcm16, raw)
      try {
        val bytes = in.readAllBytes()
        val nSamples = bytes.length / 2
        var i = 0
        var sumSq = 0.0
        var peak = 0L
        while (i < nSamples) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
          sumSq += (s * s).toDouble
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 1
        }
        val ch = in.getFormat.getChannels
        val frames = if (ch == 0) 0L else nSamples.toLong / ch
        val rate = in.getFormat.getSampleRate.toDouble
        Some(AudioStats(0L, rate.toInt, ch, frames,
          if (rate == 0) 0.0 else frames / rate,
          if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples),
          peak.toDouble))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Audio decode/stats stage on the real codec — the same batched
    * mapPartitions shape and "shrink early" discipline as
    * [[extractImageStats]]: only `audio` assets are read and the bytes
    * never travel past the decode.
    */
  def extractAudioStats(assets: Dataset[Asset], parallelism: Int = 0): Dataset[AudioStats] = {
    val spark = assets.sparkSession
    import spark.implicits._
    val auds = assets.filter(col("kind") === "audio").as[Asset]
    val repart =
      if (parallelism > 0) auds.repartition(parallelism, col("asset_id"))
      else auds
    repart.mapPartitions { batch =>
      batch.flatMap(a => decodeAudio(a.content).map(_.copy(asset_id = a.asset_id)))
    }
  }

  case class VideoMeta(asset_id: Long, brand: String, timescale: Long,
      duration_units: Long, duration_s: Double, n_tracks: Int,
      width: Int, height: Int)

  /** The REAL container parser: walk ISO BMFF (MP4/MOV — ISO/IEC
    * 14496-12, a public format) boxes and extract the metadata a
    * pipeline filters on — major brand (`ftyp`), movie timescale and
    * duration (`mvhd`, v0 and v1 layouts), track count (`trak`), and
    * presentation dimensions (first `tkhd` with nonzero size; stored
    * as 16.16 fixed point). Pure header arithmetic: no pixel decode,
    * no sample data read — a 2 GB asset costs the same parse as a
    * 2 KB one because `mdat` is skipped by its size field.
    *
    * Same failure contract as the image/audio codecs: malformed or
    * non-BMFF bytes yield None (every read is bounds-checked; box
    * sizes are validated to advance), never a task failure.
    */
  private[multimodal] def decodeVideoMeta(content: Array[Byte]): Option[VideoMeta] = {
    def u8(o: Int): Long = content(o) & 0xffL
    def u16(o: Int): Long = (u8(o) << 8) | u8(o + 1)
    def u32(o: Int): Long = (u16(o) << 16) | u16(o + 2)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def fourcc(o: Int): String =
      new String(content, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Box headers in [lo, hi): (type, payloadStart, payloadEnd). */
    def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var off = lo
        def hasNext: Boolean = off >= 0 && off + 8 <= hi
        def next(): (String, Int, Int) = {
          val size0 = u32(off)
          val typ = fourcc(off + 4)
          // size==1 → 64-bit largesize follows; size==0 → box runs to `hi`
          val (payload, end) =
            if (size0 == 1 && off + 16 <= hi) (off + 16L, off + u64(off + 8))
            else if (size0 == 0) (off + 8L, hi.toLong)
            else (off + 8L, off + size0)
          if (end <= off || end > hi || payload > end) { off = -1; ("", 0, 0) }
          else { off = end.toInt; (typ, payload.toInt, end.toInt) }
        }
      }
    def find(lo: Int, hi: Int, typ: String): Option[(Int, Int)] =
      boxes(lo, hi).collectFirst { case (t, s, e) if t == typ => (s, e) }

    try {
      val n = content.length
      val brand = find(0, n, "ftyp").filter { case (s, e) => e - s >= 4 }
        .map { case (s, _) => fourcc(s) }
      val (moovS, moovE) = find(0, n, "moov").getOrElse(return None)
      // mvhd: version byte selects the 32- vs 64-bit field layout
      val (ts, dur) = find(moovS, moovE, "mvhd").flatMap { case (s, e) =>
        if (e - s < 4) None
        else u8(s) match {
          case 0 if e - s >= 20 => Some((u32(s + 12), u32(s + 16)))
          case 1 if e - s >= 32 => Some((u32(s + 20), u64(s + 24)))
          case _ => None
        }
      }.getOrElse(return None)
      val traks = boxes(moovS, moovE).filter(_._1 == "trak").toSeq
      // tkhd width/height: 16.16 fixed point at layout-dependent offsets
      val dims = traks.iterator.flatMap { case (_, ts0, te) =>
        find(ts0, te, "tkhd").flatMap { case (s, e) =>
          if (e - s < 4) None
          else {
            val wOff = if (u8(s) == 1) s + 88 else s + 76
            if (e - wOff < 8) None
            else Some(((u32(wOff) >> 16).toInt, (u32(wOff + 4) >> 16).toInt))
          }
        }
      }.find { case (w, h) => w > 0 && h > 0 }
      Some(VideoMeta(0L, brand.getOrElse(""), ts, dur,
        if (ts == 0) 0.0 else dur.toDouble / ts, traks.size,
        dims.map(_._1).getOrElse(0), dims.map(_._2).getOrElse(0)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Video container-metadata stage — the same batched mapPartitions
    * shape and "shrink early" discipline as the image/audio stages:
    * only `video` assets are read, and the (possibly huge) bytes never
    * travel past the header parse.
    */
  def extractVideoMeta(assets: Dataset[Asset], parallelism: Int = 0): Dataset[VideoMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    val vids = assets.filter(col("kind") === "video").as[Asset]
    val repart =
      if (parallelism > 0) vids.repartition(parallelism, col("asset_id"))
      else vids
    repart.mapPartitions { batch =>
      batch.flatMap(a => decodeVideoMeta(a.content).map(_.copy(asset_id = a.asset_id)))
    }
  }

  /** Resize: metadata-only transform (no decode) — the cheap path a
    * real pipeline takes when only target dimensions change. The
    * byte-level resample belongs behind the same codec boundary as
    * [[decodeImage]].
    */
  def resizeMeta(assets: Dataset[Asset], targetW: Int, targetH: Int): Dataset[Asset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.map(a => a.copy(width = targetW, height = targetH))
  }

  /** Frame sampling for `video` assets: every `stride`-th fixed-size
    * chunk of the content, as one row per frame — the explode-shaped
    * op that feeds frame-level models. Deterministic; chunking stands
    * in for real frame boundaries.
    */
  def sampleFrames(assets: Dataset[Asset], frameBytes: Int, stride: Int): Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("kind") === "video").as[Asset].flatMap { a =>
      a.content.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, i) => Frame(a.asset_id, i, chunk) }
    }
  }
}
