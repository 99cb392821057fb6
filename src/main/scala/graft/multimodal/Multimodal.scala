package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batch-shaped partition
  * functions.
  *
  * Two codecs behind the same mapPartitions boundary:
  *  - [[decodeImage]] is REAL — `javax.imageio` (public JDK; PNG/JPEG/
  *    BMP/GIF readers ship with the JRE) decodes pixels and emits
  *    dimensions + channel statistics; undecodable bytes yield no row
  *    instead of a task failure.
  *  - [[decodeStub]] remains the deterministic test double for the
  *    formats this container has no codec for (audio/video): it
  *    derives fake features from the raw bytes so the surrounding
  *    plumbing — asset schema, batched per-partition iteration (the
  *    Scala analog of `mapInPandas` batches), partitioning for
  *    parallel decode, feature schema — stays testable; swapping in a
  *    JNI/library decoder changes one function.
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

  /** ??? in spirit — the codec boundary. Deterministic fake "decode":
    * byte histogram (16 bins), Shannon entropy over the bins, mean
    * byte value. A real implementation decodes pixels/samples here;
    * the signature (bytes → fixed-width features) is the contract.
    */
  private[multimodal] def decodeStub(content: Array[Byte]): (Double, Double, Array[Long]) = {
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
        val (entropy, mean, hist) = decodeStub(a.content)
        AssetFeatures(a.asset_id, a.kind, a.content.length, entropy, mean, hist)
      }
    }
  }

  case class ImageStats(asset_id: Long, px_width: Int, px_height: Int,
      n_pixels: Long, mean_luma: Double, mean_r: Double, mean_g: Double, mean_b: Double)

  /** The REAL codec: decode `content` with `javax.imageio` and reduce
    * to fixed-width pixel statistics (dimensions, per-channel means,
    * Rec.709 mean luminance). Returns None when no installed reader
    * accepts the bytes — corrupt or non-image content produces no row,
    * never a task failure (at 10⁹ assets some WILL be corrupt).
    */
  private[multimodal] def decodeImage(content: Array[Byte]): Option[ImageStats] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Throwable => null }
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

  /** Resize: metadata-only transform (no decode) — the cheap path a
    * real pipeline takes when only target dimensions change. The
    * byte-level resample belongs behind the same codec boundary as
    * [[decodeStub]].
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
