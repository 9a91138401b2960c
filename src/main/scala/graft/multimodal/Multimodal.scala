package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata, processed
  * by batch-shaped per-partition functions.
  *
  * All three modalities decode for REAL through JDK codecs:
  * [[decodeImage]] runs `javax.imageio`'s PNG codec on payload bytes
  * inside `mapPartitions` (encode on one executor, full PNG
  * compression in between, decode on another — [[pngFor]]/
  * [[extractImageMeta]], the q72 oracle gate); [[decodeAudio]] runs
  * the JDK's WAV/PCM codec (`javax.sound.sampled` — container I/O
  * only, headless-safe) over payloads from [[wavFor]], gated by q81;
  * [[decodeVideo]] (round 12) runs the JDK's GIF reader over
  * multi-frame ANIMATED GIFs from [[gifFor]] — LZW rasters plus
  * per-frame timing metadata — gated by q173. The binary schema, the
  * Dataset[Media] typed surface, partition-batched processing (the JVM
  * analogue of `mapInPandas` batch semantics), frame sampling, and
  * feature projection are identical for all three kinds.
  *
  * Scale: decode is per-row work inside mapPartitions — embarrassingly
  * parallel, no shuffle; batches bound peak memory per task the way
  * arrow batches do for pandas UDFs. Binary payloads stay columnar in
  * parquet and are never collected to the driver.
  */
object Multimodal {

  case class Media(id: Long, kind: String, bytes: Array[Byte])
  case class MediaMeta(id: Long, kind: String, nBytes: Int, width: Int,
      height: Int, durationMs: Long, checksum: Long)
  case class Frame(id: Long, frameIdx: Int, offset: Int, length: Int)

  /** Synthetic metadata for the GENERIC mixed-kind pipeline (q27),
    * whose payloads are document text bytes, not media containers —
    * a pure function of the payload so the columnar twin and the
    * oracle agree. The real codecs live in [[decodeImage]] /
    * [[decodeAudio]] / [[decodeVideo]] over real container payloads.
    */
  def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Long) = {
    val n = bytes.length
    val width = 16 + (n % 64)
    val height = 16 + ((n * 7) % 64)
    val durationMs = kind match {
      case "audio" | "video" => n.toLong * 40L
      case _                 => 0L
    }
    (width, height, durationMs)
  }

  case class ImageMeta(id: Long, width: Int, height: Int, red: Int,
      green: Int, blue: Int, nBytes: Int)

  /** ImageIO's default stream cache writes a temp FILE per encode and
    * decode — pure disk overhead when the payload is an in-memory byte
    * array (q72 measured 3.5-8.9 s/pass at sf0.1 with it, sub-second
    * without). Touched from every codec call so each executor JVM
    * disables it exactly once.
    */
  private lazy val imageIoNoCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic tiny RGB PNG for id `id` — REAL image bytes through
    * the JDK's PNG encoder. Dimensions and the constant fill color are
    * pure functions of the id, so a decoder's output is predictable
    * without re-reading the bytes (what the q72 oracle gates).
    */
  def pngFor(id: Long): Array[Byte] = {
    imageIoNoCache
    val w = 1 + (id % 16).toInt
    val h = 1 + ((id * 3) % 16).toInt
    val rgb = (((id % 256).toInt) << 16) |
      ((((id * 7) % 256).toInt) << 8) | (((id * 13) % 256).toInt)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    Codecs.writePng(img, bos)
    bos.toByteArray
  }

  /** REAL image decode (JDK `javax.imageio`): parse the compressed
    * payload, return dimensions plus the top-left pixel's channels —
    * proof the pixel data (not just the header) round-tripped.
    */
  def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta = {
    imageIoNoCache
    val img = Codecs.readImage(bytes, Codecs.pngReaderSpi)
    require(img != null, s"payload of id=$id is not a decodable image")
    val rgb = img.getRGB(0, 0)
    ImageMeta(id, img.getWidth, img.getHeight,
      (rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff, bytes.length)
  }

  /** Image corpus: one real PNG payload per document id — the loader a
    * production pipeline replaces with `spark.read.format("binaryFile")`
    * over an image bucket. Encoding happens ON THE EXECUTORS (per-row in
    * a typed map), so payload bytes never originate on the driver.
    */
  def imageMedia(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .map(id => Media(id, "image", pngFor(id)))
  }

  /** Partition-batched REAL decode over an image corpus: the same batch
    * shape as [[extractMeta]] with the codec swapped from stub to
    * `javax.imageio`.
    */
  def extractImageMeta(media: Dataset[Media], batchSize: Int = 64)
      : Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map(m => decodeImage(m.id, m.bytes)))
    }
  }

  case class ResizedMeta(id: Long, srcW: Int, srcH: Int, rw: Int, rh: Int,
      checksum: Long)

  /** Deterministic GRADIENT PNG for id `id` — unlike [[pngFor]]'s
    * constant fill, every pixel differs (linear ramps per channel), so
    * a resize's SAMPLING decisions are observable: picking the wrong
    * source pixel changes the checksum. Still a pure function of the
    * id, so the q167 oracle predicts the resized raster without ever
    * seeing bytes.
    */
  def gradPngFor(id: Long): Array[Byte] = {
    imageIoNoCache
    val w = (4 + id % 13).toInt
    val h = (4 + (id * 3) % 13).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + 5L * x + 11L * y) % 256).toInt
        val g = ((id * 7 + 3L * x + 13L * y) % 256).toInt
        val b = ((id * 13 + 9L * x + 2L * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    Codecs.writePng(img, bos)
    bos.toByteArray
  }

  /** Nearest-neighbor resize on the decoded raster with the
    * DETERMINISTIC sampling rule sx = x'·w div tw (integer floor) —
    * hand-rolled instead of AWT's Graphics2D scaling precisely so the
    * sampled source pixel is a closed-form function an oracle can
    * mirror (interpolating scalers are implementation-defined).
    */
  def resizeNearest(img: java.awt.image.BufferedImage, tw: Int, th: Int)
      : java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(tw, th,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw) {
        out.setRGB(x, y,
          img.getRGB(x * img.getWidth / tw, y * img.getHeight / th))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Gradient-image corpus: one gradient PNG payload per document id,
    * encoded on the executors like [[imageMedia]].
    */
  def gradientMedia(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .map(id => Media(id, "image", gradPngFor(id)))
  }

  /** The RESIZE pipeline stage, end to end on executors: decode the
    * payload, nearest-neighbor downsample to tw×th, RE-ENCODE as PNG,
    * decode again, and checksum every target pixel — the emitted
    * dimensions and checksum come from the second decode, so the gate
    * proves the resized raster (not just the first decode) survived
    * the codec round trip. Same partition-batched shape as
    * [[extractImageMeta]].
    */
  def resizeImages(media: Dataset[Media], tw: Int = 4, th: Int = 4,
      batchSize: Int = 64): Dataset[ResizedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { m =>
        imageIoNoCache
        val src = Codecs.readImage(m.bytes, Codecs.pngReaderSpi)
        require(src != null, s"payload of id=${m.id} is not a decodable image")
        val resized = resizeNearest(src, tw, th)
        val bos = new java.io.ByteArrayOutputStream()
        Codecs.writePng(resized, bos)
        val back = Codecs.readImage(bos.toByteArray, Codecs.pngReaderSpi)
        var sum = 0L
        var y = 0
        while (y < back.getHeight) {
          var x = 0
          while (x < back.getWidth) {
            val rgb = back.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + 256L * ((rgb >> 8) & 0xff) +
              65536L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        ResizedMeta(m.id, src.getWidth, src.getHeight,
          back.getWidth, back.getHeight, sum)
      })
    }
  }

  case class AudioMeta(id: Long, sampleRate: Int, channels: Int,
      nSamples: Int, firstSample: Int, midSample: Int, lastSample: Int)

  /** Deterministic 16-bit PCM mono WAV for id `id` — REAL audio bytes
    * through the JDK's WAV writer (`javax.sound.sampled`; container
    * serialization only, no audio device, so it runs headless on
    * executors). Sample rate, frame count, and every PCM sample value
    * are pure functions of the id, so a decoder's output is predictable
    * without re-reading the bytes (what the q81 oracle gates).
    */
  def wavFor(id: Long): Array[Byte] = {
    val rate = 8000 + 1000 * (id % 5).toInt
    val n = 100 + (id % 400).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (((id * 31 + i.toLong * 17) % 65536) - 32768).toInt
      data(2 * i) = (v & 0xff).toByte // little-endian PCM
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, 1, true, false) // signed, little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    Codecs.writeWav(ais, bos)
    bos.toByteArray
  }

  /** REAL audio decode (JDK `javax.sound.sampled` WAV/PCM codec): parse
    * the RIFF container, return format metadata plus the decoded sample
    * values at three offsets — proof the PCM frames (not just the
    * header) round-tripped.
    */
  def decodeAudio(id: Long, bytes: Array[Byte]): AudioMeta = {
    val ais = Codecs.readWav(bytes)
    val fmt = ais.getFormat
    require(fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
        fmt.getChannels == 1,
      s"payload of id=$id is not 16-bit little-endian mono PCM")
    val n = ais.getFrameLength.toInt
    val data = ais.readAllBytes()
    require(data.length == n * 2,
      s"payload of id=$id decoded ${data.length} bytes for $n frames")
    def sample(i: Int): Int = (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
    AudioMeta(id, fmt.getSampleRate.toInt, fmt.getChannels, n,
      sample(0), sample(n / 2), sample(n - 1))
  }

  /** Audio corpus: one real WAV payload per document id — the loader a
    * production pipeline replaces with `spark.read.format("binaryFile")`
    * over an audio bucket. Encoding happens ON THE EXECUTORS (per-row in
    * a typed map), so payload bytes never originate on the driver.
    */
  def audioMedia(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .map(id => Media(id, "audio", wavFor(id)))
  }

  /** Partition-batched REAL decode over an audio corpus: the same batch
    * shape as [[extractMeta]] with the codec swapped from stub to
    * `javax.sound.sampled`.
    */
  def extractAudioMeta(media: Dataset[Media], batchSize: Int = 64)
      : Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map(m => decodeAudio(m.id, m.bytes)))
    }
  }

  /** SAMPLED media QA (round 13): per-shard decode-health stats from a
    * deterministic keyed-hash lottery's winners — the codec family's
    * 100 TB job shape. The full-decode operators (q72/q81/q167/q173/
    * q178) pay one codec round trip PER PAYLOAD, linear in the corpus;
    * a QA pass does not need that — it needs an unbiased read on
    * decode success and format drift per shard, which a ~threshold/10⁴
    * sample answers with the same HT arithmetic every sampled serve in
    * this engine uses. The lottery filter runs BEFORE payload
    * materialization/decode (at scale: before the binary-column read),
    * so cost is proportional to the SAMPLE, not the corpus.
    *
    * Output per shard (`doc_id % shards`): sampled count k, HT-scaled
    * population estimate k·(10⁴/threshold) with the q28 moment CI
    * (w(w−1) variance — exact integer k, so every column is
    * bit-portable), decode success rate over the DECODER's outcomes,
    * and mean sample-count/rate of the decoded payloads (exact integer
    * sums, one division each).
    */
  def mediaQaSampled(spark: SparkSession, dir: String,
      threshold: Int = 100, shards: Int = 4): DataFrame = {
    require(threshold >= 1 && 10000 % threshold == 0,
      "threshold must divide 10000 (exact HT weight)")
    require(shards >= 1, "shards must be >= 1")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val w = 10000.0 / threshold
    val winners = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"))
      .filter(expr(
        s"graft_h60(concat('mq:', cast(doc_id as string))) % 10000 < $threshold"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
    val qa = winners.mapPartitions { it =>
      it.grouped(64).flatMap(_.map { id =>
        // decode the winner's payload with the REAL codec; a failure is
        // a data point, not an error (that is the operator's purpose)
        val meta =
          try Some(decodeAudio(id, wavFor(id)))
          catch { case scala.util.control.NonFatal(_) => None }
        ((id % shards).toInt, meta.isDefined,
          meta.map(_.nSamples.toLong).getOrElse(0L),
          meta.map(_.sampleRate.toLong).getOrElse(0L))
      })
    }.toDF("shard", "ok", "n_samples", "rate")
    mediaQaAggregate(qa, w)
  }

  /** [[mediaQaSampled]]'s per-shard fold over the decode outcomes —
    * factored out so the failure arithmetic is spec-pinnable on a
    * synthetic outcome frame (the real lottery's payloads always
    * decode). `qa` carries (shard, ok, n_samples, rate) with 0-valued
    * measures on failed decodes; `w` is the HT expansion 10⁴/threshold.
    */
  private[graft] def mediaQaAggregate(qa: DataFrame, w: Double): DataFrame =
    qa.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("k"),
        sum(expr("case when ok then 1 else 0 end")).as("okn"),
        sum(col("n_samples")).as("ss"),
        sum(col("rate")).as("sr"))
      .select(
        col("shard"),
        col("k"),
        expr(s"cast(k as double) * $w").as("n_est"),
        expr(s"cast(k as double) * $w - 1.96 * sqrt(cast(k as double) * ${w * (w - 1.0)})")
          .as("n_ci_low"),
        expr(s"cast(k as double) * $w + 1.96 * sqrt(cast(k as double) * ${w * (w - 1.0)})")
          .as("n_ci_high"),
        expr("cast(okn as double) / cast(k as double)").as("ok_rate"),
        // means over the DECODED payloads (the documented semantics):
        // failed decodes contribute 0 to ss/sr, so the k divisor would
        // bias them low on any shard with failures; an all-failed
        // shard has no decoded mean at all (NULL, not 0/0)
        expr("case when okn = 0 then cast(null as double) " +
          "else cast(ss as double) / cast(okn as double) end")
          .as("avg_samples"),
        expr("case when okn = 0 then cast(null as double) " +
          "else cast(sr as double) / cast(okn as double) end")
          .as("avg_rate"))
      .orderBy(col("shard"))

  case class ResampledAudioMeta(id: Long, sampleRate: Int, nSamples: Int,
      firstSample: Int, midSample: Int, lastSample: Int, checksum: Long)

  /** REAL audio RESAMPLE through two codec round trips (q178 — the
    * audio twin of the q167 image resize): decode the WAV with the JDK
    * codec, nearest-sample the PCM to half the frame count with the
    * closed-form rule src = i·n div n2 ([[resizeNearest]]'s rule in one
    * dimension — hand-rolled, not an implementation-defined converter),
    * re-encode at half the rate, decode AGAIN, and report the format
    * plus three sample values and a position-weighted checksum over
    * EVERY sample from the SECOND decode — so a single wrong PCM frame
    * anywhere in the chain is observable.
    */
  def resampleAudio(id: Long, bytes: Array[Byte]): ResampledAudioMeta = {
    val ais = Codecs.readWav(bytes)
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
      fmt.getChannels == 1, s"payload of id=$id is not 16-bit LE mono")
    val n = ais.getFrameLength.toInt
    val data = ais.readAllBytes()
    def sample(i: Int): Int = (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
    val n2 = math.max(1, n / 2)
    val rate2 = fmt.getSampleRate.toInt / 2
    val out = new Array[Byte](n2 * 2)
    var i = 0
    while (i < n2) {
      val v = sample((i.toLong * n / n2).toInt)
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt2 = new javax.sound.sampled.AudioFormat(
      rate2.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    Codecs.writeWav(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(out), fmt2, n2.toLong), bos)
    val ais2 = Codecs.readWav(bos.toByteArray)
    val m = ais2.getFrameLength.toInt
    val d2 = ais2.readAllBytes()
    def s2(j: Int): Int = (d2(2 * j + 1) << 8) | (d2(2 * j) & 0xff)
    var ck = 0L
    var j = 0
    while (j < m) { ck += s2(j).toLong * (j + 1); j += 1 }
    ResampledAudioMeta(id, ais2.getFormat.getSampleRate.toInt, m,
      s2(0), s2(m / 2), s2(m - 1), ck)
  }

  /** Partition-batched resample over an audio corpus (the q178 chain):
    * same batch shape as [[extractAudioMeta]].
    */
  def resampleAudioMeta(media: Dataset[Media], batchSize: Int = 64)
      : Dataset[ResampledAudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map(m => resampleAudio(m.id, m.bytes)))
    }
  }

  case class VideoMeta(id: Long, width: Int, height: Int, nFrames: Int,
      durationMs: Long, firstRgb: Int, lastRgb: Int)

  /** Per-frame fill color of the generated video for id `id` — pure id
    * arithmetic shared by [[gifFor]] and the q173 oracle.
    */
  def videoFrameRgb(id: Long, f: Int): Int =
    ((((id + 11L * f) % 256).toInt) << 16) |
      ((((id * 7 + 29L * f) % 256).toInt) << 8) |
      (((id * 13 + 47L * f) % 256).toInt)

  /** Deterministic ANIMATED GIF for id `id` — REAL multi-frame video
    * bytes through the JDK's GIF codec (the one video container
    * `javax.imageio` ships; LZW-compressed rasters, per-frame timing
    * metadata). Each frame is constant-filled from an EXPLICIT 2-entry
    * palette (so the writer cannot quantize the color away) and
    * carries a GraphicControlExtension delay; frame count, dimensions,
    * per-frame colors, and the delay are pure functions of the id, so
    * a decoder's output is predictable without re-reading the bytes
    * (what the q173 oracle gates).
    */
  def gifFor(id: Long): Array[Byte] = {
    imageIoNoCache
    val w = 2 + (id % 8).toInt
    val h = 2 + ((id * 3) % 8).toInt
    val frames = 2 + (id % 4).toInt
    val delayCs = 4 + (id % 7).toInt // centiseconds, the GIF time unit
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val writer = Codecs.gifWriterSpi
      .map(_.createWriterInstance())
      .getOrElse(javax.imageio.ImageIO.getImageWritersByFormatName("gif").next())
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < frames) {
      val rgb = videoFrameRgb(id, f)
      val icm = new java.awt.image.IndexColorModel(8, 2,
        Array(((rgb >> 16) & 0xff).toByte, 0.toByte),
        Array(((rgb >> 8) & 0xff).toByte, 0.toByte),
        Array((rgb & 0xff).toByte, 0.toByte))
      // index 0 (the raster default) IS the fill color — nothing to paint
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img),
        writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = new javax.imageio.metadata
        .IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("transparentColorIndex", "0")
      gce.setAttribute("delayTime", delayCs.toString)
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta),
        null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** REAL video decode (JDK GIF reader): frame count, dimensions,
    * per-frame delays summed to a duration, and the first/last frames'
    * top-left pixels — proof that multi-frame pixel data AND the
    * container's timing metadata (not just a header) round-tripped.
    */
  def decodeVideo(id: Long, bytes: Array[Byte]): VideoMeta = {
    imageIoNoCache
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = Codecs.gifReaderSpi
      .filter { s =>
        try s.canDecodeInput(iis)
        catch { case scala.util.control.NonFatal(_) => false }
      }
      .map(_.createReaderInstance())
      .getOrElse {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"payload of id=$id is not a decodable video")
        readers.next()
      }
    reader.setInput(iis)
    val n = reader.getNumImages(true)
    require(n > 0, s"payload of id=$id holds no frames")
    var durMs = 0L
    var w = 0
    var h = 0
    var first = 0
    var last = 0
    var i = 0
    while (i < n) {
      val img = reader.read(i)
      w = img.getWidth
      h = img.getHeight
      val rgb = img.getRGB(0, 0) & 0xffffff
      if (i == 0) first = rgb
      last = rgb
      val root = reader.getImageMetadata(i)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gces = root.getElementsByTagName("GraphicControlExtension")
      require(gces.getLength == 1,
        s"frame $i of id=$id carries ${gces.getLength} GCE blocks")
      durMs += 10L * gces.item(0)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        .getAttribute("delayTime").toInt
      i += 1
    }
    reader.dispose()
    iis.close()
    VideoMeta(id, w, h, n, durMs, first, last)
  }

  /** Video corpus: one real animated-GIF payload per document id — the
    * loader a production pipeline replaces with
    * `spark.read.format("binaryFile")` over a video bucket. Encoding
    * happens ON THE EXECUTORS, so payload bytes never originate on the
    * driver.
    */
  def videoMedia(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .map(id => Media(id, "video", gifFor(id)))
  }

  /** Partition-batched REAL decode over a video corpus: the same batch
    * shape as [[extractMeta]] with the codec swapped to the GIF reader.
    */
  def extractVideoMeta(media: Dataset[Media], batchSize: Int = 64)
      : Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map(m => decodeVideo(m.id, m.bytes)))
    }
  }

  /** Cheap payload checksum (sum of unsigned bytes) — stands in for a
    * content hash in the typed pipeline.
    */
  private def checksum(bytes: Array[Byte]): Long = {
    var s = 0L; var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  /** Partition-batched decode: iterate each partition in fixed-size
    * batches (mapInPandas-style), decode each payload, emit typed
    * metadata rows.
    */
  def extractMeta(media: Dataset[Media], batchSize: Int = 64)
      : Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h, d) = decodeStub(m.kind, m.bytes)
          MediaMeta(m.id, m.kind, m.bytes.length, w, h, d,
            checksum(m.bytes))
        }
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * window of the byte stream becomes a "frame" reference (offset +
    * length — a real decoder seeks; the plumbing is identical).
    */
  def sampleFrames(media: Dataset[Media], frameBytes: Int = 256,
      stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = math.max(1, m.bytes.length / frameBytes)
      (0 until nFrames by stride).map { f =>
        Frame(m.id, f, f * frameBytes,
          math.min(frameBytes, m.bytes.length - f * frameBytes))
      }
    }
  }

  /** Build a Media dataset from the documents table (text payload as
    * the opaque binary; kind assigned deterministically) — the loader a
    * real pipeline replaces with `spark.read.format("binaryFile")`.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        expr("case when doc_id % 3 = 0 then 'image' when doc_id % 3 = 1 then 'audio' else 'video' end")
          .as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, kind, bytes) => Media(id, kind, bytes) }
  }
}
