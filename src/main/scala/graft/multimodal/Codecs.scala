package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, OutputStream}

import javax.imageio.spi.{ImageReaderSpi, ImageWriterSpi}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem, UnsupportedAudioFileException}
import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}

/** Codec provider handles resolved ONCE per JVM (guide §4.5: heavyweight
  * state per task, never per row).
  *
  * `AudioSystem.getAudioInputStream` / `AudioSystem.write` route EVERY
  * call through a synchronized global provider registry and then try
  * every installed provider in registration order — for our WAV payloads
  * that is three wrong readers (AIFF, AU, SoftMidi) each THROWING
  * `UnsupportedAudioFileException` before `WaveFileReader` accepts, on
  * every single read. Measured on the q178 corpus (5 000 payloads,
  * local[32]): 14 s via AudioSystem, 3.8 s iterating the provider list
  * directly (the exception churn), 0.2 s calling the one capable
  * provider — a 70× difference for byte-identical output. The same
  * registry-scan pattern applies to `ImageIO.read/write/getImageReaders`
  * (smaller constant; the temp-FILE stream cache was already disabled).
  *
  * Selection is by CAPABILITY, not class name: the reader/writer that
  * accepts a generated probe payload at init. Per-row calls go straight
  * to that provider; anything it rejects falls back to the full
  * AudioSystem/ImageIO path, so behavior on foreign inputs is unchanged.
  * Image reader/writer INSTANCES are not thread-safe and are created
  * per call from the cached SPI (plain object construction — the
  * registry scan is what's hoisted).
  */
private[multimodal] object Codecs {
  import scala.jdk.CollectionConverters._

  private def loader = getClass.getClassLoader

  /** 1-frame 16-bit mono PCM WAV, written via AudioSystem once at init —
    * the capability probe for reader/writer selection.
    */
  private lazy val probeWav: Array[Byte] = {
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(Array[Byte](0, 0)), fmt, 1L),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The capable reader's CLASS, probed once. Instances are constructed
    * per call (round 17, matching the ImageIO SPI pattern below): the
    * JDK WaveFileReader is stateless so sharing one instance happened to
    * be safe, but the capability probe selects WHATEVER provider accepts
    * the probe WAV — a stateful third-party reader must not be shared
    * across executor threads. Construction is plain `new`; the hoisted
    * cost was only ever the registry scan + wrong-provider exceptions.
    */
  lazy val wavReaderClass: Option[Class[_ <: AudioFileReader]] =
    java.util.ServiceLoader.load(classOf[AudioFileReader], loader)
      .iterator().asScala.find { r =>
        try { r.getAudioInputStream(new ByteArrayInputStream(probeWav)).close(); true }
        catch { case scala.util.control.NonFatal(_) => false }
      }.map(_.getClass)

  private def newWavReader(): Option[AudioFileReader] =
    wavReaderClass.flatMap { c =>
      try Some(c.getDeclaredConstructor().newInstance())
      catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Capable writer's CLASS, probed once; per-call instances (the same
    * thread-safety reasoning as [[wavReaderClass]]).
    */
  lazy val wavWriterClass: Option[Class[_ <: AudioFileWriter]] = {
    def probeAis: AudioInputStream = {
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      new AudioInputStream(new ByteArrayInputStream(Array[Byte](0, 0)), fmt, 1L)
    }
    java.util.ServiceLoader.load(classOf[AudioFileWriter], loader)
      .iterator().asScala.find { w =>
        try w.isFileTypeSupported(AudioFileFormat.Type.WAVE, probeAis)
        catch { case scala.util.control.NonFatal(_) => false }
      }.map(_.getClass)
  }

  private def newWavWriter(): Option[AudioFileWriter] =
    wavWriterClass.flatMap { c =>
      try Some(c.getDeclaredConstructor().newInstance())
      catch { case scala.util.control.NonFatal(_) => None }
    }

  /** WAV decode via the resolved provider; falls back to the full
    * AudioSystem scan for payloads the provider rejects.
    */
  def readWav(bytes: Array[Byte]): AudioInputStream =
    newWavReader() match {
      case Some(r) =>
        try r.getAudioInputStream(new ByteArrayInputStream(bytes))
        catch { case _: UnsupportedAudioFileException =>
          AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes)) }
      case None =>
        AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    }

  /** WAV encode via the resolved provider (AudioSystem.write picks the
    * first type-supporting writer — the same selection rule).
    */
  def writeWav(ais: AudioInputStream, out: OutputStream): Unit =
    newWavWriter() match {
      case Some(w) if w.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais) =>
        w.write(ais, AudioFileFormat.Type.WAVE, out); ()
      case _ =>
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out); ()
    }

  // ---- javax.imageio: SPIs resolved once; instances per call ----

  private def writerSpiFor(format: String): Option[ImageWriterSpi] = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName(format)
    if (it.hasNext) Some(it.next().getOriginatingProvider) else None
  }
  private def readerSpiFor(format: String): Option[ImageReaderSpi] = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName(format)
    if (it.hasNext) Some(it.next().getOriginatingProvider) else None
  }

  lazy val pngWriterSpi: Option[ImageWriterSpi] = writerSpiFor("png")
  lazy val pngReaderSpi: Option[ImageReaderSpi] = readerSpiFor("png")
  lazy val gifWriterSpi: Option[ImageWriterSpi] = writerSpiFor("gif")
  lazy val gifReaderSpi: Option[ImageReaderSpi] = readerSpiFor("gif")

  /** PNG encode via the cached SPI — ImageIO.write's stream wrapping and
    * default write param, minus the per-call registry scan.
    */
  def writePng(img: java.awt.image.BufferedImage, bos: ByteArrayOutputStream): Unit =
    pngWriterSpi match {
      case Some(spi) =>
        val w = spi.createWriterInstance()
        val mos = new MemoryCacheImageOutputStream(bos)
        try { w.setOutput(mos); w.write(img) }
        finally { w.dispose(); mos.close() }
      case None =>
        javax.imageio.ImageIO.write(img, "png", bos); ()
    }

  /** Image decode via the cached SPI when it accepts the payload
    * (ImageIO.read's setInput(stream, true, true) contract); the full
    * ImageIO registry scan otherwise.
    */
  def readImage(bytes: Array[Byte], spi: Option[ImageReaderSpi]): java.awt.image.BufferedImage = {
    val direct = spi.flatMap { s =>
      val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
      val ok = try s.canDecodeInput(iis) catch { case scala.util.control.NonFatal(_) => false }
      if (!ok) { iis.close(); None }
      else {
        val r = s.createReaderInstance()
        try {
          r.setInput(iis, true, true)
          Some(r.read(0, r.getDefaultReadParam))
        } finally { r.dispose(); iis.close() }
      }
    }
    direct.getOrElse(
      javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
  }
}
