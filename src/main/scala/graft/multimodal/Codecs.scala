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

  /** The capable reader, probed once, plus a PER-CALL factory (round
    * 17, the ImageIO SPI pattern below): the capability probe selects
    * whatever provider accepts the probe WAV, and a stateful
    * third-party reader must not be shared across executor threads —
    * so calls construct a fresh instance when the provider class is
    * reflectively constructible. The JDK's own readers live in a
    * non-opened module (reflective construction throws
    * IllegalAccessException), so for them the factory returns the
    * probe's shared instance — the JDK WaveFileReader is stateless,
    * which is why round 16's sharing was safe. The factory must NEVER
    * degrade to the AudioSystem registry scan: that is the 70× cost
    * the hoisting removed (a naive None fallback reintroduced it
    * mid-round-17 — q178 0.21 s → 2.61 s in the bench — caught and
    * fixed here; the factory choice is made ONCE, not per call).
    */
  private lazy val probedWavReader: Option[AudioFileReader] =
    java.util.ServiceLoader.load(classOf[AudioFileReader], loader)
      .iterator().asScala.find { r =>
        try { r.getAudioInputStream(new ByteArrayInputStream(probeWav)).close(); true }
        catch { case scala.util.control.NonFatal(_) => false }
      }

  private lazy val wavReaderFactory: Option[() => AudioFileReader] =
    probedWavReader.map { probed =>
      val cls = probed.getClass
      try {
        cls.getDeclaredConstructor().newInstance() // constructibility check
        () => cls.getDeclaredConstructor().newInstance()
      } catch {
        case scala.util.control.NonFatal(_) => () => probed
      }
    }

  private def newWavReader(): Option[AudioFileReader] =
    wavReaderFactory.map(_.apply())

  /** Capable writer, probed once; per-call factory with the same
    * shared-instance fallback for module-protected (JDK, stateless)
    * providers as [[wavReaderFactory]].
    */
  private lazy val probedWavWriter: Option[AudioFileWriter] = {
    def probeAis: AudioInputStream = {
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      new AudioInputStream(new ByteArrayInputStream(Array[Byte](0, 0)), fmt, 1L)
    }
    java.util.ServiceLoader.load(classOf[AudioFileWriter], loader)
      .iterator().asScala.find { w =>
        try w.isFileTypeSupported(AudioFileFormat.Type.WAVE, probeAis)
        catch { case scala.util.control.NonFatal(_) => false }
      }
  }

  private lazy val wavWriterFactory: Option[() => AudioFileWriter] =
    probedWavWriter.map { probed =>
      val cls = probed.getClass
      try {
        cls.getDeclaredConstructor().newInstance() // constructibility check
        () => cls.getDeclaredConstructor().newInstance()
      } catch {
        case scala.util.control.NonFatal(_) => () => probed
      }
    }

  private def newWavWriter(): Option[AudioFileWriter] =
    wavWriterFactory.map(_.apply())

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
