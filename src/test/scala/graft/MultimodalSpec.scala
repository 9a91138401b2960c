package graft

import graft.multimodal.Multimodal

/** Typed multimodal pipeline: binary payload plumbing, batch-shaped
  * decode, frame sampling.
  */
class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.mediaFromDocuments(spark, sfDir).cache()

  test("media dataset carries binary payloads with assigned kinds") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    rows.foreach { m =>
      assert(Set("image", "audio", "video").contains(m.kind))
      assert(m.bytes.nonEmpty)
      assert(m.kind == Seq("image", "audio", "video")((m.id % 3).toInt))
    }
  }

  test("columnar frame sampling (q69) equals the typed flatMap path") {
    val typed = Multimodal.sampleFrames(media).collect()
      .map(f => (f.id, f.frameIdx, f.offset, f.length)).toSet
    val columnar = graft.queries.Aqp.queries("q69_frame_sample")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"),
        r.getAs[Int]("offset"), r.getAs[Int]("frame_len"))).toSet
    assert(typed.nonEmpty)
    assert(columnar == typed)
  }

  test("batched metadata extraction is deterministic and total") {
    val meta = Multimodal.extractMeta(media, batchSize = 16).collect()
    assert(meta.length == media.count())
    val byId = meta.map(m => m.id -> m).toMap
    media.collect().foreach { m =>
      val mm = byId(m.id)
      val (w, h, d) = Multimodal.decodeStub(m.kind, m.bytes)
      assert(mm.nBytes == m.bytes.length)
      assert((mm.width, mm.height, mm.durationMs) == ((w, h, d)))
      assert(mm.durationMs == 0 || m.kind != "image")
    }
    // batch size must not affect results (only memory shape)
    val meta1 = Multimodal.extractMeta(media, batchSize = 1).collect()
      .sortBy(_.id).toSeq
    assert(meta1 == meta.sortBy(_.id).toSeq)
  }

  test("real animated-GIF decode recovers frames, dims, timing, and exact palette colors") {
    Seq(0L, 1L, 7L, 123L, 4095L).foreach { id =>
      val m = Multimodal.decodeVideo(id, Multimodal.gifFor(id))
      assert(m.width == 2 + (id % 8).toInt, s"id=$id width ${m.width}")
      assert(m.height == 2 + ((id * 3) % 8).toInt, s"id=$id height ${m.height}")
      assert(m.nFrames == 2 + (id % 4).toInt, s"id=$id frames ${m.nFrames}")
      // duration = frames × the generated per-frame delay (centiseconds → ms)
      assert(m.durationMs == m.nFrames.toLong * (4 + (id % 7)) * 10L,
        s"id=$id duration ${m.durationMs}")
      // exact palette colors survive the indexed encode (no quantization)
      assert(m.firstRgb == Multimodal.videoFrameRgb(id, 0),
        s"id=$id first ${m.firstRgb.toHexString}")
      assert(m.lastRgb == Multimodal.videoFrameRgb(id, m.nFrames - 1),
        s"id=$id last ${m.lastRgb.toHexString}")
    }
    // the distributed typed pipeline decodes what the executors encoded
    val vm = Multimodal.extractVideoMeta(
      Multimodal.videoMedia(spark, sfDir), batchSize = 8).collect()
    assert(vm.nonEmpty)
    vm.foreach { m =>
      assert(m.nFrames == 2 + (m.id % 4).toInt)
      assert(m.firstRgb == Multimodal.videoFrameRgb(m.id, 0))
    }
  }

  test("real PNG decode recovers known dimensions and pixels (javax.imageio)") {
    // driver-side roundtrip: real encoder -> real decoder
    for (id <- Seq(0L, 1L, 17L, 255L, 4096L)) {
      val bytes = Multimodal.pngFor(id)
      // a real PNG, not arithmetic: signature bytes \x89PNG
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G')
      val m = Multimodal.decodeImage(id, bytes)
      assert(m.width == 1 + (id % 16).toInt)
      assert(m.height == 1 + ((id * 3) % 16).toInt)
      assert(m.red == (id % 256).toInt)
      assert(m.green == ((id * 7) % 256).toInt)
      assert(m.blue == ((id * 13) % 256).toInt)
    }
    // distributed: encode on executors, decode batched on executors
    val metas = Multimodal.extractImageMeta(
      Multimodal.imageMedia(spark, sfDir), batchSize = 16).collect()
    assert(metas.nonEmpty)
    metas.foreach { m =>
      assert(m.width == 1 + (m.id % 16).toInt, s"id=${m.id}")
      assert(m.height == 1 + ((m.id * 3) % 16).toInt, s"id=${m.id}")
      assert((m.red, m.green, m.blue) ==
        (((m.id % 256).toInt, ((m.id * 7) % 256).toInt,
          ((m.id * 13) % 256).toInt)), s"id=${m.id}")
      assert(m.nBytes > 8) // compressed payload, not a header stub
    }
  }

  test("nearest-neighbor resize: identity at source size, exact sampled pixels at 4x4") {
    // identity law: resizing to the source dimensions reproduces every
    // pixel (sx = x·w div w = x)
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.gradPngFor(17L)))
    val same = Multimodal.resizeNearest(src, src.getWidth, src.getHeight)
    for (y <- 0 until src.getHeight; x <- 0 until src.getWidth)
      assert(same.getRGB(x, y) == src.getRGB(x, y), s"($x,$y)")
    // sampling law: the 4x4 target picks source pixel (x'·w div 4,
    // y'·h div 4) — checked against the generator arithmetic
    val id = 42L
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.gradPngFor(id)))
    val out = Multimodal.resizeNearest(img, 4, 4)
    for (yp <- 0 until 4; xp <- 0 until 4) {
      val sx = xp * img.getWidth / 4
      val sy = yp * img.getHeight / 4
      val r = ((id + 5L * sx + 11L * sy) % 256).toInt
      val g = ((id * 7 + 3L * sx + 13L * sy) % 256).toInt
      val b = ((id * 13 + 9L * sx + 2L * sy) % 256).toInt
      assert((out.getRGB(xp, yp) & 0xffffff) == ((r << 16) | (g << 8) | b),
        s"target ($xp,$yp) <- source ($sx,$sy)")
    }
    // distributed: the full pipeline re-decodes its own output
    val metas = Multimodal.resizeImages(
      Multimodal.gradientMedia(spark, sfDir), batchSize = 16).collect()
    assert(metas.nonEmpty)
    metas.foreach { m =>
      assert(m.rw == 4 && m.rh == 4, s"id=${m.id}")
      assert(m.srcW == 4 + (m.id % 13).toInt, s"id=${m.id}")
      assert(m.checksum >= 0L)
    }
  }

  test("real WAV decode recovers rate, frames, and PCM samples (javax.sound)") {
    // driver-side roundtrip: real encoder -> real decoder
    for (id <- Seq(0L, 1L, 17L, 255L, 4096L)) {
      val bytes = Multimodal.wavFor(id)
      // a real RIFF/WAVE container, not arithmetic
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A')
      val n = 100 + (id % 400).toInt
      def expected(i: Int): Int =
        (((id * 31 + i.toLong * 17) % 65536) - 32768).toInt
      val m = Multimodal.decodeAudio(id, bytes)
      assert(m.sampleRate == 8000 + 1000 * (id % 5).toInt)
      assert(m.channels == 1)
      assert(m.nSamples == n)
      assert(m.firstSample == expected(0))
      assert(m.midSample == expected(n / 2))
      assert(m.lastSample == expected(n - 1))
    }
    // distributed: encode on executors, decode batched on executors
    val metas = Multimodal.extractAudioMeta(
      Multimodal.audioMedia(spark, sfDir), batchSize = 16).collect()
    assert(metas.nonEmpty)
    metas.foreach { m =>
      val n = 100 + (m.id % 400).toInt
      assert(m.nSamples == n, s"id=${m.id}")
      assert(m.sampleRate == 8000 + 1000 * (m.id % 5).toInt, s"id=${m.id}")
      assert(m.lastSample ==
        (((m.id * 31 + (n - 1).toLong * 17) % 65536) - 32768).toInt,
        s"id=${m.id}")
    }
  }

  test("hoisted codec providers are byte-identical to the AudioSystem/ImageIO routes") {
    // round 16: wavFor/decode/resample/png paths resolve their provider
    // ONCE (Codecs) instead of re-scanning the synchronized registry per
    // call; this pins that the resolved provider produces the exact bytes
    // and values the registry route did.
    for (id <- Seq(0L, 3L, 129L, 4095L)) {
      val viaCodecs = Multimodal.wavFor(id)
      val bos = new java.io.ByteArrayOutputStream()
      val rate = 8000 + 1000 * (id % 5).toInt
      val n = 100 + (id % 400).toInt
      val data = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        val v = (((id * 31 + i.toLong * 17) % 65536) - 32768).toInt
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data),
          new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false),
          n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      assert(java.util.Arrays.equals(viaCodecs, bos.toByteArray),
        s"wav writer parity broke for id=$id")
      // reader parity: decode via the registry route, compare fields
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(viaCodecs))
      val m = Multimodal.decodeAudio(id, viaCodecs)
      assert(m.sampleRate == ais.getFormat.getSampleRate.toInt &&
        m.nSamples == ais.getFrameLength.toInt)
    }
    // PNG writer/reader parity: bytes equal ImageIO.write, pixels round-trip
    for (id <- Seq(2L, 40L)) {
      val viaCodecs = Multimodal.pngFor(id)
      val w = 1 + (id % 16).toInt
      val h = 1 + ((id * 3) % 16).toInt
      val rgb = (((id % 256).toInt) << 16) |
        ((((id * 7) % 256).toInt) << 8) | (((id * 13) % 256).toInt)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      assert(java.util.Arrays.equals(viaCodecs, bos.toByteArray),
        s"png writer parity broke for id=$id")
      val viaRegistry = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(viaCodecs))
      val meta = Multimodal.decodeImage(id, viaCodecs)
      assert(meta.width == viaRegistry.getWidth &&
        meta.height == viaRegistry.getHeight &&
        ((meta.red << 16) | (meta.green << 8) | meta.blue) ==
          (viaRegistry.getRGB(0, 0) & 0xffffff))
    }
  }

  test("real audio resample: half rate, half frames, exact nearest samples and checksum") {
    for (id <- Seq(0L, 1L, 17L, 255L, 4096L)) {
      val n = 100 + (id % 400).toInt
      val n2 = n / 2
      def gen(i: Int): Int =
        (((id * 31 + i.toLong * 17) % 65536) - 32768).toInt
      def src(i: Int): Int = (i.toLong * n / n2).toInt
      val r = Multimodal.resampleAudio(id, Multimodal.wavFor(id))
      assert(r.sampleRate == (8000 + 1000 * (id % 5).toInt) / 2)
      assert(r.nSamples == n2)
      assert(r.firstSample == gen(src(0)))
      assert(r.midSample == gen(src(n2 / 2)))
      assert(r.lastSample == gen(src(n2 - 1)))
      val ck = (0 until n2).map(i => gen(src(i)).toLong * (i + 1)).sum
      assert(r.checksum == ck, s"id=$id")
    }
  }

  test("frame sampling strides through video payloads only") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
      .collect()
    assert(frames.nonEmpty)
    val vids = media.filter(_.kind == "video").collect().map(m => m.id -> m).toMap
    frames.foreach { f =>
      assert(vids.contains(f.id))
      assert(f.frameIdx % 2 == 0)
      val m = vids(f.id)
      assert(f.offset + f.length <= m.bytes.length)
      assert(f.length > 0)
    }
    // every video contributes ceil(nFrames/stride) sampled frames
    val perVid = frames.groupBy(_.id).view.mapValues(_.length).toMap
    vids.foreach { case (id, m) =>
      val nF = math.max(1, m.bytes.length / 64)
      assert(perVid(id) == (nF + 1) / 2, s"video $id")
    }
  }

  test("sampled media QA: failed decodes leave the okn-divided means unbiased; an all-failed shard reports NULL means (round-14 ADVICE regression)") {
    // synthetic decode outcomes (the real lottery's payloads always
    // decode, so the failure arithmetic is pinned here): shard 0 has a
    // failure among successes, shard 1 is clean, shard 2 is ALL failed
    import spark.implicits._
    val qa = Seq(
      (0, true, 100L, 8000L),
      (0, true, 300L, 16000L),
      (0, false, 0L, 0L), // failed decode: contributes 0 to ss/sr
      (1, true, 50L, 8000L),
      (2, false, 0L, 0L),
      (2, false, 0L, 0L)).toDF("shard", "ok", "n_samples", "rate")
    val out = Multimodal.mediaQaAggregate(qa, w = 100.0).collect()
    val byShard = out.map(r => r.getAs[Int]("shard") -> r).toMap
    // shard 0: means divide by okn=2, NOT k=3 (the pre-fix bias)
    assert(byShard(0).getAs[Double]("avg_samples") == 200.0)
    assert(byShard(0).getAs[Double]("avg_rate") == 12000.0)
    assert(byShard(0).getAs[Double]("ok_rate") == 2.0 / 3.0)
    // shard 2: all failed -> NULL means (not 0/0, not 0)
    assert(byShard(2).isNullAt(byShard(2).fieldIndex("avg_samples")))
    assert(byShard(2).isNullAt(byShard(2).fieldIndex("avg_rate")))
    assert(byShard(2).getAs[Double]("ok_rate") == 0.0)
    // the k-divisor estimates are UNCHANGED by failures (HT arithmetic
    // counts lottery winners, not decode successes)
    assert(byShard(2).getAs[Double]("n_est") == 200.0)
    assert(byShard(0).getAs[Double]("n_est") == 300.0)
  }
}
