package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world payload"),
    (2L, "x"),
    (3L, "a somewhat longer binary payload for frame sampling tests")
  ).toDF("doc_id", "text")
    .select($"doc_id", encode($"text", "UTF-8").as("payload"))

  test("decodeImages runs the codec per-partition and matches direct calls") {
    val out = Multimodal.decodeImages(docs)
      .as[(Long, Int, Int, Long)].collect().map(t => t._1 -> (t._2, t._3, t._4)).toMap
    val expected = Multimodal.FakeCodec.decode("hello world payload".getBytes("UTF-8"))
    assert(out(1L) == expected)
    assert(out.size == 3)
  }

  test("ImageIoCodec decodes real PNGs through the same partition kernel") {
    // real images, generated with the JDK alone: known dims, pixel
    // values set by a formula the test refolds independently
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 31 + y * 7 + seed) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // the checksum the codec must produce: row-major ×31 fold over the
    // ARGB values (PNG is lossless; TYPE_INT_RGB reads back alpha=FF)
    def expectedAcc(w: Int, h: Int, seed: Int): Long = {
      var acc = 0L
      for (y <- 0 until h; x <- 0 until w)
        acc = acc * 31 + ((0xff000000 | ((x * 31 + y * 7 + seed) & 0xffffff)) & 0xffffffffL)
      acc
    }
    val df = Seq(
      (1L, png(20, 10, 1)), (2L, png(5, 8, 2)),
      (3L, "definitely not an image".getBytes("UTF-8")) // corrupt payload
    ).toDF("doc_id", "payload")
    val got = Multimodal.decodeImages(df, Multimodal.ImageIoCodec)
      .as[(Long, Int, Int, Long)].collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(1L) == ((20, 10, expectedAcc(20, 10, 1))))
    assert(got(2L) == ((5, 8, expectedAcc(5, 8, 2))))
    // corrupt media is data (sentinel row), never a task failure
    assert(got(3L) == ((-1, -1, 0L)))
    // the downstream metadata pipeline composes unchanged on real dims
    val rp = Multimodal.resizePlan(
      Multimodal.decodeImages(df.filter($"doc_id" === 1L), Multimodal.ImageIoCodec),
      maxW = 10, maxH = 10)
      .select($"out_width", $"out_height").as[(Int, Int)].head()
    assert(rp == ((10, 5)))
  }

  test("ImageIoFrameCodec samples real animated-GIF frames through the partition kernel") {
    // real multi-frame media, generated with the JDK alone: <= 4
    // distinct colors per frame, so GIF's palette round-trips pixels
    // exactly and the checksum is refoldable from the formula
    def frame(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x + y + seed) % 4) * 0x204080)
      img
    }
    def gif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // interlace off: the JDK GIF writer's default interlaced encoding
      // does not round-trip row order through its own reader
      val p = writer.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), p))
      writer.endWriteSequence()
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    def expectedAcc(w: Int, h: Int, seed: Int): Long = {
      var acc = 0L
      for (y <- 0 until h; x <- 0 until w)
        acc = acc * 31 + ((0xff000000 | (((x + y + seed) % 4) * 0x204080)) & 0xffffffffL)
      acc
    }
    val df = Seq(
      (1L, gif(Seq(frame(8, 6, 0), frame(8, 6, 1)))), // 2-frame animation
      (2L, gif(Seq(frame(5, 5, 2)))),                 // single-frame container
      (3L, "not a gif at all".getBytes("UTF-8"))      // corrupt payload
    ).toDF("doc_id", "payload")
    val got = Multimodal.decodeFrames(df)
      .as[(Long, Int, Int, Int, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    assert(got((1L, 0)) == ((8, 6, expectedAcc(8, 6, 0))))
    assert(got((1L, 1)) == ((8, 6, expectedAcc(8, 6, 1))))
    assert(got((2L, 0)) == ((5, 5, expectedAcc(5, 5, 2))))
    // corrupt media is data (one sentinel row), never a task failure
    assert(got((3L, -1)) == ((-1, -1, 0L)))
    assert(got.size == 4)
    // a sequence frame is bit-identical to the same image decoded
    // standalone — one pixel-fold law across both codec seams
    val solo = Multimodal.ImageIoCodec.decode {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(frame(8, 6, 1), "gif", bos)
      bos.toByteArray
    }
    assert(solo == ((8, 6, got((1L, 1))._3)))
    // stride sampling composes as a plan predicate on the frame relation
    val sampled = Multimodal.decodeFrames(
      Seq((9L, gif(Seq(frame(4, 4, 0), frame(4, 4, 1), frame(4, 4, 2), frame(4, 4, 3)))))
        .toDF("doc_id", "payload"))
      .filter($"frame_idx" % 2 === 0)
      .select($"frame_idx", $"pixel_acc").as[(Int, Long)].collect().sortBy(_._1)
    assert(sampled.map(_._1).sameElements(Array(0, 2)))
    assert(sampled.map(_._2).sameElements(Array(expectedAcc(4, 4, 0), expectedAcc(4, 4, 2))))
  }

  test("JavaSoundCodec decodes real WAV bytes through the partition kernel") {
    import graft.operators.Multimodal
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // 16-bit signed little-endian mono PCM, 8 kHz: a 100-sample ramp
    val samples = (0 until 100).map(i => (i * 257 - 12850).toShort)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    // direct decode: real container header honored, frames counted
    val (rate, ch, n, acc) = Multimodal.JavaSoundCodec.decode(wav)
    assert((rate, ch, n) == (8000, 1, 100L))
    val expAcc = samples.foldLeft(0L)((h, s) =>
      (h * 31 + (s & 0xffff)) % Multimodal.FakeAudioCodec.AccMod)
    assert(acc == expAcc)
    // same answer through the batched kernel
    val df = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = Multimodal.decodeAudio(df, Multimodal.JavaSoundCodec)
      .as[(Long, Int, Int, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(out(1L) == ((8000, 1, 100L, expAcc)))
    assert(out(2L) == ((-1, -1, -1L, 0L))) // corrupt audio is data, not a crash
    // all-zero samples fold to zero (fold identity sanity)
    val zeros = new Array[Byte](40)
    val zbaos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(zeros), fmt, 20),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, zbaos)
    assert(Multimodal.JavaSoundCodec.decode(zbaos.toByteArray) == ((8000, 1, 20L, 0L)))
  }

  test("JavaSoundFrameCodec measures RMS, silence and clipping on real PCM") {
    import graft.operators.Multimodal
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    def wav(samples: Seq[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    // 800 samples: first half a ±20000 square wave, second half silent
    val half = 400
    val tone = (0 until half).map(i => if (i % 2 == 0) 20000 else -20000)
    val audible = wav((tone ++ Seq.fill(half)(0)).map(_.toShort))
    val W = 100
    val frames = Multimodal.JavaSoundFrameCodec.frames(audible, W)
    assert(frames.length == 8 && frames.forall(_._2 == W))
    // windows 0-3 are the tone: peak 20000, sum_sq = 100·20000²
    assert(frames.take(4).forall(f => f._4 == 20000 && f._3 == W.toLong * 20000 * 20000))
    // windows 4-7 are the silent half: peak 0, energy 0
    assert(frames.drop(4).forall(f => f._4 == 0 && f._3 == 0L))
    // doc-level gate math through the batched kernel: silence ratio is
    // exactly the known half, nothing clips at 16-bit full scale
    val df = Seq((1L, audible)).toDF("doc_id", "payload")
    val out = Multimodal.decodeAudioFrames(df, W, Multimodal.JavaSoundFrameCodec)
    val agg = out.groupBy($"doc_id").agg(
      count(org.apache.spark.sql.functions.lit(1)).as("n"),
      sum(when($"peak" < 500, 1L).otherwise(0L)).as("silent"),
      sum(when($"peak" >= 32767, 1L).otherwise(0L)).as("clipped"))
      .as[(Long, Long, Long, Long)].head()
    assert(agg == ((1L, 8L, 4L, 0L)))
    // a full-scale payload trips the clip detector in every window
    val clipped = wav(Seq.fill(200)(32767.toShort))
    assert(Multimodal.JavaSoundFrameCodec.frames(clipped, W).forall(_._4 == 32767))
    // corrupt bytes are data: empty frame seq, not a task failure
    assert(Multimodal.JavaSoundFrameCodec.frames("not audio".getBytes, W).isEmpty)
    // fake twin shares the window shape (count + partial last window)
    val fake = Multimodal.FakeAudioFrameCodec.frames(Array.fill[Byte](110)(7), 50)
    assert(fake.map(f => (f._1, f._2)) == Seq((0, 50), (1, 5)))
  }

  test("sampleFrames splits payloads into strided fixed-size frames") {
    val frames = Multimodal.sampleFrames(docs.filter($"doc_id" === 3L), frameBytes = 10, stride = 2)
      .select($"frame_idx", length($"frame_bytes").as("len"))
      .as[(Int, Int)].collect().sortBy(_._1)
    // 58-byte payload → frames 0..5; stride 2 keeps 0,2,4
    assert(frames.map(_._1).sameElements(Array(0, 2, 4)))
    assert(frames.forall(_._2 == 10) || frames.last._2 <= 10)
    // frame content round-trips: frame 0 is the first 10 bytes
    val f0 = Multimodal.sampleFrames(docs.filter($"doc_id" === 3L), 10, 2)
      .filter($"frame_idx" === 0).select($"frame_bytes").as[Array[Byte]].head()
    assert(new String(f0, "UTF-8") == "a somewhat")
  }

  test("ImageIoGridCodec dHash: re-encoding-stable, edit-sensitive, corrupt-safe") {
    // real PNGs with a smooth horizontal gradient; a near-identical
    // copy (one corner patch changed) must land within a few bits,
    // while an inverted gradient must flip essentially every bit
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff; img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base = png(88, 48, (x, _) => x * 255 / 87)
    // bright patch over the darkest sampled cell: flips exactly the
    // gradient bit whose left cell it covers (cell centres sit at
    // x = 4, 12, 20, …, y = 4, 12, …)
    val nearDup = png(88, 48, (x, y) => if (x < 6 && y < 6) 255 else x * 255 / 87)
    val inverted = png(88, 48, (x, _) => 255 - x * 255 / 87)
    val df = Seq((1L, base), (2L, nearDup), (3L, inverted),
      (4L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val fp = Multimodal.decodeImageGrid(df, rows = 6, cols = 11,
        codec = Multimodal.ImageIoGridCodec)
      .select($"doc_id", Multimodal.dHash($"luma", 6, 11).as("h"))
      .as[(Long, Long)].collect().toMap
    // monotone-increasing gradient: every adjacent comparison is
    // "right brighter" → all 60 bits set; inverted → no bits set
    assert(fp(1L) == (1L << 60) - 1)
    assert(fp(3L) == 0L)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(2L)) >= 1 && hamming(fp(1L), fp(2L)) <= 3) // small edit: a few bits
    assert(hamming(fp(1L), fp(3L)) == 60)  // opposite structure: all bits
    assert(fp(4L) == 0L)                   // corrupt payload → zero grid
    // and the pair machinery reports exactly the near-dup pair
    val grid = Multimodal.decodeImageGrid(df, 6, 11, Multimodal.ImageIoGridCodec)
      .select($"doc_id", Multimodal.dHash($"luma", 6, 11).as("dhash"))
    val pairs = Dedup.simhashPairs(grid, "doc_id", maxHamming = 3, bits = 60)
      .select($"id_1", $"id_2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L))) // 3 and 4 are both all-zero
    // misuse guard: a fingerprint wider than 60 bits is rejected
    intercept[IllegalArgumentException] {
      Multimodal.dHash($"luma", rows = 8, cols = 11)
    }
  }

  test("fake codecs refuse non-ASCII payloads (oracle twins index characters)") {
    val ascii = "plain ascii payload".getBytes("UTF-8")
    val accent = "café".getBytes("UTF-8") // 0xc3 0xa9 — indices shift
    // ASCII passes through unchanged
    assert(Multimodal.FakeGridCodec.grid(ascii, 2, 2).length == 4)
    assert(Multimodal.FakeAudioFrameCodec.frames(ascii, 4).nonEmpty)
    // any multi-byte character fails LOUDLY instead of silently
    // diverging from the char-indexed SQL oracle
    intercept[IllegalArgumentException](
      Multimodal.FakeGridCodec.grid(accent, 2, 2))
    intercept[IllegalArgumentException](
      Multimodal.FakeAudioFrameCodec.frames(accent, 4))
    intercept[IllegalArgumentException](
      Multimodal.FakeAudioCodec.decode(accent))
  }

  test("resizePlan preserves aspect and never upscales") {
    val decoded = Seq((1L, 640, 480), (2L, 100, 50), (3L, 32, 64))
      .toDF("doc_id", "width", "height")
    val out = Multimodal.resizePlan(decoded, maxW = 128, maxH = 128)
      .select($"doc_id", $"out_width", $"out_height")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) == (128, 96))   // scaled down, 4:3 kept
    assert(out(2L) == (100, 50))   // inside the box: untouched
    assert(out(3L) == (32, 64))    // portrait inside the box: untouched
  }

  test("streamToWarehouse merges micro-batches idempotently") {
    import graft.sources.Warehouse
    import graft.streaming.EventPipelines
    val root = java.nio.file.Files.createTempDirectory("graft-stream-wh").toString
    val wh = new Warehouse(root, spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    val ev = Seq((1L, 1000000L, 10L, "click", 1.0, "{}"),
      (2L, 2000000L, 10L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.coalesce(1).write.mode("append").parquet(dir.toString)
    def stream = spark.readStream.schema(EventPipelines.rawSchema).parquet(dir.toString)
    EventPipelines.streamToWarehouse(stream, wh, "staging", "events", Seq("event_id"))
    assert(wh.read("staging", "events").count() == 2)
    // re-delivery of the same file set (plus one new event) dedups by key
    Seq((2L, 2000000L, 10L, "view", 99.0, "{}"), (3L, 3000000L, 11L, "buy", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    EventPipelines.streamToWarehouse(stream, wh, "staging", "events", Seq("event_id"))
    val rows = wh.read("staging", "events")
    assert(rows.count() == 3)
    // first-delivery wins: event 2 keeps value 2.0
    assert(rows.filter($"event_id" === 2L).select($"value").as[Double].head() == 2.0)
  }
}
